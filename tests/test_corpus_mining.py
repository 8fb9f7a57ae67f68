"""Behavioral pins for the round-5 corpus-mining operators (semantics
beyond oracle parity, on corpora engineered to exercise each rule)."""

from __future__ import annotations

import shutil

import duckdb
import pytest

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.sources.parquet import TABLES
from tests.conftest import SF_DIR

PHRASE = "the quick brown fox jumps"  # exactly one 5-gram

DOCS_SQL = f"""
  SELECT CAST(1 AS BIGINT) AS doc_id,
         '{PHRASE} over the lazy dog. all rights reserved' AS text,
         'en' AS lang, 'web' AS source, CAST(60 AS BIGINT) AS n_chars
  UNION ALL SELECT 2, '{PHRASE} again and again today. all rights reserved',
         'en', 'web', 55
  UNION ALL SELECT 3, 'completely different words here. all rights reserved',
         'en', 'web', 50
  UNION ALL SELECT 4, 'singleton text with unique content only', 'de',
         'web', 39
"""


@pytest.fixture(scope="module")
def mining_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("mining")
    duckdb.connect().execute(
        f"COPY ({DOCS_SQL}) TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


def test_repeated_ngrams_finds_shared_phrase(spark, mining_dir):
    rows = {
        r.ngram: (r.n_docs, r.n_occurrences)
        for r in all_queries()["q_repeated_ngrams"]
        .builder(spark, mining_dir)
        .collect()
    }
    assert rows[PHRASE] == (2, 2)  # docs 1+2 share it once each
    # 'all rights reserved' is only a 3-gram run inside longer distinct
    # sentences; every emitted gram must genuinely span >= 2 docs
    assert all(n_docs >= 2 for n_docs, _ in rows.values())


def test_line_dedup_flags_shared_boilerplate(spark, mining_dir):
    rows = {
        r.doc_id: (r.n_lines, r.n_boiler, r.keep_ratio_micro)
        for r in all_queries()["q_line_dedup"]
        .builder(spark, mining_dir)
        .collect()
    }
    # 'all rights reserved' appears in docs 1-3 -> boilerplate (K=3)
    assert rows[1] == (2, 1, 500000)
    assert rows[2] == (2, 1, 500000)
    assert rows[3] == (2, 1, 500000)
    assert rows[4] == (1, 0, 1000000)  # nothing shared


def test_curriculum_stages_are_difficulty_monotone(spark, mining_dir):
    rows = sorted(
        (
            (r.stage, r.difficulty, r.doc_id)
            for r in all_queries()["q_curriculum_stages"]
            .builder(spark, mining_dir)
            .collect()
        )
    )
    # 4 docs over 4 stages: exactly one doc per stage, ordered by difficulty
    assert [s for s, _, _ in rows] == [0, 1, 2, 3]
    diffs = [d for _, d, _ in rows]
    assert diffs == sorted(diffs)


def test_tokenizer_fertility_counts_punctuation_as_tokens(spark, mining_dir):
    rows = {
        r.lang: r
        for r in all_queries()["q_tokenizer_fertility"]
        .builder(spark, mining_dir)
        .collect()
    }
    en, de = rows["en"], rows["de"]
    # English docs carry '.' punctuation -> BPE tokens > whitespace tokens
    assert en.bpe_tokens > en.ws_tokens
    assert en.fertility_micro > 1_000_000
    # the German doc has no punctuation -> fertility exactly 1.0
    assert de.bpe_tokens == de.ws_tokens
    assert de.fertility_micro == 1_000_000
    assert de.n_docs == 1 and en.n_docs == 3
