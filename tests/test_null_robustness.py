"""Adversarial corpus robustness: every document-touching query keeps
exact oracle parity on a corpus containing NULL text, empty text,
whitespace-only text, an all-NULL row, AND multibyte/unicode texts — the
fixture shapes the round-1 advisory used to break q_lang_id (local test
data is all-ASCII with no NULLs, so without this sweep those paths are
never exercised). The unicode rows specifically pin the byte-vs-char
contract of the multimodal oracles (restricted to single-byte texts on
both engines)."""

from __future__ import annotations

import shutil

import duckdb
import pytest

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.sources.parquet import TABLES
from tests.conftest import SF_DIR
from tests.helpers import signature

DOC_QUERIES = [
    "q_text_quality",
    "q_lang_id",
    "q_token_count",
    "q_doc_fingerprint",
    "q_char_entropy",
    "q_regex_features",
    "q_array_profile",
    "q_multimodal_meta",
    "q_frame_sample",
    "q_media_resize",
    "q_dedup_exact",
    "q_chunk_dedup",
    "q_bm25",
    "q_gopher_rules",
    "q_cooccurrence",
    "q_pack_sequences",
    "q_reservoir_sample",
    "q_dataset_card",
    "q_mixture_weights",
    "q_unigram_surprisal",
    "q_triangle_count",
    "q_bigram_surprisal",
    "q_chi_square",
    "q_length_trim",
    "q_ccnet_buckets",
    "q_boilerplate",
    "q_image_phash",
    "q_quality_logistic",
    # curation wave (round 3)
    "q_text_normalize",
    "q_winnowing",
    "q_winnow_pairs",
    "q_speech_vad",
    "q_minhash_estimate",
    # fifth/sixth-wave round-3 additions
    "q_oov_rate",
    "q_write_bins",
    "q_span_mask",
    "q_quality_ensemble",
    "q_video_scene",
    "q_dataset_diff",
    "q_source_keywords",
    "q_ece_calibration",
    # round-4 additions
    "q_dsir_weights",
    "q_ngram_jaccard",
    "q_containment",
    "q_more_like_this",
    "q_snippet_extract",
    # round-5 corpus-mining additions
    "q_repeated_ngrams",
    "q_line_dedup",
    "q_tokenizer_fertility",
    "q_curriculum_stages",
    # round-5 corpus-policy additions
    "q_mixture_temperature",
    "q_lang_confusion",
    "q_toxicity_lexicon",
    # round-6 additions
    "q_skyline_docs",
    "q_top_p_corpus",
    "q_epoch_plan",
    "q_countmin",
]


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_nulls")
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (
  SELECT * FROM '{SF_DIR}/documents.parquet'
  UNION ALL SELECT 900001, NULL, 'en', 'synthetic', 0
  UNION ALL SELECT 900002, '', 'de', 'synthetic', 0
  UNION ALL SELECT 900003, '   ', 'es', 'synthetic', 3
  UNION ALL SELECT 900004, NULL, NULL, NULL, NULL
  UNION ALL SELECT 910000, 'héllo wörld ümlaut tæst', 'de', 'synthetic', 23
  UNION ALL SELECT 910002, '中文文本测试 один два', 'zh', 'synthetic', 14
  UNION ALL SELECT 910004, 'emoji 🎉 mix ascii', 'en', 'synthetic', 17
) TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
            )
        else:
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def null_duck(null_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{null_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_null_text_oracle_parity(spark, null_dir, null_duck, name):
    rq = all_queries()[name]
    assert rq.oracle is not None
    sdf = rq.builder(spark, null_dir)
    got = signature(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = null_duck.execute(rq.oracle)
    want = signature(
        [d[0] for d in res.description], [tuple(r) for r in res.fetchall()]
    )
    assert got == want, f"{name} diverges on NULL/empty-text rows"
