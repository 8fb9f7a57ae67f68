"""Round-5 adversarial degenerate-input sweep (VERDICT r4 task 8): the
round-4 operators under the input shapes that historically break
text/retrieval plans — an EMPTY vocabulary (all documents NULL / empty /
whitespace), a UNIFORM vocabulary with zero query-term hits (every term
df-capped out of MLT eligibility; no snippet window can match), and
all-zero (constant) PCM for the spectral features. Oracle-gated queries
must keep exact parity (usually: both engines emit ZERO rows without
crashing); the rows-only FFT path is pinned directly."""

from __future__ import annotations

import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.sources.parquet import TABLES
from tests.conftest import SF_DIR
from tests.helpers import signature

# Oracle-gated round-4 text/retrieval operators swept over both corpora.
SWEPT = [
    "q_more_like_this",
    "q_snippet_extract",
    "q_dsir_weights",
    "q_ngram_jaccard",
    "q_containment",
]

EMPTY_VOCAB_DOCS = """
  SELECT CAST(1 AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS text,
         'en' AS lang, 'synthetic' AS source, CAST(0 AS BIGINT) AS n_chars
  UNION ALL SELECT 2, '', 'de', 'synthetic', 0
  UNION ALL SELECT 3, '   ', 'es', 'synthetic', 3
  UNION ALL SELECT 4, NULL, NULL, NULL, NULL
"""

# every doc repeats one token that is (a) df = n -> MLT stop-term-capped,
# (b) absent from SNIPPET_TERMS -> zero snippet hits
UNIFORM_VOCAB_DOCS = """
  SELECT CAST(1 AS BIGINT) AS doc_id, 'zzzqx zzzqx zzzqx' AS text,
         'en' AS lang, 'synthetic' AS source, CAST(17 AS BIGINT) AS n_chars
  UNION ALL SELECT 2, 'zzzqx zzzqx', 'en', 'synthetic', 11
  UNION ALL SELECT 3, 'zzzqx', 'en', 'synthetic', 5
"""


def _make_dir(tmp_path_factory, name: str, docs_sql: str) -> str:
    dst = tmp_path_factory.mktemp(name)
    con = duckdb.connect()
    con.execute(
        f"COPY ({docs_sql}) TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


@pytest.fixture(scope="module", params=["empty_vocab", "uniform_vocab"])
def degen_dir(request, tmp_path_factory):
    sql = (
        EMPTY_VOCAB_DOCS
        if request.param == "empty_vocab"
        else UNIFORM_VOCAB_DOCS
    )
    return _make_dir(tmp_path_factory, request.param, sql)


@pytest.fixture()
def degen_duck(degen_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{degen_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SWEPT)
def test_degenerate_vocab_oracle_parity(spark, degen_dir, degen_duck, name):
    rq = all_queries()[name]
    assert rq.oracle is not None
    sdf = rq.builder(spark, degen_dir)
    got = signature(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = degen_duck.execute(rq.oracle)
    want = signature(
        [d[0] for d in res.description], [tuple(r) for r in res.fetchall()]
    )
    assert got == want, f"{name} diverges on degenerate-vocab corpus"


def test_mlt_and_snippet_emit_zero_rows_on_uniform_vocab(
    spark, tmp_path_factory
):
    """Pin the SEMANTIC outcome, not just parity: a uniform vocabulary is
    stop-term-capped out of MLT eligibility, and a corpus with no
    query-term hits yields no snippets."""
    d = _make_dir(tmp_path_factory, "uniform2", UNIFORM_VOCAB_DOCS)
    qs = all_queries()
    assert qs["q_more_like_this"].builder(spark, d).count() == 0
    assert qs["q_snippet_extract"].builder(spark, d).count() == 0


def test_audio_spectral_all_zero_pcm(spark):
    """Constant (all-zero after mean removal) PCM: magnitudes are all zero,
    so the centroid guard must emit 0.0 (not NaN / div-by-zero) and the
    dominant bin falls to the first (lowest) bin by the argmax-ties rule."""
    from prefect_flow_arc_indexer_spark.multimodal.binary import (
        AUDIO_WINDOW,
        audio_spectral,
    )

    media = spark.createDataFrame(
        [
            (1, "audio/wav", bytes(AUDIO_WINDOW * 2)),  # 2 zero windows
            (2, "audio/wav", bytes([7]) * AUDIO_WINDOW),  # constant != 0
            (3, "audio/wav", bytes(3)),  # shorter than one window
            (4, "image/png", bytes(AUDIO_WINDOW)),  # not audio
        ],
        "doc_id long, media_type string, payload binary",
    )
    rows = {
        (r.doc_id, r.window_idx): (r.dominant_bin, r.centroid)
        for r in audio_spectral(media).collect()
    }
    assert set(rows) == {(1, 0), (1, 1), (2, 0)}
    for key in rows:
        dom, cent = rows[key]
        assert dom == 1  # ties -> lowest non-DC bin
        assert cent == 0.0  # zero-magnitude guard, never NaN
