"""Round-9 ADVICE regression pins (ADVICE r8, all low):

1. png_mini: a truncated-but-right-size IDAT stream (missing zlib
   terminator/adler32) must be rejected, not silently decoded.
2. functions/caching: a persist()-cached createDataFrame-from-local-rows
   frame also analyzes to LogicalRDD — release_frame must NOT claim it as
   a checkpoint and skip the unpersist() fallback.
3. q_fuzzy_match deletion-variant generation: names shorter than the
   deletion count previously hit Spark's DESCENDING sequence(a, b) for
   a > b and emitted junk variants; the guarded form must stay on the
   DuckDB oracle for a short-name corpus AND keep the FastSS superset
   guarantee (dist<=2 short-name pairs still share the '' variant).
"""

from __future__ import annotations

import shutil
import struct
import zlib

import duckdb
import pytest

from prefect_flow_arc_indexer_spark.multimodal import png_mini
from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.sources.parquet import TABLES
from tests.conftest import SF_DIR
from tests.helpers import assert_matches_oracle


def _chunk(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body)) + tag + body + b"\0\0\0\0"


def test_png_mini_truncated_idat_stream_rejected():
    """Cut the IDAT after all pixel data but before the zlib terminator +
    adler32: the capped inflate returns exactly the expected byte count,
    so only an explicit dec.eof check catches it (ADVICE r8)."""
    sig = png_mini._SIGNATURE
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
    raw = b"\x00" + bytes(range(6)) + b"\x00" + bytes(range(6, 12))
    full = zlib.compress(raw)
    # sanity: the intact stream round-trips
    ok = sig + ihdr + _chunk(b"IDAT", full) + _chunk(b"IEND", b"")
    assert png_mini.decode_png(ok)[:3] == (2, 2, "RGB")
    # drop the 4-byte adler32 trailer: all deflate data is still present
    cut = sig + ihdr + _chunk(b"IDAT", full[:-4]) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="truncated IDAT"):
        png_mini.decode_png(cut)


def test_release_frame_unpersists_local_relation_cache(spark):
    """A persist()-cached frame whose analyzed plan is LogicalRDD but which
    is NOT checkpoint-backed (createDataFrame from local rows) must fall
    through release_local_checkpoint to the unpersist() path — before the
    fix the LogicalRDD shape alone claimed the release and the SQL-cache
    entry leaked (ADVICE r8)."""
    from prefect_flow_arc_indexer_spark.functions.caching import (
        release_frame,
        release_local_checkpoint,
    )

    df = spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
    plan_cls = df._jdf.queryExecution().analyzed().getClass().getName()
    df = df.persist()
    df.count()
    assert df.is_cached
    # only meaningful when this createDataFrame shape really analyzes to
    # LogicalRDD (it does on this build; guard against future planner moves)
    if plan_cls.endswith(".LogicalRDD"):
        assert release_local_checkpoint(df) is False
    release_frame(df)
    assert not df.is_cached, (
        "release_frame claimed a checkpoint release on a persist()-cached "
        "local-relation frame and skipped unpersist()"
    )


SHORT_NAME_CUSTOMER = """
  SELECT * FROM (VALUES
    (CAST(1 AS BIGINT), '',     CAST(7 AS INT), 'BUILDING', CAST(10.00 AS DOUBLE)),
    (CAST(2 AS BIGINT), 'a',    CAST(7 AS INT), 'BUILDING', CAST(20.00 AS DOUBLE)),
    (CAST(3 AS BIGINT), 'b',    CAST(7 AS INT), 'BUILDING', CAST(30.00 AS DOUBLE)),
    (CAST(4 AS BIGINT), 'ab',   CAST(7 AS INT), 'BUILDING', CAST(40.00 AS DOUBLE)),
    (CAST(5 AS BIGINT), 'cd',   CAST(7 AS INT), 'BUILDING', CAST(50.00 AS DOUBLE)),
    (CAST(6 AS BIGINT), 'abc',  CAST(7 AS INT), 'BUILDING', CAST(60.00 AS DOUBLE)),
    (CAST(7 AS BIGINT), 'xyzw', CAST(7 AS INT), 'BUILDING', CAST(70.00 AS DOUBLE)),
    (CAST(8 AS BIGINT), 'ab',   CAST(7 AS INT), 'BUILDING', CAST(80.00 AS DOUBLE)),
    (CAST(9 AS BIGINT), 'q',    CAST(3 AS INT), 'MACHINERY', CAST(90.00 AS DOUBLE))
  ) AS t(c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal)
"""


@pytest.fixture(scope="module")
def short_name_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("short_names")
    con = duckdb.connect()
    con.execute(
        f"COPY ({SHORT_NAME_CUSTOMER}) TO '{dst}/customer.parquet' "
        "(FORMAT PARQUET)"
    )
    con.close()
    for t in TABLES:
        if t != "customer":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


@pytest.mark.parametrize("force_variant_path", [False, True])
def test_fuzzy_match_short_names_oracle_parity(
    spark, short_name_dir, monkeypatch, force_variant_path
):
    """Both oracle-identical fuzzy plans on the short-name corpus: the
    default size gate picks the plain blocked join at 9 names; forcing the
    gate to 0 exercises the deletion-variant path (the ADVICE r8 junk-
    variant regression lives there)."""
    import prefect_flow_arc_indexer_spark.operators.profiling as prof

    if force_variant_path:
        monkeypatch.setattr(prof, "FUZZY_VARIANT_GATE", 0)
    rq = all_queries()["q_fuzzy_match"]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{short_name_dir}/{t}.parquet'"
        )
    try:
        sdf = rq.builder(spark, short_name_dir)
        assert_matches_oracle(sdf, con, rq.oracle)
        # the FastSS superset must still find cross-'' matches: every
        # same-block pair of names with len <= 2 is within distance 2,
        # so ('ab','cd') [dist 2] and (''), ('a'), ('b') pairs all appear
        sdf = rq.builder(spark, short_name_dir)
        got = {
            (r.key_a, r.key_b, r.edit_dist) for r in sdf.collect()
        }
        assert (4, 5, 2) in got, "dist-2 pair ('ab','cd') lost"
        assert (1, 2, 1) in got, "('', 'a') lost"
        assert (4, 8, 0) in got, "exact-duplicate name pair lost"
        sdf.sig_release.release()
        sdf.dn_release.release()
    finally:
        con.close()


def test_fuzzy_variant_guard_no_junk_blocks(spark):
    """Length-0/1 names must not emit descending-sequence junk variants:
    '' produces exactly [''], 'a' exactly ['a', ''] (ADVICE r8)."""
    from prefect_flow_arc_indexer_spark.operators.profiling import (
        deletion_variants,
    )

    cust = spark.createDataFrame(
        [("",), ("a",), ("ab",), ("abc",)], "name string"
    )
    got = {
        r.name: sorted(r.vs)
        for r in cust.select(
            "name", deletion_variants().alias("vs")
        ).collect()
    }
    assert got[""] == [""]
    assert got["a"] == ["", "a"]
    assert got["ab"] == ["", "a", "ab", "b"]
    assert got["abc"] == ["a", "ab", "abc", "ac", "b", "bc", "c"]


def test_semdedup_blocked_assignment_matches_fold_path(spark, monkeypatch):
    """The BLAS-blocked nearest-anchor assignment (engaged when k >
    SEM_BLAS_MIN_ANCHORS — the linear-k production regime) must be
    bit-identical to the expression-fold path at every k: same rounded-
    cosine argmax, same smallest-cell tie-break. Force both paths over the
    same corpus/k and compare full result sets."""
    from prefect_flow_arc_indexer_spark.operators import similarity as sim
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    k = 23  # > the forced threshold below, < the real one

    monkeypatch.setattr(sim, "SEM_BLAS_MIN_ANCHORS", 10**9)
    fold = sorted(map(tuple, sim.semdedup(e, k).collect()))
    monkeypatch.setattr(sim, "SEM_BLAS_MIN_ANCHORS", 1)
    blocked = sorted(map(tuple, sim.semdedup(e, k).collect()))
    assert fold == blocked
    assert len(fold) == e.count()
