"""distrank two-pass primitives: exactness at scale, including the
branch-consistency regression (r5): WITHOUT the internal localCheckpoint,
the offsets aggregation and the output rows re-plan the range exchange
independently; column pruning can make the two exchange subplans differ,
each RangePartitioner samples its own boundaries, and spark_partition_id
misaligns between branches — a silently wrong cumsum/rank whenever the
caller carries an extra column (observed on the sf0.1 documents table)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.operators.distrank import (
    global_cumsum,
    global_rank,
)


def _wide_frame(spark, n=20_000):
    # extra payload columns reproduce the divergent-pruning shape
    return spark.range(n).select(
        F.col("id"),
        (F.xxhash64("id") % 997).alias("v"),
        F.concat(F.lit("payload_"), F.col("id")).alias("extra1"),
        (F.col("id") % 13).alias("extra2"),
    )


def test_global_cumsum_exact_with_extra_columns(spark):
    df = _wide_frame(spark)
    out = global_cumsum(
        df, F.col("v"), [F.col("id").asc()], "cum", num_parts=8
    )
    rows = sorted((r.id, r.v, r.cum) for r in out.collect())
    run = 0
    for _id, v, cum in rows:
        run += v
        assert cum == run, f"cumsum diverged at id={_id}: {cum} != {run}"
    # payload columns survive
    assert set(out.columns) == {"id", "v", "extra1", "extra2", "cum"}


def test_global_rank_exact_and_dense_with_extra_columns(spark):
    df = _wide_frame(spark)
    out = global_rank(
        df, [F.col("v").asc(), F.col("id").asc()], "rnk", num_parts=8
    )
    rows = sorted((r.v, r.id, r.rnk) for r in out.collect())
    for i, (_, _, rnk) in enumerate(rows):
        assert rnk == i + 1


def test_global_cumsum_null_values_count_as_zero(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "id long, v int"
    )
    out = {
        r.id: r.cum
        for r in global_cumsum(
            df, F.col("v"), [F.col("id").asc()], "cum"
        ).collect()
    }
    assert out == {1: 10, 2: 10, 3: 15}


# -- property-based: random values/duplicates/negatives vs plain Python ------
from hypothesis import HealthCheck, given, settings, strategies as st

_PROP = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_PROP)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60
    ),
    parts=st.integers(min_value=1, max_value=5),
)
def test_global_rank_matches_python_sort(spark, vals, parts):
    df = spark.createDataFrame(
        [(i, v, f"x{i}") for i, v in enumerate(vals)],
        "id long, v long, extra string",
    )
    got = {
        r.id: r.rnk
        for r in global_rank(
            df, [F.col("v").asc(), F.col("id").asc()], num_parts=parts
        ).collect()
    }
    want = {
        i: rank + 1
        for rank, (v, i) in enumerate(
            sorted((v, i) for i, v in enumerate(vals))
        )
    }
    assert got == want


@settings(**_PROP)
@given(
    vals=st.lists(
        st.one_of(
            st.none(), st.integers(min_value=-1000, max_value=1000)
        ),
        min_size=1,
        max_size=60,
    ),
    parts=st.integers(min_value=1, max_value=5),
)
def test_global_cumsum_matches_python_prefix_sum(spark, vals, parts):
    df = spark.createDataFrame(
        [(i, v, i % 3) for i, v in enumerate(vals)],
        "id long, v long, extra long",
    )
    got = {
        r.id: r.cum
        for r in global_cumsum(
            df, F.col("v"), [F.col("id").asc()], num_parts=parts
        ).collect()
    }
    run, want = 0, {}
    for i, v in enumerate(vals):
        run += v or 0
        want[i] = run
    assert got == want


# -- derived fan-out (VERDICT r5 task 3) -------------------------------------


def test_derived_parts_grow_with_input(spark):
    """The fan-out must scale with the optimizer's input-size estimate: a
    100x scale-up that forgets the num_parts knob no longer gets 8-partition
    range sorts."""
    from prefect_flow_arc_indexer_spark.operators.distrank import (
        MIN_PARTS,
        TARGET_PART_BYTES,
        derive_num_parts,
    )

    small = derive_num_parts(spark.range(1_000))
    big = derive_num_parts(spark.range(2_000_000_000))   # ~16 GB estimate
    huge = derive_num_parts(spark.range(200_000_000_000))  # ~1.6 TB estimate
    assert small == MIN_PARTS
    assert big > small and huge > big
    # proportionality: one partition per TARGET_PART_BYTES of input
    assert huge == -(-200_000_000_000 * 8 // TARGET_PART_BYTES)


def test_derived_parts_session_conf_override(spark):
    from prefect_flow_arc_indexer_spark.operators.distrank import (
        PARTS_CONF,
        derive_num_parts,
    )

    spark.conf.set(PARTS_CONF, "37")
    try:
        assert derive_num_parts(spark.range(10)) == 37
        assert derive_num_parts(spark.range(200_000_000_000)) == 37
    finally:
        spark.conf.unset(PARTS_CONF)


def test_global_rank_derived_parts_correct_end_to_end(spark):
    """num_parts=None (the derived path) produces the identical ranking."""
    df = spark.createDataFrame(
        [(i, i * 7 % 13) for i in range(40)], "id long, v long"
    )
    got = {
        r.id: r.rnk
        for r in global_rank(
            df, [F.col("v").asc(), F.col("id").asc()]
        ).collect()
    }
    order = sorted(range(40), key=lambda i: (i * 7 % 13, i))
    want = {i: n + 1 for n, i in enumerate(order)}
    assert got == want
