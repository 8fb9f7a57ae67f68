"""Evidence that the layout keys actually buy data skipping: write the
orders table as parquet row groups (a) sorted by the Z-order key and (b)
sorted by the natural primary key, then count — from parquet footer
min/max statistics alone, exactly what a scan's row-group pruning uses —
how many row groups a two-dimensional box predicate must read under each
layout. The Z-order layout must prune strictly more groups, on BOTH
single-dimension predicates, than the natural layout prunes on its
non-sort dimension.

This is the test-level proof behind q_zorder_key's scale claim: the
operator emits the key; this demonstrates the key does its job at the
storage layer without relying on Spark runtime metrics.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.plans import all_queries
from tests.conftest import SF_DIR_MID

ROW_GROUP = 500


def _write_sorted(df, sort_cols, path):
    pdf = df.orderBy(*sort_cols).toPandas()
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        path,
        row_group_size=ROW_GROUP,
    )


def _groups_matching(path, col, lo, hi):
    """Row groups whose [min, max] for col overlaps [lo, hi] — the set a
    stats-pruning scan must read."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.names.index(col)
    hit = 0
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(idx).statistics
        if st is None or st.min is None:
            hit += 1
            continue
        if st.max >= lo and st.min <= hi:
            hit += 1
    return hit, md.num_row_groups


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    keyed = all_queries()["q_zorder_key"].builder(spark, SF_DIR_MID)
    zpath = str(tmp_path / "orders_zorder.parquet")
    npath = str(tmp_path / "orders_natural.parquet")
    cols = keyed.select("o_orderkey", "x", "y", "zkey")
    _write_sorted(cols, [F.col("zkey")], zpath)
    _write_sorted(cols, [F.col("o_orderkey")], npath)

    stats = cols.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).collect()[0]
    x_lo, x_hi = stats[0], stats[0] + max((stats[1] - stats[0]) // 10, 1)
    y_lo, y_hi = stats[2], stats[2] + max((stats[3] - stats[2]) // 10, 1)

    zx, total = _groups_matching(zpath, "x", x_lo, x_hi)
    zy, _ = _groups_matching(zpath, "y", y_lo, y_hi)
    nx, _ = _groups_matching(npath, "x", x_lo, x_hi)
    ny, _ = _groups_matching(npath, "y", y_lo, y_hi)

    assert total >= 10  # enough groups for pruning to be meaningful
    # the natural layout is uncorrelated with both dims -> reads ~all groups
    # on each; the Z-order layout must skip a meaningful share on BOTH
    assert zx < nx and zy < ny
    assert zx <= total * 0.6 and zy <= total * 0.6
