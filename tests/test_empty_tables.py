"""Empty-input robustness: every oracle-gated query runs on a dataset where
ALL tables have their real schemas but ZERO rows, and Spark/DuckDB must
agree on row count and column set (no crashes, no one-engine phantom rows).

Five queries are excluded with documented engine-semantics reasons:

- ``q_rollup_revenue`` / ``q_cube_revenue`` / ``q_grouping_sets``: SQL
  standard says the grand-total grouping of an empty input still yields one
  all-NULL/zero row — DuckDB follows the standard, Spark's
  rollup()/cube()/GROUPING SETS emit nothing on empty input. Real corpora
  are never empty at the point these run; the divergence is pinned here so
  a behavior change in either engine is noticed.
- ``q_chi_square`` / ``q_conformal_threshold``: the oracle's final step is
  a scalar aggregate (always 1 row, NULL-valued on empty input) while the
  Spark plan ends in a grouped aggregate / join (0 rows). Same class of
  degenerate-input semantics, pinned below.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.sources.parquet import TABLES
from tests.conftest import SF_DIR

EXCLUDED = {
    "q_rollup_revenue": "SQL-standard grand-total row on empty input",
    "q_cube_revenue": "SQL-standard grand-total row on empty input",
    "q_grouping_sets": "SQL-standard grand-total row on empty input",
    "q_chi_square": "oracle scalar agg (1 NULL row) vs grouped plan (0)",
    "q_conformal_threshold": "oracle scalar agg (1 NULL row) vs grouped plan (0)",
}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"""COPY (SELECT * FROM '{SF_DIR}/{t}.parquet' WHERE false)
                TO '{dst}/{t}.parquet' (FORMAT PARQUET)"""
        )
    return str(dst)


def test_all_oracle_queries_survive_empty_tables(spark, empty_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{empty_dir}/{t}.parquet'"
        )
    bad = []
    for name, rq in sorted(all_queries().items()):
        if rq.oracle is None or name in EXCLUDED:
            continue
        try:
            sdf = rq.builder(spark, empty_dir)
            srows = sdf.count()
            scols = sorted(sdf.columns)
        except Exception as e:
            bad.append((name, f"spark crash: {e}"))
            continue
        try:
            res = con.execute(rq.oracle)
            dcols = sorted(d[0] for d in res.description)
            drows = len(res.fetchall())
        except Exception as e:
            bad.append((name, f"duckdb crash: {e}"))
            continue
        if srows != drows or scols != dcols:
            bad.append((name, f"spark {srows} rows vs duck {drows}"))
    assert not bad, bad


def test_excluded_divergences_keep_their_documented_shape(spark, empty_dir):
    """The five exclusions must diverge in EXACTLY the documented way:
    Spark 0 rows, DuckDB 1 grand-total/scalar row. If either engine
    changes behavior, this fails and the exclusion list gets revisited."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{empty_dir}/{t}.parquet'"
        )
    for name in EXCLUDED:
        rq = all_queries()[name]
        assert rq.builder(spark, empty_dir).count() == 0, name
        assert len(con.execute(rq.oracle).fetchall()) == 1, name
