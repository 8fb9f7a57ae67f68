"""Replicate the DRIVER's pandas-path comparison (not selfcheck's fetchall
path) to surface dtype-canonicalization drift: Spark toPandas() vs DuckDB
.df().  Nullable int64 -> float64, HUGEINT -> float64, None vs NaN, ndarray
columns -- all the things selfcheck's Python-object path hides.

    python scripts/driver_replica.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.session import get_spark
from prefect_flow_arc_indexer_spark.sources.parquet import TABLES


def _canon(df: pd.DataFrame) -> tuple[int, list[str], str, pd.DataFrame]:
    df = df[sorted(df.columns)].copy()
    # Sort the RAW frame first — the real driver does, and its multi-column
    # lexsort factorizes object columns, which CRASHES on unhashable cells
    # (numpy arrays, lists, dicts). Replicating that order catches both the
    # crash mode and any dtype-dependent sort-order divergence.
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        df[c] = df[c].map(
            lambda v: "NULL"
            if v is None or (isinstance(v, float) and np.isnan(v))
            else (repr(v) if isinstance(v, float) else str(v))
        )
    body = "\n".join("\x1f".join(r) for r in df.itertuples(index=False))
    return (
        len(df),
        list(df.columns),
        hashlib.sha256(body.encode()).hexdigest()[:16],
        df,
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("driver-replica")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, rq in sorted(all_queries().items()):
        if only and name not in only:
            continue
        if rq.oracle is None:
            continue
        try:
            spdf = rq.builder(spark, sf_dir).toPandas()
            n_s, c_s, h_s, sdf = _canon(spdf)
        except Exception as e:
            failures += 1
            print(f"FAIL  {name}: spark/pandas error: {type(e).__name__}: {e}")
            continue
        try:
            ddf = con.execute(rq.oracle).df()
            n_d, c_d, h_d, qdf = _canon(ddf)
        except Exception as e:
            failures += 1
            print(f"FAIL  {name}: duckdb/pandas error: {type(e).__name__}: {e}")
            continue
        if (n_s, c_s, h_s) == (n_d, c_d, h_d):
            print(f"ok    {name}: {n_s} rows")
        else:
            failures += 1
            print(f"FAIL  {name}: spark({n_s},{c_s},{h_s}) duck({n_d},{c_d},{h_d})")
            if n_s == n_d and c_s == c_d:
                neq = (sdf != qdf).any(axis=1)
                bad = sdf[neq].head(3)
                for i in bad.index:
                    print(f"      row {i} spark: {list(sdf.loc[i])}")
                    print(f"      row {i} duck : {list(qdf.loc[i])}")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
