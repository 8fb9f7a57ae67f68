"""Oracle-verify a query whose result is too big to collect.

scripts/selfcheck.py collects both result sets and compares a sorted value
hash — infeasible once a query legitimately returns 10^8 rows (e.g.
q_simhash_pairs at sf1: 175.6M pairs; the driver-side collect blows
spark.driver.maxResultSize long before memory). This tool applies the SAME
gate shape distributed: both engines compute, over the full result,

- COUNT(*),
- SUM of a 32-bit per-row md5 checksum over the canonical row string
  (columns sorted by name, values stringified, 0x1f-joined — mirroring
  selfcheck's canonical form; 32 bits keeps the sum < 2^63 up to ~2*10^9
  rows),
- per-column SUMs for every numeric column.

An order-insensitive match on all of those is the collect-free equivalent
of the value-hash gate (collision odds of the checksum-sum are negligible
and independent of row order). Only integer-valued columns are safe to
checksum this way — float formatting differs between engines.

Usage: python scripts/verify_bigresult.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.session import get_spark
from prefect_flow_arc_indexer_spark.sources.parquet import TABLES


def checksum_gate(sdf, oracle_sql: str, con) -> tuple[tuple, tuple]:
    """Collect-free oracle gate: (count, 32-bit row-checksum sum, numeric
    column sums) computed by BOTH engines over the full result; returns
    (spark_row, duck_row) — equal iff the result sets match order-free.
    Shared by this CLI and scripts/selfcheck.py's maxResultSize fallback."""
    from pyspark.sql import functions as F

    cols = sorted(sdf.columns)
    int_cols = [
        f.name
        for f in sdf.schema.fields
        if f.dataType.simpleString() in ("int", "bigint", "smallint")
    ]
    # NULLs must canonicalize identically on both engines: concat_ws
    # SKIPS null columns while DuckDB's `||` nulls the whole key (and
    # sum() then drops the row's md5) — coalesce to a sentinel on both
    # sides, mirroring selfcheck's NULL handling (ADVICE r7)
    row_key = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in cols
        ],
    )
    aggs = [
        F.count("*").alias("n"),
        F.sum(
            F.conv(F.substring(F.md5(row_key), 1, 8), 16, 10).cast(
                "bigint"
            )
        ).alias("chk"),
        *[F.sum(c).alias(f"s_{c}") for c in int_cols],
    ]
    srow = tuple(sdf.agg(*aggs).collect()[0])
    dkey = " || chr(31) || ".join(
        f"coalesce({c}::VARCHAR, chr(0))" for c in cols
    )
    dsums = "".join(f", sum({c}) AS s_{c}" for c in int_cols)
    drow = tuple(
        con.execute(
            f"WITH r AS ({oracle_sql}) SELECT count(*) AS n, "
            f"sum(('0x' || substr(md5({dkey}), 1, 8))::UBIGINT::BIGINT) "
            f"AS chk{dsums} FROM r"
        ).fetchone()
    )
    return srow, drow


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf_dir, names = sys.argv[1], sys.argv[2:]

    spark = get_spark("verify-bigresult")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in names:
        rq = all_queries()[name]
        if rq.oracle is None:
            print(f"skip  {name}: no oracle")
            continue
        sdf = rq.builder(spark, sf_dir)
        srow, drow = checksum_gate(sdf, rq.oracle, con)
        ok = srow == drow
        failures += 0 if ok else 1
        print(f"{'ok   ' if ok else 'FAIL '} {name}: spark={srow} duck={drow}")
    spark.stop()
    print(f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
