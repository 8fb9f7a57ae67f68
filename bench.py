"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": "sf0.1"}

Each query is materialized through the `noop` sink (full execution, no
driver-side collect), which is the honest per-query wall-clock for a write-
terminated pipeline. A tiny warm-up query runs first so JVM/codegen startup
isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: touch the JVM, codegen, and the parquet footers once
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, rq in sorted(all_queries().items()):
        t0 = time.perf_counter()
        df = rq.builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": os.path.basename(sf_dir.rstrip("/")),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
