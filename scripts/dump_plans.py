"""Dump `.explain("formatted")` for registered queries to plans/r11/.

Usage: python scripts/dump_plans.py <suffix> [sf_dir] [query ...]

Writes plans/r11/<query>_<suffix>.txt for each named query (default: all).
Plans are built lazily (no execution), so this is cheap and safe to run
alongside other work.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.session import get_spark


def main() -> int:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r11"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, rq in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            df = rq.builder(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # pragma: no cover - diagnostic tool
            txt = f"ERROR building plan: {e}"
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
