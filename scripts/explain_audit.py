"""Plan-quality audit: for every registered query, inspect the physical plan
for the scale-critical properties (run at any SF — plans don't change):

- column pruning: parquet ReadSchema should not include unused columns;
- predicate pushdown: filters on scanned tables appear as PushedFilters;
- join strategy: broadcast joins where a side is known-small, no accidental
  shuffled cartesian products;
- python boundary: flags plans with row-at-a-time Python UDFs (none should
  exist; ArrowEvalPython/MapInPandas are the sanctioned boundary).

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.session import get_spark


def audit(plan: str) -> dict[str, object]:
    scans = re.findall(r"FileScan parquet \[[^\]]*\]", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "scans": len(scans),
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_cols": [
            len([c for c in rs.split(",") if c.strip()]) for rs in read_schemas
        ],
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "cartesian": plan.count("CartesianProduct"),
        # row-at-a-time scalar Python UDFs: bad in any hot path. The UDTF
        # node (BatchEvalPythonUDTF) is counted separately — it exists only
        # in the deliberate UDTF-surface demo (q_udtf_chunks), whose JVM-side
        # hot-path equivalent is the higher-order-function explode.
        "python_udf": plan.count("BatchEvalPython")
        - plan.count("BatchEvalPythonUDTF"),
        "python_udtf": plan.count("BatchEvalPythonUDTF"),
        "arrow_python": plan.count("ArrowEvalPython") + plan.count("MapInPandas"),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a]
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    flagged = 0
    for name, rq in sorted(qs.items()):
        if names and name not in names:
            continue
        try:
            df = rq.builder(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # a broken builder must not hide the rest
            flagged += 1
            print(f"{name:28s} <-- BUILD-ERROR: {e}")
            continue
        a = audit(plan)
        flags = []
        if a["python_udf"]:
            flags.append("ROW-PYTHON-UDF")
        if a["cartesian"]:
            flags.append("CARTESIAN")
        mark = " <-- " + ",".join(flags) if flags else ""
        flagged += bool(flags)
        print(
            f"{name:28s} scans={a['scans']} cols={a['read_cols']} "
            f"pushed={len(a['pushed_filters'])} bcast={a['broadcast_joins']} "
            f"smj={a['sortmerge_joins']} arrow={a['arrow_python']} "
            f"wscg={a['codegen_spans']}{mark}"
        )
    print(f"\nflagged: {flagged}")
    spark.stop()


if __name__ == "__main__":
    main()
