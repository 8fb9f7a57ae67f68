"""Plan-quality audit: for every registered query, inspect the physical plan
for the scale-critical properties (run at any SF — plans don't change):

- column pruning: parquet ReadSchema should not include unused columns;
- predicate pushdown: filters on scanned tables appear as PushedFilters;
- join strategy: broadcast joins where a side is known-small, no accidental
  shuffled cartesian products;
- python boundary: flags plans with row-at-a-time Python UDFs (none should
  exist; ArrowEvalPython/MapInPandas are the sanctioned boundary);
- window partitioning: flags WindowExec nodes with an EMPTY partition spec
  ("No Partition Defined for Window" — the whole input collapses to one
  task) unless the window is structurally bounded (the two-pass offset
  table of distrank: ordered by a spark_partition_id column, |range
  partitions| rows) or the query is allowlisted below with a reason why
  its window input is values/vocab-bounded rather than corpus-sized.

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.session import get_spark

# Queries whose registered plan contains an unpartitioned window over an
# input PROVABLY bounded by values (a histogram of distinct lengths/scores),
# vocabulary, catalog size (#indexes), calendar (days/months), or a
# LIMIT-k — never by corpus row count. Every entry says which.
BOUNDED_GLOBAL_WINDOWS: dict[str, str] = {
    "q_backlog_sweep": "cumsum over the DAILY delta table (calendar axis)",
    "q_ccnet_buckets": "tercile cut over the score HISTOGRAM (distinct "
    "quantized scores)",
    "q_ece_calibration": "weighted-ECE sum over the 10-row bin table",
    "q_ks_drift": "ECDF cumsum over distinct feature values (histogram)",
    "q_length_trim": "percentile cut over the token-length HISTOGRAM",
    "q_mom_growth": "lag over the per-MONTH revenue rollup",
    "q_negative_sampling": "inverse-CDF cumsum over the LIMIT-k vocab table",
    "q_pagerank": "row_number over the LIMIT-k survivors "
    "(TakeOrderedAndProject feeds it)",
    "q_returned_top_customers": "row_number over the LIMIT-20 survivors",
    "q_revenue_acf": "lag windows over the DAILY revenue series",
    "q_rolling_revenue": "rolling sum over the DAILY revenue rollup",
    "q_skyline_docs": "frontier running-max over the token-count HISTOGRAM "
    "(distinct lengths)",
    "q_source_keywords": "scalar total over the LIMIT-k vocab x sources "
    "table",
    "q_topk_tail": "rank over per-INDEX doc counts (catalog-bounded)",
    "q_vocab_coverage": "coverage cumsum over the vocab frequency table",
    "q_zipf_fit": "rank over the term-frequency VOCAB table",
}


def _iter_plan_nodes(node):
    """DFS over a physical-plan tree via py4j, descending through the AQE
    wrapper (AdaptiveSparkPlanExec is a leaf whose real tree hangs off
    inputPlan) and query-stage wrappers."""
    yield node
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from _iter_plan_nodes(node.inputPlan())
        return
    if name.endswith("QueryStageExec"):
        yield from _iter_plan_nodes(node.plan())
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from _iter_plan_nodes(ch.apply(i))


def unpartitioned_windows(plan_root) -> list[str]:
    """Order specs of WindowExec nodes with an empty partition spec,
    excluding the sanctioned two-pass offset pattern (ordered by a
    ``pid``/``_pid`` spark_partition_id column — one row per range
    partition, bounded by construction)."""
    found = []
    for n in _iter_plan_nodes(plan_root):
        if n.getClass().getSimpleName() not in (
            "WindowExec",
            "WindowInPandasExec",
        ):
            continue
        if not n.partitionSpec().isEmpty():
            continue
        order = n.orderSpec().toString()
        if re.search(r"\b_?pid#", order):
            continue
        found.append(order)
    return found


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
            root = df._jdf.queryExecution().executedPlan()
            plan = root.toString()
            global_windows = unpartitioned_windows(root)
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
        if global_windows and name not in BOUNDED_GLOBAL_WINDOWS:
            flags.append(f"GLOBAL-WINDOW({len(global_windows)})")
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
