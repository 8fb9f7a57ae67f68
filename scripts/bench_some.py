"""Focused bench replica: time named queries with bench.py's methodology
(warm pass at the target SF, then N timed noop-sink passes with clean-slate
cache/checkpoint release between windows; report per-query min).

Usage: python scripts/bench_some.py [--sf=DIR] [--passes=N] query [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.session import get_spark


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    passes = 2
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])
        else:
            names.append(a)
    spark = get_spark(
        "bench-some", extra_confs={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def _release_all():
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        sc = spark.sparkContext._jsc.sc()
        ids = sc.getPersistentRDDs().keys().toList()
        for i in range(ids.size()):
            try:
                sc.unpersistRDD(ids.apply(i), False)
            except Exception:
                pass

    # warm
    for n in names:
        qs[n].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        _release_all()
    best: dict[str, float] = {}
    for p in range(passes):
        for n in names:
            t0 = time.perf_counter()
            qs[n].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.perf_counter() - t0
            _release_all()
            if n not in best or el < best[n]:
                best[n] = el
            print(f"pass{p} {n}: {el:.3f}s", flush=True)
    print("---- min ----")
    for n in names:
        print(f"{n}: {best[n]:.3f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
