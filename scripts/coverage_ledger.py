"""Driver-verification coverage ledger (VERDICT r5 task 1 audit trail).

Reads every recorded ``CORRECTNESS_r*.json`` plus the query registry and
emits ``COVERAGE_LEDGER.json``::

    {
      "generated_from": ["CORRECTNESS_r01.json", ...],
      "registered": 253,
      "ever_green": 76,
      "never_checked": 147,
      "last_green_round": {"q_full_select": 5, ...},   # q_id -> round
      "never": ["q_zipf_fit", ...],                    # sorted
      "current_window": ["q_distinct_indexes", ...]    # the 50 the driver samples
    }

A query counts as driver-green when its CORRECTNESS row has
rows_match && schema_match && (hash_match is true or absent/null for
rows-only entries) && no err.  Run from the repo root:

    python scripts/coverage_ledger.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def is_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") in (True, None)
        and not row.get("err")
    )


def build() -> dict:
    files = sorted(ROOT.glob("CORRECTNESS_r*.json"))
    last_green: dict[str, int] = {}
    for f in files:
        m = re.search(r"_r(\d+)", f.name)
        rnd = int(m.group(1)) if m else 0
        for q, row in json.loads(f.read_text()).items():
            if is_green(row):
                last_green[q] = max(rnd, last_green.get(q, 0))

    from prefect_flow_arc_indexer_spark.plans.registry import (
        _DRIVER_WINDOW,
        all_queries,
    )

    registered = list(all_queries())
    never = sorted(q for q in registered if q not in last_green)
    return {
        "generated_from": [f.name for f in files],
        "registered": len(registered),
        "ever_green": len(last_green),
        "never_checked": len(never),
        "last_green_round": dict(sorted(last_green.items())),
        "never": never,
        "current_window": list(_DRIVER_WINDOW),
    }


def main() -> int:
    ledger = build()
    out = ROOT / "COVERAGE_LEDGER.json"
    out.write_text(json.dumps(ledger, indent=1) + "\n")
    print(
        f"{ledger['registered']} registered; {ledger['ever_green']} ever "
        f"driver-green; {ledger['never_checked']} never checked -> {out.name}"
    )
    window_new = [
        q for q in ledger["current_window"] if q not in ledger["last_green_round"]
    ]
    print(f"current window exposes {len(window_new)} first-time queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
