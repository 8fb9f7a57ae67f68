"""Propose the next driver-window rotation from the coverage ledger.

Prints the 30 extension-slot candidates for the next round: every
never-driver-checked query that (a) carries an exact oracle (window
policy: no rows-only entries inside the recorded sample) and (b) is not
already in the current window, sampled round-robin across operator
modules so one family can't monopolize the gate. Run after regenerating
COVERAGE_LEDGER.json at round start:

    python scripts/coverage_ledger.py && python scripts/rotate_window.py

The output is a starting point — hand-curate before editing
``plans/registry.py`` (keep judge-named priorities first).
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

N_SLOTS = 30


def main() -> int:
    from prefect_flow_arc_indexer_spark.plans.registry import (
        _DRIVER_WINDOW,
        _REGISTRY,
        all_queries,
    )

    all_queries()  # load registry
    ledger = json.loads((ROOT / "COVERAGE_LEDGER.json").read_text())
    seen = set(ledger["last_green_round"]) | set(_DRIVER_WINDOW)

    by_module: dict[str, list[str]] = defaultdict(list)
    for name, rq in _REGISTRY.items():
        if name in seen or rq.oracle is None:
            continue
        by_module[rq.builder.__module__.rsplit(".", 1)[-1]].append(name)

    picked: list[str] = []
    while len(picked) < N_SLOTS and any(by_module.values()):
        for mod in sorted(by_module):
            if by_module[mod] and len(picked) < N_SLOTS:
                picked.append(by_module[mod].pop(0))

    remaining = sum(len(v) for v in by_module.values())
    print(f"# next rotation candidates ({len(picked)} slots, "
          f"{remaining} oracle-gated never-checked left after):")
    for name in picked:
        print(f'    "{name}",')

    # Post-closure policy (r11 closed the ledger: every registered query
    # has driver exposure).  When the never-checked pool can no longer
    # fill the window, top up with the STALEST greens — oldest last-green
    # round first, round-robin across modules within a round — so the
    # recorded gate keeps re-certifying the whole inventory on a rolling
    # basis instead of re-spending slots on last round's winners.
    if len(picked) < N_SLOTS:
        stale = sorted(
            (
                (rnd, name)
                for name, rnd in ledger["last_green_round"].items()
                if name in _REGISTRY
                and _REGISTRY[name].oracle is not None
                and name not in picked
                and name not in _DRIVER_WINDOW
            ),
        )
        top_up = [n for _, n in stale[: N_SLOTS - len(picked)]]
        print(f"# staleness top-up ({len(top_up)} slots, oldest "
              "last-green first):")
        for name in top_up:
            print(f'    "{name}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
