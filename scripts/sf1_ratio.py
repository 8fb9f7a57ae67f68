"""Standing sf1 scale GATE (VERDICT r7 task 5; hardened to fail, r9 task 8).

Merge two ``bench_full.json``-shaped files (the sf0.1 and sf1 bench runs)
into the per-query scale-ratio table the judge reads: ratio = sf1 wall /
sf0.1 wall for 10x the data — the number that exposes plans that won't
survive 100x. Emits markdown to stdout; redirect into the round's bench
notes.

Exit status is the gate: any query over RATIO_MAX (6x) with more than
ABS_MIN_SECS (1 s) absolute sf1 cost fails the run (exit 1) unless its
name carries a documented output-bound waiver in WAIVERS below — the
watchlist enforces itself instead of relying on a human reading the table.

    python bench.py > /dev/null                    # writes bench_full.json
    cp bench_full.json /tmp/bench_sf01.json
    SPARK_GRAFT_SF_DIR=testdata_sf1 python bench.py > /dev/null
    python scripts/sf1_ratio.py /tmp/bench_sf01.json bench_full.json
"""

from __future__ import annotations

import json
import sys

RATIO_MAX = 6.0
ABS_MIN_SECS = 1.0

# Documented waivers: queries whose wall is OUTPUT-bound (result volume
# growing superlinearly by contract), not plan-bound. Each entry must say
# why; an empty dict is the goal state.
WAIVERS: dict[str, str] = {
    "q_simhash_pairs": (
        "all-pairs-in-ball enumeration CONTRACT: output is 175.6M pairs at "
        "sf1 (checksum-verified, BENCH_NOTES_r9), so wall tracks result "
        "volume, not plan cost; the bounded production path is "
        "q_simhash_capped (2.4x output for 10x data)"
    ),
    "q_winnowing": (
        "fingerprint OUTPUT volume scales with total token count; "
        "per-row work is constant (SF1_RATIOS_r9: sublinear in work, "
        "output + fixed-overhead amortization)"
    ),
    "q_bitext_margin": (
        "margin candidates grow with cross-lingual pair density in the "
        "generated corpus; verified sublinear in work (SF1_RATIOS_r9)"
    ),
}


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    small = json.loads(open(sys.argv[1]).read())
    big = json.loads(open(sys.argv[2]).read())
    qs_s, qs_b = small["queries"], big["queries"]
    common = sorted(set(qs_s) & set(qs_b))
    rows = []
    for n in common:
        s, b = qs_s[n], qs_b[n]
        rows.append((n, s, b, (b / s) if s > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])

    tot_s = sum(qs_s[n] for n in common)
    tot_b = sum(qs_b[n] for n in common)
    print(f"# sf0.1 -> sf1 scale ratios ({len(common)} queries)")
    print()
    print(
        f"Aggregate: {tot_s:.1f} s -> {tot_b:.1f} s = "
        f"**{tot_b / tot_s:.2f}x wall for 10x data**"
    )
    print()
    print("Worst 15 per-query ratios (the 100x-survival watchlist):")
    print()
    print("| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for n, s, b, r in rows[:15]:
        print(f"| {n} | {s:.2f} | {b:.2f} | {r:.1f}x |")
    over = [
        (n, r)
        for n, s, b, r in rows
        if r > RATIO_MAX and b > ABS_MIN_SECS
    ]
    waived = [(n, r) for n, r in over if n in WAIVERS]
    failing = [(n, r) for n, r in over if n not in WAIVERS]
    print()
    for n, r in waived:
        print(f"WAIVED {n} ({r:.1f}x): {WAIVERS[n]}")
    if failing:
        print(
            f"GATE FAIL: {len(failing)} unwaived queries exceed "
            f"{RATIO_MAX:.0f}x wall for 10x data at >{ABS_MIN_SECS:.0f} s "
            f"absolute cost: "
            f"{', '.join(f'{n} ({r:.1f}x)' for n, r in failing)}"
        )
        return 1
    print(
        f"GATE PASS: no unwaived query exceeds {RATIO_MAX:.0f}x wall for "
        f"10x data at >{ABS_MIN_SECS:.0f} s absolute cost."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
