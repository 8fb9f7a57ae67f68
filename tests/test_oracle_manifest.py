"""Oracle-promotion gate (VERDICT r7 task 6): the set of oracle-gated
queries is PINNED in ``tests/oracle_manifest.json``. Promoting a rows-only
query to an exact oracle (or registering a new oracle-gated query) fails
this test until ``python scripts/promote_oracle.py`` is run — and that
script refuses to update the manifest until the promoted query passes the
empty-tables parity sweep and (for document-readers) the NULL/unicode
corpus sweep. Round 7's red pytest (q_coreset_kcenter's empty-corpus
crash surfacing only AFTER its oracle conversion) is exactly the gap this
closes: a conversion can no longer skip the degenerate sweeps.
"""

from __future__ import annotations

import json
from pathlib import Path

from prefect_flow_arc_indexer_spark.plans import all_queries

MANIFEST = Path(__file__).parent / "oracle_manifest.json"


def test_oracle_set_matches_pinned_manifest():
    data = json.loads(MANIFEST.read_text())
    reg = all_queries()
    live_oracle = {n for n, r in reg.items() if r.oracle is not None}
    live_rows = {n for n, r in reg.items() if r.oracle is None}

    promoted = live_oracle - set(data["oracle_gated"])
    assert not promoted, (
        f"new oracle promotion(s) {sorted(promoted)} — run "
        "`python scripts/promote_oracle.py` so the degenerate sweeps "
        "(empty tables + NULL/unicode corpus) run at conversion time, "
        "then commit the refreshed tests/oracle_manifest.json"
    )
    # demotions and rows-only drift are also pinned so the manifest cannot
    # silently rot (a demotion weakens the driver gate and must be a
    # deliberate, reviewed change)
    assert live_oracle == set(data["oracle_gated"])
    assert live_rows == set(data["rows_only"])
