"""Watermark persistence — the reference's ``save_last_run_config`` /
``last_modified`` round trip (SURVEY §2.6 T1/T2; reference
``flows/main_flow.py:7,603,611``).

The store keeps one timestamp per pipeline name in a JSON file (atomic
replace). The predicate contract is **inclusive** (``updated_at >= wm``,
reference ``flows/main_flow.py:322`` — note ``>=``): boundary rows are
re-delivered on the next run, which is safe because the sink is idempotent
by document id (upsert semantics).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass
from datetime import datetime

TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


@dataclass
class WatermarkStore:
    path: str

    def _read(self) -> dict[str, str]:
        try:
            with open(self.path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def get(self, name: str) -> datetime | None:
        raw = self._read().get(name)
        return datetime.strptime(raw, TS_FMT) if raw else None

    def set(self, name: str, value: datetime) -> None:
        data = self._read()
        data[name] = value.strftime(TS_FMT)
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(self.path) or ".", suffix=".wm.tmp"
        )
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)
