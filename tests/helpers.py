"""Shared oracle-comparison helper for operator tests (mirrors the driver's
row-count + columns + order-insensitive value hash gate)."""

from __future__ import annotations

import hashlib
import math


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_canon(r[i]) for i in order) for r in rows)
    return (
        len(rows),
        sorted(cols),
        hashlib.sha256("\n".join(lines).encode()).hexdigest(),
    )


def assert_matches_oracle(sdf, duck, oracle_sql: str):
    s_sig = signature(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = duck.execute(oracle_sql)
    d_sig = signature([d[0] for d in res.description], res.fetchall())
    assert s_sig[0] == d_sig[0], f"row count: spark={s_sig[0]} duckdb={d_sig[0]}"
    assert s_sig[1] == d_sig[1], f"columns: spark={s_sig[1]} duckdb={d_sig[1]}"
    assert s_sig[2] == d_sig[2], "value hash mismatch"
