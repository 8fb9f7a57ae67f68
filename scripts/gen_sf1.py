"""Generate an sf1 rehearsal dataset from sf0.1 (VERDICT r6 task 5).

The driver ships sf{0.001,0.01,0.1} read-only and no generator, so the sf1
threshold rehearsal builds its own: deterministic x10 replication of sf0.1
with DISJOINT key remapping per replica (new_key = key + i * key_range), so
referential integrity, per-key cardinalities, and value distributions are
preserved while every additive aggregate sees 10x the rows — exactly the
decimal-width / threshold stress sf0.1 headroom hides. Replica 0 is sf0.1
verbatim.

Two columns get a deterministic per-replica perturbation to avoid
pathological structure that plain copying would create:

- ``documents.text``: word-rotate by ``(i * 7) % n_words`` — same words,
  same single-space joins, same length (so ``n_chars`` stays true), but
  shingle sets differ across replicas, keeping near-dup families at
  roughly sf0.1's density instead of welding every doc to 9 exact clones;
- ``embeddings.embedding``: add ``((i*31 + d*17 + vec_id*13) % 97 - 48)
  * 1e-3`` per dimension — breaks the exact-tie top-k degeneracy ten
  identical copies of every vector would create;
- ``events.ts``: shift by ``i * 31 days`` (the time-axis analog of the
  key shift; sf0.1's events span one calendar month, so replicas land in
  DISJOINT wall-clock ranges). Without it every replica shares the same
  month and global-vs-per-user interval overlap density grows with the
  replica count — q_interval_join measured 14.5x wall for 10x data from
  the data alone, polluting the scale-ratio watchlist (VERDICT r8
  task 6). No query predicates an absolute events date, so selectivities
  are unchanged.

Usage:  python scripts/gen_sf1.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> <repo>/testdata_sf1 (gitignored).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10

# key column -> offset stride (== the column's key range in sf0.1)
_SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
_VERBATIM = ("region", "nation")  # fixed dimensions: FK targets stay put

# timestamp column -> per-replica shift in microseconds (the time-axis
# analog of _SHIFTS: replicas must occupy disjoint wall-clock ranges or
# global-vs-per-key temporal overlap density grows with the replica count)
_TS_SHIFTS = {
    "events": {"ts": 31 * 24 * 3600 * 1_000_000},  # sf0.1 spans one month
}


def _shifted(table: pa.Table, shifts: dict[str, int], i: int) -> pa.Table:
    for col, stride in shifts.items():
        # _SHIFTS strides are sf0.1's key ranges; running against a larger
        # source would silently collide keys across replicas (ADVICE r7)
        mx = pc.max(table.column(col)).as_py()
        if mx is not None and mx >= stride:
            raise ValueError(
                f"{col}: max key {mx} >= stride {stride} — source is not "
                "sf0.1; derive strides from the actual key ranges first"
            )
        idx = table.schema.get_field_index(col)
        shifted = pc.add(table.column(col), pa.scalar(i * stride, pa.int64()))
        table = table.set_column(idx, table.schema.field(col), shifted)
    return table


def _ts_shifted(table: pa.Table, shifts: dict[str, int], i: int) -> pa.Table:
    for col, stride_us in shifts.items():
        span = pc.subtract(
            pc.max(table.column(col)), pc.min(table.column(col))
        ).cast(pa.duration("us")).as_py()
        # same collision guard as _shifted: a source spanning more than the
        # stride would overlap replicas in time
        if span is not None and span.total_seconds() * 1e6 >= stride_us:
            raise ValueError(
                f"{col}: source span {span} >= stride {stride_us}us — "
                "derive the time stride from the actual range first"
            )
        idx = table.schema.get_field_index(col)
        shifted = pc.add(
            table.column(col), pa.scalar(i * stride_us, pa.duration("us"))
        )
        table = table.set_column(idx, table.schema.field(col), shifted)
    return table


def _rotate_texts(table: pa.Table, i: int) -> pa.Table:
    texts = table.column("text").to_pylist()
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        words = t.split(" ")
        r = (i * 7) % max(1, len(words))
        out.append(" ".join(words[r:] + words[:r]))
    idx = table.schema.get_field_index("text")
    return table.set_column(idx, table.schema.field("text"), pa.array(out))


def _perturb_embeddings(table: pa.Table, i: int) -> pa.Table:
    vec_ids = np.asarray(table.column("vec_id").to_pylist(), dtype=np.int64)
    embs = table.column("embedding").to_pylist()
    dim = len(embs[0])
    d_idx = np.arange(dim, dtype=np.int64)
    out = []
    for vid, v in zip(vec_ids, embs):
        delta = ((i * 31 + d_idx * 17 + vid * 13) % 97 - 48) * 1e-3
        out.append((np.asarray(v, dtype=np.float32) + delta.astype(np.float32)))
    arr = pa.array([list(map(float, v)) for v in out], pa.list_(pa.float32()))
    idx = table.schema.get_field_index("embedding")
    return table.set_column(idx, table.schema.field("embedding"), arr)


def main() -> int:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    dst = Path(
        sys.argv[2]
        if len(sys.argv) > 2
        else Path(__file__).resolve().parent.parent / "testdata_sf1"
    )
    dst.mkdir(parents=True, exist_ok=True)
    for name in _VERBATIM:
        t = pq.read_table(src / f"{name}.parquet")
        pq.write_table(t, dst / f"{name}.parquet")
        print(f"{name}: {t.num_rows} rows (verbatim)")
    for name, shifts in _SHIFTS.items():
        base = pq.read_table(src / f"{name}.parquet")
        parts = []
        for i in range(REPLICAS):
            t = _shifted(base, shifts, i)
            if i and name in _TS_SHIFTS:
                t = _ts_shifted(t, _TS_SHIFTS[name], i)
            if i and name == "documents":
                t = _rotate_texts(t, i)
            if i and name == "embeddings":
                t = _perturb_embeddings(t, i)
            parts.append(t)
        full = pa.concat_tables(parts)
        pq.write_table(full, dst / f"{name}.parquet")
        print(f"{name}: {base.num_rows} -> {full.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
