"""Oracle-promotion gate (VERDICT r7 task 6).

Round 7's one red pytest happened because a rows-only query was promoted
to an exact oracle WITHOUT passing the degenerate-input sweeps first: the
empty-tables sweep skips rows-only queries, so the promotion silently
enrolled a query whose empty-corpus path had never run. This script makes
that impossible to repeat:

- ``tests/oracle_manifest.json`` pins the set of oracle-gated query names;
  ``tests/test_oracle_manifest.py`` fails whenever the live registry and
  the manifest diverge.
- The ONLY supported way to update the manifest is this script, and it
  refuses to record a newly promoted query until that query passes the
  empty-tables parity check and (when it reads ``documents``) the
  NULL/unicode corpus parity check — the exact sweeps that would have
  caught the round-7 q_coreset_kcenter crash at conversion time.

Usage:  python scripts/promote_oracle.py          # check + update manifest
        python scripts/promote_oracle.py --check  # diff only, no write
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import duckdb

MANIFEST = ROOT / "tests" / "oracle_manifest.json"
SF_DIR = "/root/testdata/sf0.01"

# NULL / unicode adversarial corpus (the test_null_robustness fixture
# shapes: NULL text, empty, whitespace-only, all-NULL row, multibyte).
NULLISH_DOCS = """
  SELECT CAST(1 AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS text,
         'en' AS lang, 'synthetic' AS source, CAST(0 AS BIGINT) AS n_chars
  UNION ALL SELECT 2, '', 'de', 'synthetic', 0
  UNION ALL SELECT 3, '   ', 'es', 'synthetic', 3
  UNION ALL SELECT 4, NULL, NULL, NULL, NULL
  UNION ALL SELECT 5, 'café naïve 中文 über', 'de',
         'synthetic', 20
"""


def _load_registry():
    from prefect_flow_arc_indexer_spark.plans import all_queries

    return all_queries()


def _manifest_sets() -> tuple[set[str], set[str]]:
    data = json.loads(MANIFEST.read_text()) if MANIFEST.exists() else {
        "oracle_gated": [],
        "rows_only": [],
    }
    return set(data["oracle_gated"]), set(data["rows_only"])


def _signature(cols, rows):
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)

    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    return (
        len(rows),
        sorted(cols),
        hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16],
    )


def _parity(spark, rq, data_dir: str) -> str | None:
    """Run Spark builder vs DuckDB oracle on ``data_dir``; None if they
    agree (row count + columns + value hash), else a description."""
    from prefect_flow_arc_indexer_spark.sources.parquet import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{data_dir}/{t}.parquet'"
        )
    try:
        sdf = rq.builder(spark, data_dir)
        ssig = _signature(sdf.columns, [tuple(r) for r in sdf.collect()])
    except Exception as e:  # noqa: BLE001 — report, don't crash the gate
        return f"spark crash: {e}"
    try:
        res = con.execute(rq.oracle)
        cols = [d[0] for d in res.description]
        dsig = _signature(cols, res.fetchall())
    except Exception as e:  # noqa: BLE001
        return f"duckdb crash: {e}"
    if ssig != dsig:
        return f"mismatch: spark={ssig} duck={dsig}"
    return None


def _build_empty_dir(dst: Path) -> None:
    from prefect_flow_arc_indexer_spark.sources.parquet import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"""COPY (SELECT * FROM '{SF_DIR}/{t}.parquet' WHERE false)
                TO '{dst}/{t}.parquet' (FORMAT PARQUET)"""
        )


def _build_nullish_dir(dst: Path) -> None:
    from prefect_flow_arc_indexer_spark.sources.parquet import TABLES

    con = duckdb.connect()
    con.execute(
        f"COPY ({NULLISH_DOCS}) TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{dst}/{t}.parquet")


def main() -> int:
    check_only = "--check" in sys.argv
    reg = _load_registry()
    live_oracle = {n for n, r in reg.items() if r.oracle is not None}
    live_rows = {n for n, r in reg.items() if r.oracle is None}
    man_oracle, man_rows = _manifest_sets()

    promoted = sorted(live_oracle - man_oracle)
    demoted = sorted(man_oracle - live_oracle)
    if demoted:
        print(f"note: {len(demoted)} left the oracle set: {demoted}")
    if not promoted:
        print("no new oracle promotions")
        if not check_only:
            MANIFEST.write_text(
                json.dumps(
                    {
                        "oracle_gated": sorted(live_oracle),
                        "rows_only": sorted(live_rows),
                    },
                    indent=1,
                )
                + "\n"
            )
            print(f"manifest refreshed: {MANIFEST}")
        return 0

    print(f"{len(promoted)} new oracle promotion(s): {promoted}")
    if check_only:
        return 1

    # the empty-tables sweep's documented engine-semantics exclusions apply
    # here too (SQL-standard grand-total rows etc.)
    from tests.test_empty_tables import EXCLUDED

    from prefect_flow_arc_indexer_spark.session import get_spark

    spark = get_spark("promote-oracle")
    failures: list[tuple[str, str]] = []
    with tempfile.TemporaryDirectory() as tmp:
        empty_dir, null_dir = Path(tmp) / "empty", Path(tmp) / "nullish"
        empty_dir.mkdir()
        null_dir.mkdir()
        _build_empty_dir(empty_dir)
        _build_nullish_dir(null_dir)
        for name in promoted:
            rq = reg[name]
            if name in EXCLUDED:
                print(f"skip  {name}: excluded ({EXCLUDED[name]})")
                continue
            err = _parity(spark, rq, str(empty_dir))
            if err:
                failures.append((name, f"empty-tables: {err}"))
                continue
            # only document-touching queries see the NULL/unicode corpus
            if "documents" in rq.oracle:
                err = _parity(spark, rq, str(null_dir))
                if err:
                    failures.append((name, f"null/unicode: {err}"))
                    continue
            print(f"ok    {name}: degenerate sweeps pass")

    if failures:
        for name, why in failures:
            print(f"FAIL  {name}: {why}")
        print("manifest NOT updated — fix the failures first")
        return 1

    MANIFEST.write_text(
        json.dumps(
            {
                "oracle_gated": sorted(live_oracle),
                "rows_only": sorted(live_rows),
            },
            indent=1,
        )
        + "\n"
    )
    print(f"manifest updated: {MANIFEST}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
