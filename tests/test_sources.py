"""File-format source breadth: every supported format round-trips the real
test tables byte-identically (values, NULLs, timestamps), and a query run
over a non-parquet staging of its input matches the parquet answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.sources import files
from prefect_flow_arc_indexer_spark.sources.parquet import load_table
from tests.conftest import SF_DIR
from tests.helpers import signature

# documents has NULLs in text; events has microsecond timestamps — the two
# hard cases for text formats
ROUNDTRIP_TABLES = ("documents", "events", "orders")


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
@pytest.mark.parametrize("table", ROUNDTRIP_TABLES)
def test_roundtrip_exact(spark, tmp_path, fmt, table):
    src = load_table(spark, SF_DIR, table)
    path = str(tmp_path / f"{table}.{fmt}")
    files.write_table(src, path, fmt)
    got = files.read_table(spark, path, fmt, src.schema)
    assert got.schema == src.schema
    want_sig = signature(src.columns, [tuple(r) for r in src.collect()])
    got_sig = signature(got.columns, [tuple(r) for r in got.collect()])
    assert got_sig == want_sig, f"{table} did not survive {fmt} round-trip"


def test_query_over_csv_staging_matches_parquet(spark, tmp_path):
    """A representative aggregate gives the same answer regardless of the
    input format the data arrived in."""
    orders = load_table(spark, SF_DIR, "orders")
    staged = str(tmp_path / "orders_csv")
    files.write_table(orders, staged, "csv")
    from_csv = files.read_table(spark, staged, "csv", orders.schema)

    def agg(df):
        return sorted(
            df.groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("rev"),
            )
            .collect()
        )

    assert agg(from_csv) == agg(orders)


def test_convert_to_parquet_boundary(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    drop = str(tmp_path / "drop.json")
    files.write_table(docs, drop, "json")
    dest = str(tmp_path / "docs_parquet")
    converted = files.convert_to_parquet(
        spark, drop, "json", docs.schema, dest
    )
    assert converted.count() == docs.count()
    # converted frame is parquet-backed: filters reach the scan
    plan = (
        converted.where(F.col("doc_id") == 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "doc_id" in plan


def test_unknown_format_rejected(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="unsupported format"):
        files.write_table(docs, str(tmp_path / "x"), "avro")


def test_read_with_quarantine_splits_good_and_corrupt(spark, tmp_path):
    from prefect_flow_arc_indexer_spark.sources.files import (
        read_with_quarantine,
    )

    src = tmp_path / "in"
    src.mkdir()
    with open(src / "rows.json", "w") as f:
        f.write('{"id": 1, "name": "ok"}\n')
        f.write("this is not json at all\n")
        f.write('{"id": 2, "name": "also ok"}\n')
        f.write('{"id": "NOT A NUMBER", "name": "type clash"}\n')
        f.write('{"id": null, "name": null}\n')  # all-NULL but VALID

    good, bad = read_with_quarantine(
        spark,
        str(src),
        "json",
        "id long, name string",
        quarantine_path=str(tmp_path / "quarantine"),
    )
    good_rows = {(r.id, r.name) for r in good.collect()}
    assert (1, "ok") in good_rows and (2, "also ok") in good_rows
    assert (None, None) in good_rows  # legit NULL row is NOT quarantined
    assert good.columns == ["id", "name"]

    bad_rows = sorted(r.raw_line for r in bad.collect())
    assert len(bad_rows) == 2
    assert "not json" in bad_rows[1] or "not json" in bad_rows[0]
    # quarantine file carries exactly the offending raw lines for re-ingest
    q = spark.read.text(str(tmp_path / "quarantine"))
    assert q.count() == 2


def test_quarantine_source_file_survives_cache_order(spark, tmp_path):
    """source_file must be captured below the persist: consuming the good
    frame FIRST materializes the cache, and a post-cache input_file_name()
    would then return '' for every quarantine row (the r5 ADVICE bug)."""
    from prefect_flow_arc_indexer_spark.sources.files import (
        read_with_quarantine,
        release_quarantine,
    )

    src = tmp_path / "in"
    src.mkdir()
    with open(src / "rows.json", "w") as f:
        f.write('{"id": 1, "name": "ok"}\n')
        f.write("broken line\n")

    good, bad = read_with_quarantine(spark, str(src), "json", "id long, name string")
    assert good.count() == 1  # materializes the cache first
    files_seen = [r.source_file for r in bad.collect()]
    assert files_seen and all(f.endswith("rows.json") for f in files_seen)
    # the persisted parse is released through either frame of the pair
    assert release_quarantine(bad) is True
    assert release_quarantine(good) is False  # sibling entry already dropped
