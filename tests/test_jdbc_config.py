"""JDBC source config: option construction for the partitioned
production-path read (no Postgres in this environment — SURVEY §1.4 maps
the test harness onto parquet; these tests pin the option contract)."""

from __future__ import annotations

import pytest

from prefect_flow_arc_indexer_spark.sources.jdbc import JdbcSourceConfig


def test_basic_options_carry_reference_defaults():
    cfg = JdbcSourceConfig(
        url="jdbc:postgresql://db:5432/arc", table="graph.index_documents"
    )
    opts = cfg.reader_options()
    assert opts["fetchsize"] == "1000"  # reference db_batch_size default
    assert opts["pushDownPredicate"] == "true"
    assert "partitionColumn" not in opts  # single-cursor mode by default
    assert "user" not in opts and "password" not in opts


def test_partitioned_scan_options_complete():
    cfg = JdbcSourceConfig(
        url="jdbc:postgresql://db:5432/arc",
        table="graph.index_documents",
        partition_column="updated_at_epoch",
        lower_bound="0",
        upper_bound="1700000000",
        num_partitions=64,
    )
    opts = cfg.reader_options()
    assert opts["partitionColumn"] == "updated_at_epoch"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "1700000000")
    assert opts["numPartitions"] == "64"


def test_partition_column_requires_bounds():
    cfg = JdbcSourceConfig(
        url="jdbc:x", table="t", partition_column="id"
    )
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        cfg.reader_options()


def test_extra_options_override():
    cfg = JdbcSourceConfig(
        url="jdbc:x", table="t", extra_options={"fetchsize": "5000"}
    )
    assert cfg.reader_options()["fetchsize"] == "5000"
