"""Equivalence pin for the r12 char-entropy Arrow kernel: q_char_entropy's
kernel and the shared JVM char_entropy_col (still used by the fused
q_quality_ensemble projection) must agree row-for-row on the real corpus —
the two implementations cannot drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.operators.text_analysis import (
    _char_entropy_kernel,
    char_entropy_col,
)
from prefect_flow_arc_indexer_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"

EDGE_ROWS = [
    (1, "a"),  # single char: H = 0
    (2, "ab"),
    (3, "aaaa"),
    (4, "the quick brown fox"),
    (5, "aA zZ 09 !?\t\n"),  # case, digits, punctuation, whitespace chars
    (6, "ababababab"),
]


def _kernel_rows(docs):
    return sorted(
        map(
            tuple,
            docs.select("doc_id", "text")
            .mapInArrow(
                _char_entropy_kernel(), "doc_id bigint, char_entropy double"
            )
            .collect(),
        )
    )


def _jvm_rows(docs):
    return sorted(
        map(
            tuple,
            docs.select(
                "doc_id", char_entropy_col(F.col("text")).alias("e")
            ).collect(),
        )
    )


def test_kernel_matches_jvm_on_corpus(spark):
    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    assert _kernel_rows(docs) == _jvm_rows(docs)


def test_kernel_matches_jvm_on_edge_rows(spark):
    docs = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
    got = _kernel_rows(docs)
    assert got == _jvm_rows(docs)
    by_id = dict(got)
    assert by_id[1] == 0.0
    assert by_id[2] == 1.0
    assert by_id[3] == 0.0
