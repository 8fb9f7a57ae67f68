"""End-to-end corpus-prep composite: exact-dedup → quality filter →
deterministic split → per-(split, lang) rollup, as ONE declarative plan.

The point of this operator is compositional: each stage exists standalone
(q_dedup_exact / q_gopher_rules / q_train_split / q_dataset_card), and a
real training-data pipeline runs them fused — which Catalyst does for free
when they are expressed as one DataFrame chain. Total exchanges for the
whole pipeline: TWO — the content-hash window for dedup (min-doc-id keeper
selection, no join-back: the window min replaces the groupBy+semi-join
formulation, which would shuffle twice and evaluate the scan twice) and the
tiny final rollup. Everything else (tokenize, quality bounds, split
bucketing) is scan-side projection/filter, so at 100 TB the pipeline is one
pass over the corpus plus one summary aggregation.

Split buckets reuse the engine-stable salted md5 of q_train_split — the
composite provably assigns every doc the same split as the standalone
operator (same salt, same arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from prefect_flow_arc_indexer_spark.functions.textfns import dd_tokens, tokens
from prefect_flow_arc_indexer_spark.operators.sampling import (
    SPLIT_SALT,
    TRAIN_PCT,
    VAL_PCT,
    _dd_bucket,
    split_bucket,
)
from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table

MIN_TOKENS = 5
MAX_TOKENS = 10_000


@register(
    "q_corpus_pipeline",
    oracle=f"""WITH base AS (
  SELECT doc_id, lang,
         len({dd_tokens("text")}) AS n_tokens,
         length(text) AS n_chars,
         min(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
    FROM documents WHERE text IS NOT NULL
),
kept AS (
  SELECT doc_id, lang, n_tokens, n_chars FROM base
   WHERE doc_id = keeper
     AND n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
),
assigned AS (
  SELECT lang, n_tokens, n_chars,
         CASE WHEN {_dd_bucket(SPLIT_SALT)} < {TRAIN_PCT} THEN 'train'
              WHEN {_dd_bucket(SPLIT_SALT)} < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
    FROM kept
)
SELECT split, lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM assigned GROUP BY split, lang
""",
    doc="end-to-end corpus prep fused into one plan: exact-dedup keeper "
    "selection (content-hash window min — no join-back), token-bound "
    "quality filter, salted-hash split assignment (bit-identical to "
    "q_train_split), per-(split, lang) rollup — TWO exchanges total for "
    "the entire pipeline",
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True).where(
        F.col("text").isNotNull()
    )
    base = docs.select(
        "doc_id",
        "lang",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.min("doc_id")
        .over(Window.partitionBy(F.sha2(F.col("text"), 256)))
        .alias("keeper"),
    )
    kept = base.where(
        (F.col("doc_id") == F.col("keeper"))
        & F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS)
    )
    bucket = split_bucket(F.col("doc_id"), SPLIT_SALT)
    assigned = kept.select(
        "lang",
        "n_tokens",
        "n_chars",
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )
    return assigned.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
