"""Two-stage hybrid retrieval — the sparse-recall + dense-rerank pipeline a
production RAG / search stack runs (extension surface; the reference
delegates ALL retrieval to its Elasticsearch sink, e.g. the `es.search`
probe at ``/root/reference/flows/main_flow.py:56-64`` — this operator is
the Spark-owned analog of that served query path).

The two stages embody the 100 TB retrieval contract:

1. **sparse recall** (cheap, high-recall): candidate docs are those sharing
   at least one word-3-gram with the query doc. The gram is an equi-join
   key, so candidate generation is a hash join of the (tiny, broadcast)
   query-gram set against the corpus gram stream — never a scan of all
   (query, doc) pairs. Gram fan-out is df-bounded: a gram shared by d docs
   emits d candidates, and rare grams (the discriminative ones) have tiny
   d. A df cap on the gram table is the production guard against
   stop-grams; this corpus's 3-gram df tops out at 7, so the cap is not
   needed to bound the join here.
2. **dense rerank** (exact, precision): ONLY the candidates fetch their
   embeddings (an id-keyed gather join) and score exact cosine against the
   query embedding; per-query top-k by (rounded cosine, doc_id) window over
   the candidate set — corpus-size-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from prefect_flow_arc_indexer_spark.functions.textfns import (
    dd_tokens,
    dd_word_ngrams,
    tokens,
    word_ngrams,
)
from prefect_flow_arc_indexer_spark.functions.vectors import (
    cosine_similarity,
    dd_cosine_similarity,
)
from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table

RETR_N_QUERIES = 5  # doc_id < 5 play the query set (doc_id == vec_id)
RETR_GRAM = 3
RETR_TOP_K = 5


@register(
    "q_hybrid_retrieval",
    oracle=f"""WITH toks AS (
  SELECT doc_id, {dd_tokens("text")} AS tok
    FROM documents WHERE text IS NOT NULL
),
gs AS (
  SELECT DISTINCT doc_id, unnest({dd_word_ngrams("tok", RETR_GRAM)}) AS g
    FROM toks
),
cand AS (
  SELECT a.doc_id AS query_id, b.doc_id AS doc_id,
         count(*) AS n_shared_grams
    FROM gs a JOIN gs b ON b.g = a.g
   WHERE a.doc_id < {RETR_N_QUERIES} AND b.doc_id <> a.doc_id
   GROUP BY a.doc_id, b.doc_id
),
scored AS (
  SELECT c.query_id, c.doc_id, c.n_shared_grams,
         round({dd_cosine_similarity("eq.embedding", "ed.embedding")}, 6)
             AS cos_sim
    FROM cand c
    JOIN embeddings eq ON eq.vec_id = c.query_id
    JOIN embeddings ed ON ed.vec_id = c.doc_id
)
SELECT query_id, doc_id, n_shared_grams, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, doc_id ASC) AS rank
    FROM scored
) WHERE rank <= {RETR_TOP_K}
""",
    doc="hybrid retrieval: sparse 3-gram recall (broadcast query grams "
    "equi-joined against the corpus gram stream — candidates, not a "
    "corpus sweep) then dense exact-cosine rerank of ONLY the candidates "
    "(id-keyed embedding gather, per-query top-k window over tens of "
    "rows). The two-stage funnel that replaces both brute-force KNN and "
    "pure lexical search in a production RAG stack.",
)
def q_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    gs = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", tokens(F.col("text")).alias("tok"))
        .select(
            "doc_id", F.explode(word_ngrams(F.col("tok"), RETR_GRAM)).alias("g")
        )
        .distinct()
    )
    q_grams = gs.where(F.col("doc_id") < RETR_N_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("g").alias("qg")
    )
    cand = (
        gs.join(
            F.broadcast(q_grams),
            (F.col("g") == F.col("qg"))
            & (F.col("doc_id") != F.col("query_id")),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )
    e = load_table(spark, sf_dir, "embeddings", fan_out=True).select(
        "vec_id", "embedding"
    )
    scored = (
        e.join(
            F.broadcast(cand), F.col("vec_id") == F.col("doc_id")
        )
        .select(
            "query_id",
            "doc_id",
            "n_shared_grams",
            F.col("embedding").alias("d_emb"),
        )
        .join(
            e.select(
                F.col("vec_id").alias("_qv"), F.col("embedding").alias("q_emb")
            ),
            F.col("query_id") == F.col("_qv"),
        )
        .select(
            "query_id",
            "doc_id",
            "n_shared_grams",
            F.round(
                cosine_similarity(F.col("q_emb"), F.col("d_emb")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= RETR_TOP_K)
        .select("query_id", "doc_id", "n_shared_grams", "cos_sim", "rank")
    )


# --------------------------------------------------------------------------
# late-interaction retrieval (ColBERT-style MaxSim over sub-vectors)
# --------------------------------------------------------------------------
MAXSIM_SUB = 8  # token sub-vectors per embedding
MAXSIM_DSUB = 8  # dims per sub-vector
MAXSIM_QUERIES = 5
MAXSIM_TOP_K = 5


def _dd_maxsim(q: str, d: str) -> str:
    """Unrolled MaxSim: for each query sub-vector i, the max over doc
    sub-vectors j of the rounded 8-dim dot; the 8 maxes sum left-to-right.
    Unrolled in Python (like pq._dd_subdist) — no nested SQL lambdas."""

    def dot(i: int, j: int) -> str:
        return (
            f"round(list_aggregate(list_transform(generate_series(1, {MAXSIM_DSUB}),"
            f" k -> ({q}::DOUBLE[])[{i * MAXSIM_DSUB} + k]"
            f" * ({d}::DOUBLE[])[{j * MAXSIM_DSUB} + k]), 'sum'), 6)"
        )

    maxes = [
        "greatest(" + ", ".join(dot(i, j) for j in range(MAXSIM_SUB)) + ")"
        for i in range(MAXSIM_SUB)
    ]
    return f"round({' + '.join(maxes)}, 6)"


@register(
    "q_maxsim",
    oracle=f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
   WHERE vec_id < {MAXSIM_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_dd_maxsim("q.qe", "e.embedding")} AS maxsim
    FROM q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, maxsim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY maxsim DESC, neighbor_id ASC) AS rank
    FROM scored) WHERE rank <= {MAXSIM_TOP_K}
""",
    doc="late-interaction retrieval (ColBERT MaxSim, Khattab & Zaharia "
    f"2020): each embedding is read as {MAXSIM_SUB} token sub-vectors and "
    "a pair's score is sum over query tokens of the max dot against any "
    "doc token — the interaction granularity single-vector cosine loses. "
    "Scoring is a shuffle-free projection (broadcast query set x corpus "
    "scan, all folds inside codegen); only the per-query top-k "
    "aggregates. The 100 TB path mirrors ANN: a coarse candidate stage "
    "(LSH/IVF) bounds the MaxSim stage's input, exactly as "
    "q_hybrid_retrieval bounds its dense rerank. Per-sub dots round to "
    "6dp before the max and the 8 maxes add in fixed order, so the "
    "oracle is bit-exact.",
)
def q_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings", fan_out=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    q = e.where(F.col("vec_id") < MAXSIM_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("x").alias("qx")
    )

    def subs(col):
        return F.transform(
            F.sequence(F.lit(0), F.lit(MAXSIM_SUB - 1)),
            lambda s: F.slice(col, s * MAXSIM_DSUB + 1, MAXSIM_DSUB),
        )

    def dot8(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    maxsim = F.round(
        F.aggregate(
            F.transform(
                subs(F.col("qx")),
                lambda qi: F.array_max(
                    F.transform(
                        subs(F.col("x")),
                        lambda dj: F.round(dot8(qi, dj), 6),
                    )
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    scored = e.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        maxsim.alias("maxsim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("maxsim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= MAXSIM_TOP_K)
        .select("query_id", "neighbor_id", "maxsim", "rank")
    )
