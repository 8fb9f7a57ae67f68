"""Vector-corpus operations round 5: filtered ANN, hard-negative mining,
embedding hygiene, and MMR diversification — the retrieval/contrastive-
training surface on top of the q_knn_* family.

- q_filtered_knn: top-k cosine under a metadata predicate (filtered vector
  search — the production shape where ANN composes with an access filter);
- q_semihard_negatives: per-query SEMI-HARD negatives (most-similar
  vectors of a DIFFERENT label below a near-positive cap, Schroff et al.
  '15) — the banded refinement of the existing q_hard_negatives miner;
- q_embedding_audit: per-label embedding hygiene (zero vectors, norm
  spread) — the go/no-go check before any similarity pipeline;
- q_mmr_rerank: maximal-marginal-relevance diversification of the top-k
  pool (rows-only: the greedy argmax is iterative; exactness is pinned by
  a pure-Python replay test);
- q_cluster_profile: the documents x embeddings id join — per-(label,
  lang) cluster composition with exact integer shares;
- q_knn_classify: kNN majority-vote classification (retrieval-augmented
  labeling) with an engine-stable vote tie-break chain.

Scale notes: every query keeps the corpus side streaming (the 5-query set
is broadcast; candidate pools are per-query bounded); the audit is one
map-side-combinable rollup. Filtered search at 100 TB composes the same
predicate with the LSH/IVF candidate generation (filter first when
selective — it pushes to the scan — else over-fetch then post-filter).
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from prefect_flow_arc_indexer_spark.functions.vectors import (
    cosine_similarity,
    dd_cosine_similarity,
    norm,
)
from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table

N_QUERIES = 5  # vec_id < 5 play the query set (same convention as q_knn_*)
TOP_K = 5
FILTER_MOD = 3  # metadata predicate: label % FILTER_MOD == 0 is "allowed"
HN_CAP_MICRO = 950_000  # semi-hard band: cos < 0.95 excludes near-positives
MMR_POOL = 20
MMR_K = 5
MMR_LAMBDA = 0.7


@register(
    "q_filtered_knn",
    oracle=f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
         round({dd_cosine_similarity("q.q_emb", "e.embedding")}, 6) AS cos_sim
    FROM q JOIN embeddings e
      ON e.vec_id <> q.query_id AND e.label % {FILTER_MOD} = 0
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, label, cos_sim, rank
  FROM ranked WHERE rank <= {TOP_K}
""",
    doc="filtered vector search: top-k cosine restricted to corpus rows "
    f"passing a metadata predicate (label % {FILTER_MOD} = 0 plays the "
    "allowed-source/ACL filter) — the production retrieval shape ANN "
    "papers call filtered/constrained search. The predicate lands in the "
    "corpus SCAN (PushedFilters), the 5-query set is broadcast, and the "
    "filtered corpus streams once. At 100 TB this composes with IVF/LSH: "
    "selective predicates filter before candidate generation (scan "
    "pruning), broad ones over-fetch the candidate pool and post-filter "
    "— both keep the corpus side unbroadcast and uncollected.",
)
def q_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings", fan_out=True)
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    allowed = e.where(F.col("label") % FILTER_MOD == 0).select(
        F.col("vec_id").alias("neighbor_id"), "label", "embedding"
    )
    scored = allowed.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        "label",
        F.round(
            cosine_similarity(F.col("q_emb"), F.col("embedding")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "label", "cos_sim", "rank")
    )


@register(
    "q_semihard_negatives",
    oracle=f"""WITH q AS (
  SELECT vec_id AS query_id, label AS q_label, embedding AS q_emb
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, q.q_label, e.vec_id AS neighbor_id,
         e.label AS neg_label,
         CAST(round({dd_cosine_similarity("q.q_emb", "e.embedding")}
                    * 1000000) AS BIGINT) AS cos_micro
    FROM q JOIN embeddings e
      ON e.label <> q.q_label AND e.vec_id <> q.query_id
),
banded AS (SELECT * FROM scored WHERE cos_micro < {HN_CAP_MICRO}),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_micro DESC, neighbor_id ASC)
              AS rank
    FROM banded
)
SELECT query_id, q_label, neighbor_id, neg_label, cos_micro, rank
  FROM ranked WHERE rank <= {TOP_K}
""",
    doc="semi-hard negative mining (FaceNet band): per query vector, "
    "the most-similar corpus vectors of a DIFFERENT label, capped below "
    f"cos {HN_CAP_MICRO / 1e6:g} (the semi-hard band — near-positives "
    "above the cap are likelier label noise than useful negatives, the "
    "standard triplet-mining guard). Similarities are 1e-6-quantized to "
    "integers BEFORE banding and ranking, so the band edge and the "
    "ordering cannot drift between engines. Same scale shape as "
    "q_filtered_knn: broadcast query set, label predicate on the scan, "
    "per-query bounded top-k.",
)
def q_semihard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings", fan_out=True)
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neg_label"),
        "embedding",
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("neg_label") != F.col("q_label"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "q_label",
        "neighbor_id",
        "neg_label",
        F.round(
            cosine_similarity(F.col("q_emb"), F.col("embedding")) * 1_000_000
        )
        .cast("bigint")
        .alias("cos_micro"),
    )
    banded = scored.where(F.col("cos_micro") < HN_CAP_MICRO)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_micro").desc(), F.col("neighbor_id").asc()
    )
    return (
        banded.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id", "q_label", "neighbor_id", "neg_label", "cos_micro",
            "rank",
        )
    )


@register(
    "q_embedding_audit",
    oracle="""WITH per_vec AS (
  SELECT label,
         CAST(round(sqrt(list_aggregate(
             list_transform(embedding::DOUBLE[], x -> x * x), 'sum'))
             * 1000000) AS BIGINT) AS norm_micro
    FROM embeddings
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN norm_micro = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero,
       CAST(min(norm_micro) AS BIGINT) AS min_norm_micro,
       CAST(max(norm_micro) AS BIGINT) AS max_norm_micro,
       CAST(sum(norm_micro) // count(*) AS BIGINT) AS mean_norm_micro
  FROM per_vec GROUP BY label
""",
    doc="embedding hygiene audit per label: vector counts, zero-norm "
    "vectors (poison for cosine — they yield NULL/NaN similarities), and "
    "the L2-norm spread (min/max/floor-mean in 1e-6 units; norms are "
    "quantized to integers scan-side so the rollup is exact-integer and "
    "order-proof). The first gate any embedding pipeline runs: a "
    "norm-collapsed or zero-heavy label poisons every downstream "
    "similarity. One map-side-combinable aggregate keyed by label "
    "(values-bounded); the vectors themselves never shuffle.",
)
def q_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings", fan_out=True)
    per_vec = e.select(
        "label",
        F.round(norm(F.col("embedding")) * 1_000_000)
        .cast("bigint")
        .alias("norm_micro"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum((F.col("norm_micro") == 0).cast("int"))
        .cast("bigint")
        .alias("n_zero"),
        F.min("norm_micro").cast("bigint").alias("min_norm_micro"),
        F.max("norm_micro").cast("bigint").alias("max_norm_micro"),
        F.expr("sum(norm_micro) div count(1)")
        .cast("bigint")
        .alias("mean_norm_micro"),
    )


def mmr_select(cands: list[tuple[int, float, list[float]]]) -> list[tuple[int, int, float]]:
    """Pure-Python MMR greedy over one query's candidate pool (shared by
    the Arrow worker and the replay test — float64 arithmetic, ties to the
    earlier candidate in (-relevance, id) order). Returns
    [(neighbor_id, mmr_rank, mmr_score)]."""
    ordered = sorted(cands, key=lambda t: (-t[1], t[0]))
    selected: list[tuple[int, int, float]] = []
    chosen_vecs: list[list[float]] = []
    remaining = list(ordered)
    while remaining and len(selected) < MMR_K:
        best_i, best_score = 0, None
        for i, (nid, rel, vec) in enumerate(remaining):
            if chosen_vecs:
                red = max(_cos(vec, cv) for cv in chosen_vecs)
            else:
                red = 0.0
            score = MMR_LAMBDA * rel - (1.0 - MMR_LAMBDA) * red
            if best_score is None or score > best_score:
                best_i, best_score = i, score
        nid, rel, vec = remaining.pop(best_i)
        chosen_vecs.append(vec)
        selected.append((nid, len(selected) + 1, round(best_score, 6)))
    return selected


def _cos(a, b) -> float:
    dot = sum(float(x) * float(y) for x, y in zip(a, b))
    na = sum(float(x) * float(x) for x in a) ** 0.5
    nb = sum(float(y) * float(y) for y in b) ** 0.5
    return dot / (na * nb) if na > 0 and nb > 0 else 0.0


MMR_SCHEMA = (
    "query_id long, neighbor_id long, mmr_rank int, mmr_score double"
)


@register(
    "q_mmr_rerank",
    # Full DuckDB replay of the greedy loop (r7 — was rows-only): a
    # recursive CTE carries each query's selected (ids, vectors) state.
    # Round 1 is the pool's rank-1 row (empty selected set => score is
    # 0.7*rel, already the pool order). Later rounds replicate the Python
    # worker exactly: score = 0.7*rel - 0.3*max(cos to selected), max as a
    # left-fold greatest (value-identical to Python's max()), argmax with
    # Python's first-strict-max tie semantics via ORDER BY score DESC,
    # rel DESC, neighbor_id ASC LIMIT 1, and only the STORED score is
    # rounded (selection compares raw doubles, like the worker).
    # Exactness is additionally pinned by the pure-Python replay in
    # test_vector_ops.
    oracle=f"""WITH RECURSIVE q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {dd_cosine_similarity("q.q_emb", "e.embedding")} AS rel,
         e.embedding::DOUBLE[] AS x
    FROM q JOIN embeddings e ON e.vec_id <> q.query_id
),
pool AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY rel DESC, neighbor_id ASC) AS rk
      FROM scored) t
   WHERE rk <= {MMR_POOL}
),
steps AS (
  SELECT query_id, neighbor_id, 1 AS mmr_rank,
         round({MMR_LAMBDA} * rel, 6) AS mmr_score,
         [x] AS sel_vecs, [neighbor_id] AS sel_ids
    FROM pool WHERE rk = 1
  UNION ALL
  SELECT s.query_id, f.neighbor_id, s.mmr_rank + 1,
         round(f.score, 6) AS mmr_score,
         list_append(s.sel_vecs, f.x) AS sel_vecs,
         list_append(s.sel_ids, f.neighbor_id) AS sel_ids
    FROM steps s, LATERAL (
      SELECT p.neighbor_id, p.x, p.rel,
             -- cos(p.x, cv) in the list_zip form: DuckDB 1.0 cannot bind
             -- an outer lambda var inside a NESTED lambda within a
             -- recursive lateral, so cv appears only at the outer level;
             -- dot and norms are left folds in array order, matching the
             -- Python worker's sequential sums exactly
             {MMR_LAMBDA} * p.rel - {1 - MMR_LAMBDA:g} * list_reduce(
                 list_transform(s.sel_vecs, cv ->
                     list_reduce(list_transform(list_zip(p.x, cv),
                                                pr -> pr[1] * pr[2]),
                                 (a, b) -> a + b)
                     / (sqrt(list_reduce(list_transform(p.x, v -> v * v),
                                         (a, b) -> a + b))
                        * sqrt(list_reduce(list_transform(cv, v -> v * v),
                                           (a, b) -> a + b)))),
                 (a, b) -> greatest(a, b)) AS score
        FROM pool p
       WHERE p.query_id = s.query_id
         AND NOT list_contains(s.sel_ids, p.neighbor_id)
       ORDER BY score DESC, p.rel DESC, p.neighbor_id ASC
       LIMIT 1
    ) f
   WHERE s.mmr_rank < {MMR_K}
)
SELECT query_id, neighbor_id, mmr_rank, mmr_score FROM steps
""",
    doc="maximal-marginal-relevance diversification: each query's "
    f"top-{MMR_POOL} cosine pool greedily re-ranked by "
    f"{MMR_LAMBDA}*relevance - {1 - MMR_LAMBDA:g}*max-redundancy-to-"
    f"selected, keeping {MMR_K} (Carbonell & Goldstein '98 — the "
    "standard retrieval de-duplication step between ANN and a RAG "
    "context window). The corpus contributes ONE broadcast-query brute "
    "scan for the pools; the greedy loop runs per query over its "
    f"{MMR_POOL}-row pool inside applyInPandas (O(K*pool) sims on a "
    "64-dim pool — microseconds), so the iterative part never sees "
    "corpus-sized data. Ties break to the earlier candidate in "
    "(-relevance, id) order, making the greedy path deterministic.",
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings", fan_out=True)
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    scored = c.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("q_emb"), F.col("embedding")).alias("rel"),
        "embedding",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("neighbor_id").asc()
    )
    pool = scored.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= MMR_POOL
    )

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        cands = [
            (int(n), float(r), list(v))
            for n, r, v in zip(
                pdf["neighbor_id"], pdf["rel"], pdf["embedding"]
            )
        ]
        rows = mmr_select(cands)
        return pd.DataFrame(
            {
                "query_id": [qid] * len(rows),
                "neighbor_id": [n for n, _, _ in rows],
                "mmr_rank": [k for _, k, _ in rows],
                "mmr_score": [s for _, _, s in rows],
            }
        )

    return pool.groupBy("query_id").applyInPandas(_mmr, schema=MMR_SCHEMA)


# --------------------------------------------------------------------------
# cross-modal: documents JOIN embeddings (vec_id is the doc's vector)
# --------------------------------------------------------------------------
@register(
    "q_cluster_profile",
    oracle=f"""WITH joined AS (
  SELECT e.label, d.lang, d.n_chars,
         CASE WHEN d.text IS NULL THEN 0 ELSE 1 END AS has_text
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
),
per AS (
  SELECT label, lang, count(*) AS n,
         CAST(sum(n_chars) AS BIGINT) AS chars,
         CAST(sum(has_text) AS BIGINT) AS n_text
    FROM joined GROUP BY label, lang
),
tot AS (SELECT label, CAST(sum(n) AS BIGINT) AS n_label FROM per GROUP BY label)
SELECT p.label, p.lang,
       CAST(p.n AS BIGINT) AS n_docs,
       p.chars AS total_chars,
       p.n_text AS n_with_text,
       CAST((1000000 * p.n) // t.n_label AS BIGINT) AS share_micro
  FROM per p JOIN tot t ON t.label = p.label
""",
    doc="semantic-cluster profiling (the documents x embeddings join): for "
    "each embedding label (playing the cluster id a k-means/IVF pass "
    "assigns), the language composition, char mass, and non-null-text "
    "share of its member documents — the inspection table a curation "
    "team reads to decide which semantic clusters to up/down-sample. "
    "Plan: ONE equi-join on the id (both sides narrow projections, "
    "corpus streams), then a (label, lang) values-bounded rollup and an "
    "integer-exact share against the per-label total. At 100 TB the "
    "join is the standard co-partitioned id join (bucket both tables on "
    "the id and it is shuffle-free).",
)
def q_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings", fan_out=True).select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    d = load_table(spark, sf_dir, "documents", fan_out=True).select(
        "doc_id",
        "lang",
        "n_chars",
        F.col("text").isNotNull().cast("int").alias("has_text"),
    )
    per = (
        e.join(d, "doc_id")
        .groupBy("label", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("bigint").alias("chars"),
            F.sum("has_text").cast("bigint").alias("n_text"),
        )
    )
    tot = per.groupBy("label").agg(
        F.sum("n").cast("bigint").alias("n_label")
    )
    return per.join(tot, "label").select(
        "label",
        "lang",
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("chars").alias("total_chars"),
        F.col("n_text").alias("n_with_text"),
        F.expr("(1000000 * n) div n_label").cast("bigint").alias(
            "share_micro"
        ),
    )


KNN_VOTE_K = 7


@register(
    "q_knn_classify",
    oracle=f"""WITH q AS (
  SELECT vec_id AS query_id, label AS true_label, embedding AS q_emb
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, q.true_label, e.label AS n_label,
         CAST(round({dd_cosine_similarity("q.q_emb", "e.embedding")}
                    * 1000000) AS BIGINT) AS cos_micro,
         e.vec_id AS neighbor_id
    FROM q JOIN embeddings e ON e.vec_id <> q.query_id
),
topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_micro DESC, neighbor_id ASC)
                 AS rk
      FROM scored) WHERE rk <= {KNN_VOTE_K}
),
votes AS (
  SELECT query_id, true_label, n_label,
         CAST(count(*) AS BIGINT) AS n_votes,
         CAST(sum(cos_micro) AS BIGINT) AS sum_cos_micro
    FROM topk GROUP BY query_id, true_label, n_label
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY n_votes DESC, sum_cos_micro DESC,
                                        n_label ASC) AS vr
    FROM votes
)
SELECT query_id, true_label, n_label AS predicted_label, n_votes,
       sum_cos_micro,
       CASE WHEN n_label = true_label THEN 1 ELSE 0 END AS correct
  FROM best WHERE vr = 1
""",
    doc=f"kNN majority-vote classification (retrieval-augmented labeling): "
    f"each query vector takes its {KNN_VOTE_K} nearest neighbors' labels, "
    "votes resolved by (count, total 1e-6-quantized cosine, label) — an "
    "engine-stable tie-break chain — and the prediction is scored "
    "against the query's own label. The label-propagation primitive for "
    "weakly-supervised data annotation. Same broadcast-query/streaming-"
    "corpus shape as q_knn_cosine; the vote rollup is per-query bounded "
    f"({KNN_VOTE_K} rows).",
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings", fan_out=True)
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("q_emb"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        "embedding",
    )
    scored = c.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "true_label",
        "n_label",
        "neighbor_id",
        F.round(
            cosine_similarity(F.col("q_emb"), F.col("embedding")) * 1_000_000
        )
        .cast("bigint")
        .alias("cos_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_micro").desc(), F.col("neighbor_id").asc()
    )
    topk = scored.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= KNN_VOTE_K
    )
    votes = topk.groupBy("query_id", "true_label", "n_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_votes"),
        F.sum("cos_micro").cast("bigint").alias("sum_cos_micro"),
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(),
        F.col("sum_cos_micro").desc(),
        F.col("n_label").asc(),
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("n_label").alias("predicted_label"),
            "n_votes",
            "sum_cos_micro",
            (F.col("n_label") == F.col("true_label"))
            .cast("int")
            .alias("correct"),
        )
    )
