"""Corpus-graph analytics and language-model scoring — two shapes the other
corpus modules don't cover: a multi-way SELF-join over a derived edge list
(triangle counting, the canonical distributed-graph aggregate) and a
corpus-statistics-broadcast scoring pass (unigram-LM surprisal, the cheap
perplexity proxy quality filters rank documents by).

Scale posture:
- the term graph is VOCABULARY-bounded, not corpus-bounded: edges are
  distinct within-doc term pairs generated row-locally (each doc's own token
  set, a<b ordering), so the corpus contributes one scan and the joins run
  over at most |vocab|^2 edge rows. The a<b<c orientation makes each
  triangle count exactly once and keeps the self-join acyclic.
- surprisal's model table is per-term counts (|vocab| rows) broadcast back
  over the token stream — the corpus is scanned twice (fit + score), never
  shuffled by doc; ln() runs on exact integer ratios and the per-doc mean
  rounds once at the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from prefect_flow_arc_indexer_spark.functions.textfns import dd_tokens, tokens
from prefect_flow_arc_indexer_spark.operators.corpus_quality import _TOKS_CTE
from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table


def _doc_term_pairs(docs: DataFrame) -> DataFrame:
    """Distinct (term_a < term_b) pairs per doc, generated row-locally from
    each doc's own token set — the corpus never shuffles by doc or token to
    build the graph. The token set is materialized as a column FIRST: a
    lambda that closes over the raw tokenize expression would re-evaluate
    the split+distinct+sort once per outer element (O(V) tokenizations per
    row); bound to an attribute it is computed once per row."""
    with_set = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.array_sort(F.array_distinct(tokens(F.col("text")))).alias("ts"),
    )
    ts = F.col("ts")
    pairs = F.filter(
        F.flatten(
            F.transform(
                ts,
                lambda a: F.transform(
                    ts, lambda b: F.when(a < b, F.struct(a.alias("a"), b.alias("b")))
                ),
            )
        ),
        lambda s: s.isNotNull(),
    )
    return with_set.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b")
    )


@register(
    "q_triangle_count",
    oracle=f"""WITH {_TOKS_CTE},
words AS (
  SELECT DISTINCT doc_id, t.term FROM toks, unnest(tok) AS t(term)
),
edges AS (
  SELECT DISTINCT a.term AS a, b.term AS b
    FROM words a JOIN words b ON a.doc_id = b.doc_id AND a.term < b.term
),
verts AS (
  SELECT count(DISTINCT v) AS n_vertices
    FROM (SELECT a AS v FROM edges UNION SELECT b FROM edges)
),
tri AS (
  SELECT count(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT verts.n_vertices,
       (SELECT count(*) FROM edges) AS n_edges,
       tri.n_triangles
  FROM verts, tri
""",
    doc="triangle count over the term co-occurrence graph: row-local pair "
    "generation -> vocab^2-bounded distinct edge list -> the canonical "
    "oriented 3-way self-join (a<b<c counts each triangle once); the "
    "graph side never exceeds |vocab|^2 rows regardless of corpus size",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    edges = (
        _doc_term_pairs(docs)
        .select(F.col("term_a").alias("a"), F.col("term_b").alias("b"))
        .distinct()
        # the vocab^2-bounded edge list is referenced five times below (the
        # 3-way join + the two count frames); checkpointing it locally cuts
        # five corpus scans down to one and truncates the explode lineage
        .localCheckpoint(eager=True)
    )
    e1 = edges
    e2 = edges.select(F.col("a").alias("b2a"), F.col("b").alias("b2b"))
    e3 = edges.select(F.col("a").alias("b3a"), F.col("b").alias("b3b"))
    tri = (
        e1.join(F.broadcast(e2), F.col("b") == F.col("b2a"))
        .join(
            F.broadcast(e3),
            (F.col("a") == F.col("b3a")) & (F.col("b2b") == F.col("b3b")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    verts = (
        edges.select(F.col("a").alias("v"))
        .union(edges.select("b"))
        .agg(F.count_distinct("v").alias("n_vertices"))
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return verts.join(F.broadcast(n_edges)).join(F.broadcast(tri)).select(
        "n_vertices", "n_edges", "n_triangles"
    )


@register(
    "q_unigram_surprisal",
    oracle=f"""WITH {_TOKS_CTE},
stream AS (
  SELECT doc_id, t.term FROM toks, unnest(tok) AS t(term)
),
freq AS (SELECT term, count(*) AS n FROM stream GROUP BY term),
tot AS (SELECT count(*) AS total FROM stream)
SELECT s.doc_id,
       count(*) AS n_tokens,
       round(avg(-ln(CAST(f.n AS DOUBLE) / tot.total)), 6) AS mean_surprisal
  FROM stream s JOIN freq f ON s.term = f.term, tot
 GROUP BY s.doc_id
""",
    doc="unigram-LM surprisal: fit per-term corpus frequencies (vocab-"
    "bounded agg), broadcast the model back over the token stream, score "
    "each doc by mean -ln p(token) — the cheap perplexity proxy used to "
    "rank documents for quality filtering; exact integer ratios into ln, "
    "one rounded mean per doc",
)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    stream = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    # the fitted model is vocab-bounded; checkpointing it means ONE fit scan
    # feeds both its broadcast and the total, so the corpus is read exactly
    # twice (fit + score)
    freq = (
        stream.groupBy("term")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = freq.agg(F.sum("n").alias("total"))
    surprisal = -F.log(F.col("n").cast("double") / F.col("total"))
    return (
        stream.join(F.broadcast(freq), "term")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(surprisal), 6).alias("mean_surprisal"),
        )
    )


def _dd_bigrams() -> str:
    from prefect_flow_arc_indexer_spark.functions.textfns import dd_word_ngrams

    return dd_word_ngrams("tok", 2)


@register(
    "q_bigram_surprisal",
    oracle=f"""WITH {_TOKS_CTE},
bgs AS (
  SELECT doc_id, t.b FROM toks, unnest({{bg}}) AS t(b)
),
model AS (SELECT b, count(*) AS n FROM bgs GROUP BY b),
starts AS (
  SELECT split_part(b, ' ', 1) AS w, CAST(sum(n) AS BIGINT) AS ns
    FROM model GROUP BY split_part(b, ' ', 1)
)
SELECT g.doc_id,
       count(*) AS n_bigrams,
       round(avg(-ln(CAST(m.n AS DOUBLE) / s.ns)), 6) AS mean_surprisal
  FROM bgs g
  JOIN model m ON g.b = m.b
  JOIN starts s ON s.w = split_part(g.b, ' ', 1)
 GROUP BY g.doc_id
""".format(bg=_dd_bigrams()),
    doc="bigram-LM surprisal: per-doc mean -ln p(w_i | w_(i-1)) under the "
    "corpus's own bigram model — p = c(bigram)/c(first-word continuations), "
    "both exact integer counts, the continuation totals derived from the "
    "(vocab^2-bounded) model table rather than a third corpus scan; the "
    "sharper perplexity proxy beside q_unigram_surprisal (fluent word "
    "ORDER scores low even when unigram frequencies are common)",
)
def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefect_flow_arc_indexer_spark.functions.textfns import word_ngrams

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    bgs = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.explode(word_ngrams(tokens(F.col("text")), 2)).alias("b"),
    )
    model = (
        bgs.groupBy("b")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)  # one fit scan feeds model + starts
    )
    starts = model.groupBy(
        F.substring_index("b", " ", 1).alias("w")
    ).agg(F.sum("n").cast("long").alias("ns"))
    surprisal = -F.log(F.col("n").cast("double") / F.col("ns"))
    return (
        bgs.join(F.broadcast(model), "b")
        .join(
            F.broadcast(starts),
            F.substring_index("b", " ", 1) == F.col("w"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(surprisal), 6).alias("mean_surprisal"),
        )
    )
