"""Text-analysis operators over ``documents`` — language ID, quality
scoring, token counting, fingerprinting (training-data-pipeline extension
surface; ABSENT in the reference, which never inspects document text).

Everything is built-in column expressions over token arrays — no Python UDFs.
Per-doc work is embarrassingly parallel (narrow, no shuffle), which is the
shape you want at 100 TB: these run scan-side at wire speed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from prefect_flow_arc_indexer_spark.functions.hashing import (
    dd_stable_hash,
    stable_hash,
)
from prefect_flow_arc_indexer_spark.functions.textfns import (
    STOPWORDS,
    TOKEN_REGEX,
    dd_regex_token_count,
    dd_tokens,
    regex_token_count,
    tokens,
)
from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table

FINGERPRINT_GRAM = 8
FINGERPRINT_STRIDE = 4


def _stopword_hits(tok: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens (with multiplicity) in a stopword list."""
    return F.aggregate(
        tok,
        F.lit(0),
        lambda acc, t: acc + F.when(t.isin(*words), 1).otherwise(0),
    )


def _dd_stopword_hits(tok_expr: str, words: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    return (
        f"coalesce(list_aggregate(list_transform({tok_expr}, "
        f"t -> CASE WHEN t IN ({in_list}) THEN 1 ELSE 0 END), 'sum'), 0)"
    )


# --------------------------------------------------------------------------
# token counting
# --------------------------------------------------------------------------
@register(
    "q_token_count",
    oracle=f"""WITH toks AS (
  SELECT doc_id, {dd_tokens("text")} AS tok FROM documents
)
SELECT d.doc_id,
       len(t.tok) AS ws_tokens,
       {dd_regex_token_count("d.text")} AS bpe_tokens
  FROM documents d JOIN toks t ON d.doc_id = t.doc_id
""",
    doc="token counting: whitespace tokens + BPE-ish regex tokens "
    "(alnum runs / single symbols)",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("ws_tokens"),
        regex_token_count(F.col("text")).alias("bpe_tokens"),
    )


# --------------------------------------------------------------------------
# quality scoring
# --------------------------------------------------------------------------
_EN = STOPWORDS["en"]


@register(
    "q_text_quality",
    oracle=f"""WITH toks AS (
  SELECT doc_id, text, coalesce({dd_tokens("text")}, []) AS tok FROM documents
)
SELECT doc_id,
       len(tok) AS n_tokens,
       round(CAST(coalesce(list_aggregate(list_transform(tok, t -> length(t)), 'sum'), 0) AS DOUBLE)
             / greatest(len(tok), 1), 6) AS avg_token_len,
       round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1), 6) AS punct_ratio,
       round(CAST({_dd_stopword_hits("tok", _EN)} AS DOUBLE)
             / greatest(len(tok), 1), 6) AS stopword_ratio,
       round(least(len(tok) / 100.0, 1.0)
             * (1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                      / greatest(length(text), 1))
             * (0.5 + 0.5 * CAST({_dd_stopword_hits("tok", _EN)} AS DOUBLE)
                            / greatest(len(tok), 1)), 6) AS quality_score
  FROM toks
""",
    doc="quality scoring: length/punctuation/stopword-ratio heuristics "
    "combined into one bounded score",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # project the token array once — every expression below references it,
    # and an inline tokens(text) would be re-split per reference. NULL text
    # canonicalizes to an EMPTY array on both engines: Spark size(NULL)=-1
    # vs DuckDB len(NULL)=NULL would silently split the hash otherwise
    # (same family as the round-1 q_lang_id finding).
    docs = load_table(spark, sf_dir, "documents", fan_out=True).withColumn(
        "tok",
        F.coalesce(tokens(F.col("text")), F.array().cast("array<string>")),
    )
    tok = F.col("tok")
    n_tokens = F.size(tok)
    denom_tok = F.greatest(n_tokens, F.lit(1))
    char_sum = F.aggregate(
        F.transform(tok, lambda t: F.length(t)), F.lit(0), lambda a, v: a + v
    )
    punct = F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", "")).cast(
        "double"
    ) / F.greatest(F.length("text"), F.lit(1))
    stop_ratio = _stopword_hits(tok, _EN).cast("double") / denom_tok
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        * (F.lit(1.0) - punct)
        * (F.lit(0.5) + F.lit(0.5) * stop_ratio)
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(char_sum.cast("double") / denom_tok, 6).alias("avg_token_len"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


# --------------------------------------------------------------------------
# language ID
# --------------------------------------------------------------------------
def _dd_lang_id_sql() -> str:
    hits = ",\n       ".join(
        f"{_dd_stopword_hits('tok', ws)} AS hits_{lang}"
        for lang, ws in STOPWORDS.items()
    )
    langs = sorted(STOPWORDS)  # tie-break: alphabetical
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN hits_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""WITH toks AS (
  SELECT doc_id, {dd_tokens("text")} AS tok FROM documents
),
scored AS (
  SELECT doc_id,
       {hits}
    FROM toks
)
SELECT doc_id, {case} AS predicted_lang, CAST({best} AS BIGINT) AS best_hits
  FROM scored
"""


def lang_id_frame(docs: DataFrame, extra: list[Column]) -> DataFrame:
    """(extra..., predicted_lang, best_hits): the stopword-argmax language
    ID computed scan-side over ``docs`` — the shared row-local core of
    q_lang_id and q_lang_confusion (the r11 quality_logistic_cols fusion
    discipline: composition cannot drift from the component).

    The hit counts are projected as REAL columns before the argmax so each
    per-language aggregate fold evaluates once (inlining them into
    greatest + the CASE chain would re-evaluate every fold 2-3x via
    project collapsing — the q_minhash_verified r11 lesson)."""
    d = docs.withColumn("tok", tokens(F.col("text")))
    tok = F.col("tok")
    # NULL text -> NULL token array -> F.aggregate returns NULL, while the
    # DuckDB oracle coalesces the list_aggregate sum to 0 and predicts the
    # first language alphabetically. Coalesce to 0 so both engines
    # canonicalize NULL-text rows identically (ADVICE r1, medium).
    scored = d.select(
        *extra,
        *[
            F.coalesce(_stopword_hits(tok, ws), F.lit(0)).alias(f"hits_{lang}")
            for lang, ws in STOPWORDS.items()
        ],
    )
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred: Column = reduce(
        lambda acc, lang: acc.when(F.col(f"hits_{lang}") == best, lang),
        langs[1:],
        F.when(F.col(f"hits_{langs[0]}") == best, langs[0]),
    )
    keep = [f.name for f in scored.schema.fields if not f.name.startswith("hits_")]
    return scored.select(
        *keep, pred.alias("predicted_lang"), best.alias("best_hits")
    )


@register(
    "q_lang_id",
    oracle=_dd_lang_id_sql(),
    doc="language ID: stopword-hit argmax over per-language lists "
    "(n-gram-heuristic family); alphabetical tie-break",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return lang_id_frame(docs, [F.col("doc_id")])


# --------------------------------------------------------------------------
# document fingerprinting (rolling-hash family)
# --------------------------------------------------------------------------
@register(
    "q_doc_fingerprint",
    oracle=f"""SELECT doc_id,
       coalesce(list_aggregate(list_transform(
           generate_series(1, greatest(length(text) - {FINGERPRINT_GRAM - 1}, 1), {FINGERPRINT_STRIDE}),
           i -> {dd_stable_hash(f"substr(text, i, {FINGERPRINT_GRAM})")}), 'min'),
         {dd_stable_hash("text")}) AS fingerprint
  FROM documents
""",
    doc="document fingerprint: min over strided char-8-gram hashes "
    "(winnowing-style rolling-hash selection)",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    positions = F.sequence(
        F.lit(1),
        F.greatest(F.length("text") - F.lit(FINGERPRINT_GRAM - 1), F.lit(1)),
        F.lit(FINGERPRINT_STRIDE),
    )
    gram_hashes = F.transform(
        positions,
        lambda i: stable_hash(
            F.substring(F.col("text"), i, F.lit(FINGERPRINT_GRAM))
        ),
    )
    fp = F.coalesce(
        F.array_min(gram_hashes), stable_hash(F.col("text"))
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


# --------------------------------------------------------------------------
# character-entropy quality signal
# --------------------------------------------------------------------------
def _clog2(cnt: Column) -> Column:
    """c * log2(c) for a run count, 0 for the (initial) empty run."""
    return F.when(cnt > 0.0, cnt * F.log2(cnt)).otherwise(F.lit(0.0))


def char_entropy_col(text: Column) -> Column:
    """Row-local rounded character entropy of a (non-null, non-empty)
    text column — shared by q_char_entropy and the fused single-scan
    q_quality_ensemble so the signal cannot drift.

    split on the empty pattern yields every character INCLUDING line
    terminators with no trailing empty element ('abc' -> [a,b,c]) — the
    same char multiset as the oracle's regexp_extract_all('[\\s\\S]')
    (kept regex-form there because DuckDB lacks the empty-split idiom),
    without running a regex engine per character: the regex form
    measured ~3.5x split's per-row cost at sf1, the whole gap behind
    this query's r11 sf1-ratio flag. Callers filter length>0 to keep
    split('','') = [''] out of the fold.

    One O(n log n) pass per row: sort the chars, then fold the sorted
    array once, closing each run with its c*log2(c) term as the char
    changes. The per-distinct-char recount (transform over
    array_distinct with a nested filter) is O(distinct * n) per row —
    measured 4.2s vs sub-second at sf0.1 for the same output.
    State: (prev char, current run length, accumulated sum)."""
    chars = F.split(text, "")
    run_sum = F.aggregate(
        F.array_sort(chars),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0.0).alias("cnt"),
            F.lit(0.0).alias("acc"),
        ),
        lambda st, c: F.struct(
            c.alias("prev"),
            F.when(st.prev.isNotNull() & (c == st.prev), st.cnt + 1.0)
            .otherwise(F.lit(1.0))
            .alias("cnt"),
            F.when(st.prev.isNotNull() & (c == st.prev), st.acc)
            .otherwise(st.acc + _clog2(st.cnt))
            .alias("acc"),
        ),
        lambda st: st.acc + _clog2(st.cnt),  # close the final run
    )
    n = F.length(text).cast("double")
    return F.round(F.log2(n) - run_sum / n, 6)



def _char_entropy_kernel():
    """mapInArrow factory over (doc_id, text): rounded character entropy
    per row (r12, guide §4.2). The JVM form splits the text into a char
    ARRAY, sorts it and folds a struct accumulator per row — object-heavy
    work that made this the sf1 ratio-gate's worst unwaived entry
    (3.7 s at sf1 for what is one Counter per row). The kernel replicates
    the arithmetic: run counts via Counter, c*log2(c) terms accumulated
    in sorted-char order (the sorted fold's order), log2 as
    StrictMath.log(x)/log(2) (probed closest to Catalyst's Log2; residual
    last-ulp libm drift is exactly what the 6-dp rounding absorbs between
    Spark and DuckDB already — equality re-verified against the oracle at
    every SF incl. sf1), and the HALF_UP rounding replica."""
    import math
    from collections import Counter

    import numpy as np
    import pyarrow as pa

    from prefect_flow_arc_indexer_spark.functions.rounding import (
        spark_round_half_up,
    )

    ln2 = math.log(2.0)
    log = math.log

    def run(it):
        for batch in it:
            texts = batch.column(1).to_pylist()
            if not texts:
                continue
            out = np.empty(len(texts), dtype=np.float64)
            for i, t in enumerate(texts):
                n = float(len(t))
                cnt = Counter(t)
                acc = 0.0
                for ch in sorted(cnt):
                    c = float(cnt[ch])
                    acc = acc + c * (log(c) / ln2)
                out[i] = (log(n) / ln2) - acc / n
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(spark_round_half_up(out, 6))],
                ["doc_id", "char_entropy"],
            )

    return run


@register(
    "q_char_entropy",
    oracle="""WITH chars AS (
  SELECT doc_id, length(text) AS n,
         list_transform(
             list_distinct(regexp_extract_all(text, '[\s\S]')),
             c -> len(regexp_extract_all(text, regexp_escape(c)))
         ) AS counts
    FROM documents
   WHERE text IS NOT NULL AND length(text) > 0
)
SELECT doc_id,
       round(
         log2(n) - list_aggregate(
             list_transform(counts, c -> c * log2(c)), 'sum') / n,
         6) AS char_entropy
  FROM chars
""",
    doc="character-entropy quality score: H = log2(n) - sum(c*log2(c))/n "
    "over per-row character counts — computed ROW-LOCALLY (array ops on "
    "the row's own chars, no explode/shuffle of character streams), so "
    "100 TB cost is scan throughput; low-entropy docs (boilerplate, "
    "repeated padding) are the standard corpus-filter target. Rounded 6dp: "
    "log2 differs in the last ulp across engine libm implementations",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True).where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    # r12: Arrow kernel (see _char_entropy_kernel). char_entropy_col stays
    # the JVM form for the fused q_quality_ensemble projection; the two
    # are pinned against each other by tests/test_char_entropy_kernel.py
    # and both against the same oracle CTE.
    return docs.select("doc_id", "text").mapInArrow(
        _char_entropy_kernel(), "doc_id bigint, char_entropy double"
    )


# --------------------------------------------------------------------------
# trained-classifier inference inside the plan (fixed-weight logistic)
# --------------------------------------------------------------------------
# Published weights of the (stand-in) quality classifier: a logistic
# regression over three cheap features. In production these come from a
# model registry; freezing them as constants is exactly how fasttext-style
# quality classifiers ship into data pipelines.
LOGI_W0 = -2.0  # bias
LOGI_W_LEN = 0.85  # ln(1 + n_tokens)
LOGI_W_PUNCT = -3.0  # punctuation ratio
LOGI_W_STOP = 2.5  # stopword ratio


def quality_logistic_cols(tok: Column, text: Column) -> dict[str, Column]:
    """Row-local expressions of the fixed-weight logistic quality
    classifier (features in integer micro-units, exact bigint linear
    combination, rounded sigmoid) — the single source of the model,
    shared by q_quality_logistic and the fused single-scan composers
    (q_ece_calibration, q_conformal_threshold) so scores cannot drift."""
    n_tok = F.size(tok)
    punct = F.length(
        F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    ).cast("double") / F.greatest(F.length(text), F.lit(1))
    stop_hits = F.size(F.filter(tok, lambda t: t.isin(*_EN)))

    def micros(c: Column) -> Column:
        return F.round(c * 1_000_000).cast("bigint")

    u_len = micros(F.log(1 + n_tok))
    u_punct = micros(punct)
    u_stop = micros(stop_hits.cast("double") / F.greatest(n_tok, F.lit(1)))
    z = (
        F.lit(int(LOGI_W0 * 100)) * F.lit(1_000_000).cast("bigint")
        + F.lit(int(LOGI_W_LEN * 100)) * u_len
        + F.lit(int(LOGI_W_PUNCT * 100))
        * F.coalesce(u_punct, F.lit(0).cast("bigint"))
        + F.lit(int(LOGI_W_STOP * 100)) * u_stop
    ).cast("bigint")
    p = F.round(1.0 / (1.0 + F.exp(-(z / F.lit(100_000_000.0)))), 6)
    return {
        "u_len": u_len,
        "u_punct": u_punct,
        "u_stop": u_stop,
        "z": z,
        "p": p,
    }


@register(
    "q_quality_logistic",
    oracle=f"""WITH toks AS (
  SELECT doc_id, text, coalesce({dd_tokens("text")}, []) AS tok FROM documents
),
feats AS (
  SELECT doc_id,
         CAST(round(ln(1 + len(tok)) * 1000000) AS BIGINT) AS u_len,
         CAST(round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) * 1000000) AS BIGINT) AS u_punct,
         CAST(round(CAST({_dd_stopword_hits("tok", _EN)} AS DOUBLE)
               / greatest(len(tok), 1) * 1000000) AS BIGINT) AS u_stop
    FROM toks
),
scored AS (
  SELECT doc_id, u_len, u_punct, u_stop,
         CAST({int(LOGI_W0 * 100)} * 1000000
              + {int(LOGI_W_LEN * 100)} * u_len
              + {int(LOGI_W_PUNCT * 100)} * coalesce(u_punct, 0)
              + {int(LOGI_W_STOP * 100)} * u_stop AS BIGINT) AS z_centi_micro
    FROM feats
)
SELECT doc_id,
       u_len / 1000000.0 AS f_len,
       u_punct / 1000000.0 AS f_punct,
       u_stop / 1000000.0 AS f_stop,
       z_centi_micro,
       round(1.0 / (1.0 + exp(-(z_centi_micro / 100000000.0))), 6) AS p_quality,
       round(1.0 / (1.0 + exp(-(z_centi_micro / 100000000.0))), 6) >= 0.5 AS keep
  FROM scored
""",
    doc="trained-classifier inference inside the plan: a fixed-weight "
    "logistic quality model (the fasttext-style classifier every corpus "
    "pipeline applies at ingest) evaluated as pure column expressions — "
    "features, linear combination, sigmoid, threshold — entirely inside "
    "whole-stage codegen. No UDF, no model server round-trip, no shuffle: "
    "scoring cost is scan cost, the only acceptable price at 100 TB. "
    "Engine parity discipline: features are quantized to integer "
    "micro-units and the weights scaled to integers (x100), so the whole "
    "linear combination z is EXACT bigint arithmetic — rounding a float z "
    "at 6dp hit exact half-boundaries where Spark and DuckDB round "
    "opposite ways (surfaced by the sf0.1 sweep); the sigmoid then runs "
    "on the one deterministic division.",
)
def q_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True).withColumn(
        "tok",
        F.coalesce(tokens(F.col("text")), F.array().cast("array<string>")),
    )
    q = quality_logistic_cols(F.col("tok"), F.col("text"))
    return docs.select(
        "doc_id",
        (q["u_len"] / 1_000_000.0).alias("f_len"),
        (q["u_punct"] / 1_000_000.0).alias("f_punct"),
        (q["u_stop"] / 1_000_000.0).alias("f_stop"),
        q["z"].alias("z_centi_micro"),
        q["p"].alias("p_quality"),
        (q["p"] >= 0.5).alias("keep"),
    )


# --------------------------------------------------------------------------
# calibration audit: expected calibration error of the in-plan classifier
# --------------------------------------------------------------------------
ECE_BINS = 10


def _register_ece_calibration():
    """Closure-registered so the oracle embeds the registered classifier and
    label oracles — the audit can never drift from the model it audits."""
    from prefect_flow_arc_indexer_spark.plans.registry import _REGISTRY

    # gopher rules live in corpus_quality; force registration on direct import
    import prefect_flow_arc_indexer_spark.operators.corpus_quality  # noqa: F401

    logi_sql = _REGISTRY["q_quality_logistic"].oracle
    gopher_sql = _REGISTRY["q_gopher_rules"].oracle
    oracle = f"""WITH pred AS ({logi_sql}),
lab AS ({gopher_sql}),
joined AS (
  SELECT CAST(round(pred.p_quality * 1000000) AS BIGINT) AS p_micro,
         CAST(lab.keep AS INT) AS y
    FROM pred JOIN lab ON lab.doc_id = pred.doc_id
),
binned AS (
  SELECT least(p_micro // {1000000 // ECE_BINS}, {ECE_BINS - 1}) AS bin,
         count(*) AS n,
         CAST(sum(p_micro) AS BIGINT) AS sum_p_micro,
         CAST(sum(y) AS BIGINT) AS n_pos
    FROM joined GROUP BY 1
),
gapped AS (
  SELECT bin, n, n_pos,
         round(CAST(sum_p_micro AS DOUBLE) / (n * 1000000.0), 6) AS conf,
         round(CAST(n_pos AS DOUBLE) / n, 6) AS acc,
         round(abs(CAST(sum_p_micro AS DOUBLE) / (n * 1000000.0)
                   - CAST(n_pos AS DOUBLE) / n), 6) AS gap
    FROM binned
)
SELECT bin, CAST(n AS BIGINT) AS n, n_pos, conf, acc, gap,
       round(sum(n * gap) OVER () / sum(n) OVER (), 6) AS ece
  FROM gapped
"""

    @register(
        "q_ece_calibration",
        oracle=oracle,
        doc="model-calibration audit: expected calibration error of the "
        "in-plan logistic quality classifier against the Gopher-rule "
        "verdict as the label — per-bin confidence vs accuracy plus the "
        "weighted ECE, the go/no-go check before trusting classifier "
        "scores as sampling weights. Composed from the registered "
        "operators (oracle embeds their oracles); binning is exact "
        "integer micro-unit arithmetic (no float-boundary bin flips), "
        "and the corpus contributes two scans joined on doc_id — the "
        "bin table itself is 10 rows, so the audit's shuffle is "
        "negligible at any scale.",
    )
    def q_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window

        from prefect_flow_arc_indexer_spark.operators.corpus_quality import (
            gopher_cols,
        )

        # r11 (guide §2.4): classifier score and Gopher label are both
        # row-local, so the audit is ONE fused scan instead of two corpus
        # scans joined on doc_id. Row set: pred covers all docs, lab only
        # text-non-null docs — the inner join kept exactly the latter,
        # which is the filter here. Expressions come from the same shared
        # helpers the registered operators build on.
        docs = (
            load_table(spark, sf_dir, "documents", fan_out=True)
            .where(F.col("text").isNotNull())
            .withColumn("tok", tokens(F.col("text")))
        )
        p = quality_logistic_cols(F.col("tok"), F.col("text"))["p"]
        keep = gopher_cols(F.col("tok"), F.col("text"))["keep"]
        joined = docs.select(
            F.round(p * 1_000_000).cast("bigint").alias("p_micro"),
            keep.cast("int").alias("y"),
        )
        binned = (
            joined.groupBy(
                F.least(
                    F.floor(F.col("p_micro") / (1_000_000 // ECE_BINS)),
                    F.lit(ECE_BINS - 1),
                ).alias("bin")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum("p_micro").cast("bigint").alias("sum_p_micro"),
                F.sum("y").cast("bigint").alias("n_pos"),
            )
        )
        conf = F.col("sum_p_micro").cast("double") / (
            F.col("n") * 1_000_000.0
        )
        acc = F.col("n_pos").cast("double") / F.col("n")
        gapped = binned.select(
            "bin",
            "n",
            "n_pos",
            F.round(conf, 6).alias("conf"),
            F.round(acc, 6).alias("acc"),
            F.round(F.abs(conf - acc), 6).alias("gap"),
        )
        w = Window.partitionBy()
        return gapped.select(
            "bin",
            "n",
            "n_pos",
            "conf",
            "acc",
            "gap",
            F.round(
                F.sum(F.col("n") * F.col("gap")).over(w)
                / F.sum("n").over(w),
                6,
            ).alias("ece"),
        )


_register_ece_calibration()


# --------------------------------------------------------------------------
# split-conformal calibration of the quality classifier
# --------------------------------------------------------------------------
CONFORMAL_ALPHA = 0.1  # target miscoverage: accept 10% missed keeps
CONFORMAL_CAL_PCT = 50  # salted-hash calibration split share


def _register_conformal():
    """Split-conformal threshold for the in-plan classifier: on a hash-split
    calibration set, take the ceil((n+1)(1-alpha))-th smallest nonconformity
    score among true-keep rows; on the held-out split, measure empirical
    coverage. All rank arithmetic is exact-integer (micro-unit scores,
    row_number), so both engines pick the identical threshold."""
    from prefect_flow_arc_indexer_spark.plans.registry import _REGISTRY

    import prefect_flow_arc_indexer_spark.operators.corpus_quality  # noqa: F401

    logi_sql = _REGISTRY["q_quality_logistic"].oracle
    gopher_sql = _REGISTRY["q_gopher_rules"].oracle
    oracle = f"""WITH pred AS ({logi_sql}),
lab AS ({gopher_sql}),
joined AS (
  SELECT pred.doc_id,
         1000000 - CAST(round(pred.p_quality * 1000000) AS BIGINT) AS s_micro,
         CAST('0x' || substr(md5('conf:' || CAST(pred.doc_id AS VARCHAR)), 1, 7)
              AS BIGINT) % 100 < {CONFORMAL_CAL_PCT} AS is_cal
    FROM pred JOIN lab ON lab.doc_id = pred.doc_id
   WHERE lab.keep
),
cal AS (
  SELECT s_micro,
         row_number() OVER (ORDER BY s_micro ASC, doc_id ASC) AS rk,
         count(*) OVER () AS n_cal
    FROM joined WHERE is_cal
),
qhat AS (
  SELECT n_cal, s_micro AS q_hat_micro
    FROM cal
   WHERE rk = least(CAST(ceil((n_cal + 1) * {1 - CONFORMAL_ALPHA}) AS BIGINT),
                    n_cal)
),
ev AS (
  SELECT count(*) AS n_eval,
         CAST(sum(CASE WHEN s_micro <= (SELECT q_hat_micro FROM qhat)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
    FROM joined WHERE NOT is_cal
)
SELECT (SELECT CAST(n_cal AS BIGINT) FROM qhat LIMIT 1) AS n_cal,
       (SELECT q_hat_micro FROM qhat LIMIT 1) AS q_hat_micro,
       n_eval, n_covered,
       round(CAST(n_covered AS DOUBLE) / n_eval, 6) AS coverage
  FROM ev
"""

    @register(
        "q_conformal_threshold",
        oracle=oracle,
        doc="split-conformal calibration: the nonconformity threshold that "
        f"guarantees >= {1 - CONFORMAL_ALPHA:.0%} coverage of true keeps "
        "(finite-sample, distribution-free) for the in-plan quality "
        "classifier, plus the held-out empirical coverage that validates "
        "it — the statistical contract a pipeline publishes when "
        "classifier scores gate what enters training data. Calibration "
        "membership is a salted hash (reproducible split), the quantile "
        "rank is exact-integer ceil((n+1)(1-a)), and the corpus "
        "contributes the two classifier scans; the quantile rank over the "
        "calibration slice (~corpus/2 rows) runs in the two-pass "
        "distrank.global_rank form with n_cal as a broadcast scalar — no "
        "single-task window at any cardinality.",
    )
    def q_conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
        from prefect_flow_arc_indexer_spark.functions.hashing import (
            stable_hash,
        )
        from prefect_flow_arc_indexer_spark.operators.distrank import (
            global_rank,
        )

        from prefect_flow_arc_indexer_spark.operators.corpus_quality import (
            gopher_cols,
        )

        # r11 (guide §2.4): score and label fused into ONE scan — the
        # q_ece_calibration shape; the keep filter restricts to the same
        # rows the pred-join-lab WHERE lab.keep kept.
        docs = (
            load_table(spark, sf_dir, "documents", fan_out=True)
            .where(F.col("text").isNotNull())
            .withColumn("tok", tokens(F.col("text")))
        )
        p = quality_logistic_cols(F.col("tok"), F.col("text"))["p"]
        keep = gopher_cols(F.col("tok"), F.col("text"))["keep"]
        joined = docs.where(keep).select(
            "doc_id",
            (
                F.lit(1_000_000) - F.round(p * 1_000_000).cast("bigint")
            ).alias("s_micro"),
            (
                stable_hash(
                    F.concat(F.lit("conf:"), F.col("doc_id").cast("string"))
                )
                % 100
                < CONFORMAL_CAL_PCT
            ).alias("is_cal"),
        )
        joined = joined.localCheckpoint(eager=True)  # both splits reuse it
        cal0 = joined.where("is_cal")
        n_cal_df = cal0.agg(F.count(F.lit(1)).alias("n_cal"))
        ranked = global_rank(
            cal0, [F.col("s_micro").asc(), F.col("doc_id").asc()], "rk"
        )
        rk_release = ranked.ckpt_release  # distrank's handle
        cal = ranked.crossJoin(F.broadcast(n_cal_df))
        qhat = cal.where(
            F.col("rk")
            == F.least(
                F.ceil((F.col("n_cal") + 1) * (1 - CONFORMAL_ALPHA)).cast(
                    "bigint"
                ),
                F.col("n_cal"),
            )
        ).select(
            F.col("n_cal").cast("bigint").alias("n_cal"),
            F.col("s_micro").alias("q_hat_micro"),
        )
        ev = joined.where(~F.col("is_cal")).crossJoin(F.broadcast(qhat))
        out = ev.groupBy("n_cal", "q_hat_micro").agg(
            F.count("*").alias("n_eval"),
            F.sum(
                (F.col("s_micro") <= F.col("q_hat_micro")).cast("int")
            )
            .cast("bigint")
            .alias("n_covered"),
        ).select(
            "n_cal",
            "q_hat_micro",
            "n_eval",
            "n_covered",
            F.round(
                F.col("n_covered").cast("double") / F.col("n_eval"), 6
            ).alias("coverage"),
        )
        # caller-release contracts for the two checkpoints (ADVICE r10
        # naked-checkpoint class): the scored/split frame and distrank's
        # pinned range partitioning
        from prefect_flow_arc_indexer_spark.functions.caching import (
            CheckpointRelease,
        )

        out.ckpt_release = CheckpointRelease(joined)
        out.rk_release = rk_release
        return out


_register_conformal()


# --------------------------------------------------------------------------
# language-mix profile: code-switching detection via per-language evidence
# --------------------------------------------------------------------------
LANGMIX_DOMINANT_MIN = 0.7  # below this top-language share => mixed doc


def _dd_langmix_sql() -> str:
    langs = sorted(STOPWORDS)
    hits = ",\n       ".join(
        f"CAST({_dd_stopword_hits('tok', STOPWORDS[lang])} AS BIGINT) AS hits_{lang}"
        for lang in langs
    )
    total = " + ".join(f"hits_{lang}" for lang in langs)
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN hits_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""WITH toks AS (
  SELECT doc_id, coalesce({dd_tokens("text")}, []) AS tok FROM documents
),
scored AS (
  SELECT doc_id,
       {hits}
    FROM toks
),
tot AS (
  SELECT *, {total} AS total_hits FROM scored
)
SELECT doc_id, {", ".join(f"hits_{lang}" for lang in langs)},
       CAST(total_hits AS BIGINT) AS total_hits,
       CASE WHEN total_hits > 0 THEN {case} END AS dominant_lang,
       CASE WHEN total_hits > 0
            THEN round(CAST({best} AS DOUBLE) / total_hits, 6) END
           AS dominant_frac,
       total_hits > 0 AND
       CAST({best} AS DOUBLE) / total_hits < {LANGMIX_DOMINANT_MIN}
           AS is_mixed
  FROM tot
"""


@register(
    "q_doc_langmix",
    oracle=_dd_langmix_sql(),
    doc="language-mix (code-switching) profile: per-doc stopword evidence "
    "for every supported language, the dominant language's share, and a "
    f"mixed-doc flag below {LANGMIX_DOMINANT_MIN} dominance — the signal "
    "that routes a doc to split-by-span language handling instead of "
    "whole-doc language ID (q_lang_id only answers argmax; mixed docs "
    "are where that answer misleads). Entirely row-local expressions "
    "over one shared token array: no joins, no shuffle, scoring cost is "
    "scan cost.",
)
def q_doc_langmix(spark: SparkSession, sf_dir: str) -> DataFrame:
    langs = sorted(STOPWORDS)
    docs = load_table(spark, sf_dir, "documents", fan_out=True).withColumn(
        "tok",
        F.coalesce(tokens(F.col("text")), F.array().cast("array<string>")),
    )
    hits = {
        lang: _stopword_hits(F.col("tok"), STOPWORDS[lang]).cast("bigint")
        for lang in langs
    }
    scored = docs.select(
        "doc_id", *[hits[lang].alias(f"hits_{lang}") for lang in langs]
    )
    total = sum((F.col(f"hits_{lang}") for lang in langs[1:]),
                F.col(f"hits_{langs[0]}"))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    dominant = F.lit(None).cast("string")
    for lang in reversed(langs):
        dominant = F.when(
            F.col(f"hits_{lang}") == best, F.lit(lang)
        ).otherwise(dominant)
    tot = scored.withColumn("total_hits", total.cast("bigint"))
    frac = best.cast("double") / F.col("total_hits")
    return tot.select(
        "doc_id",
        *[f"hits_{lang}" for lang in langs],
        "total_hits",
        F.when(F.col("total_hits") > 0, dominant).alias("dominant_lang"),
        F.when(F.col("total_hits") > 0, F.round(frac, 6)).alias(
            "dominant_frac"
        ),
        (
            (F.col("total_hits") > 0) & (frac < LANGMIX_DOMINANT_MIN)
        ).alias("is_mixed"),
    )


# --------------------------------------------------------------------------
# active-learning acquisition: most-uncertain docs under the classifier
# --------------------------------------------------------------------------
UNCERTAIN_TOP = 20


def _register_uncertainty_sample():
    """Uncertainty sampling (the classic active-learning acquisition
    rule): the docs whose classifier logit sits closest to the decision
    boundary are the ones whose labels most improve the model — exactly
    the batch a labeling loop should buy next. |z| is EXACT integer
    centi-micro units, so the selection order is deterministic."""
    from prefect_flow_arc_indexer_spark.plans.registry import _REGISTRY

    logi_sql = _REGISTRY["q_quality_logistic"].oracle
    oracle = f"""WITH scored AS ({logi_sql})
SELECT doc_id, z_centi_micro, p_quality
  FROM scored
 ORDER BY abs(z_centi_micro), doc_id
 LIMIT {UNCERTAIN_TOP}
"""

    @register(
        "q_uncertainty_sample",
        oracle=oracle,
        doc="active-learning acquisition (uncertainty sampling): the "
        f"{UNCERTAIN_TOP} docs with the smallest |logit| under the "
        "in-plan logistic quality classifier — the batch to label next. "
        "Rides the classifier's scan-cost scoring unchanged; selection "
        "is a TakeOrdered on the exact integer |z| with doc_id "
        "tie-break, so no global sort materializes and both engines "
        "pick identical rows.",
    )
    def q_uncertainty_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
        scored = _REGISTRY["q_quality_logistic"].builder(spark, sf_dir)
        return (
            scored.select("doc_id", "z_centi_micro", "p_quality")
            .orderBy(F.abs(F.col("z_centi_micro")), F.col("doc_id"))
            .limit(UNCERTAIN_TOP)
        )


_register_uncertainty_sample()
