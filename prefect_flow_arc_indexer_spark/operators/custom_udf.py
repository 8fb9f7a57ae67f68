"""User-defined aggregate surface: Arrow-batched Pandas UDAFs.

The reference exposes no UDF/UDAF surface (SURVEY §2.8 ABSENT); this module
demonstrates the engine's sanctioned extension point for aggregations the
built-ins lack — a ``pandas_udf`` GROUPED_AGG, which Spark executes as a
real aggregate (partial batches stream through Arrow; no collect, no
row-at-a-time Python). Rule of thumb stays: if an expression exists
JVM-side (this geometric mean could be ``exp(avg(ln(1+x)))``), prefer it;
the UDAF form is here to prove the plumbing with an oracle-checkable
function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table


# return type passed as a DataType instance (not a DDL string) so the module
# imports without an active SparkSession — DDL strings are parsed eagerly at
# decoration time and would make `queries()` require a session first.
@pandas_udf(DoubleType())
def geometric_mean_1p(v: pd.Series) -> float:
    """Geometric mean of (1 + v): exp(mean(log1p(v))). float64 end-to-end;
    the 1e-15-scale summation-order drift vs. the oracle is absorbed by the
    6-decimal rounding at the query layer."""
    return float(np.exp(np.log1p(v.to_numpy(dtype="float64")).mean()))


@register(
    "q_geomean_value",
    oracle="""SELECT event_type,
       round(exp(avg(ln(1 + value))), 6) AS geomean_value
  FROM events
 GROUP BY event_type
""",
    doc="custom UDAF: per-type geometric mean of event value via a "
    "pandas_udf GROUPED_AGG (Arrow-batched partial aggregation; the "
    "engine's UDAF extension point). Spark disallows mixing pandas and "
    "built-in aggregates in one agg, so the UDAF stands alone here.",
)
def q_geomean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", fan_out=True)
    return ev.groupBy("event_type").agg(
        F.round(geometric_mean_1p("value"), 6).alias("geomean_value"),
    )


# --------------------------------------------------------------------------
# user-defined TABLE function (UDTF): context-window document chunking
# --------------------------------------------------------------------------
CHUNK_WINDOW = 32


def _chunk_docs_udtf_class():
    """Build the UDTF class lazily: the @udtf decorator parses the DDL
    return type, and keeping it inside a function means importing this
    module never requires an active session."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, n_tokens int, chunk string")
    class ChunkDocs:
        """One row per context-window chunk of a document — the exploding
        row->rows shape the reference's ``generate_actions`` generator has
        (``flows/main_flow.py:366-395``, a UDTF in disguise), here as a real
        Python UDTF. Tokenization matches functions.textfns.tokens
        (lowercase, whitespace split, empties dropped)."""

        def eval(self, doc_id, text):
            if text is None:
                return
            toks = text.lower().split()
            for ci, start in enumerate(range(0, len(toks), CHUNK_WINDOW)):
                window = toks[start : start + CHUNK_WINDOW]
                yield doc_id, ci, len(window), " ".join(window)

    return ChunkDocs


@register(
    "q_udtf_chunks",
    oracle=f"""WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tok
    FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST((i - 1) // {CHUNK_WINDOW} AS INTEGER) AS chunk_idx,
       CAST(least({CHUNK_WINDOW}, len(tok) - i + 1) AS INTEGER) AS n_tokens,
       array_to_string(list_slice(tok, i, i + {CHUNK_WINDOW - 1}), ' ') AS chunk
  FROM toks, unnest(generate_series(1, len(tok), {CHUNK_WINDOW})) AS t(i)
 WHERE len(tok) > 0
""",
    doc=f"Python UDTF surface: {CHUNK_WINDOW}-token context-window chunking "
    "of documents via a lateral-joined user-defined TABLE function — the "
    "row->rows extension point (the JVM-side equivalent for hot paths is "
    "the higher-order-function explode q_chunk_dedup uses; the UDTF form "
    "is for logic that genuinely needs Python)",
)
def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("chunk_docs_udtf", _chunk_docs_udtf_class())
    load_table(spark, sf_dir, "documents", fan_out=True).createOrReplaceTempView(
        "_docs_for_chunking"
    )
    return spark.sql(
        "SELECT c.* FROM _docs_for_chunking d, "
        "LATERAL chunk_docs_udtf(d.doc_id, d.text) c"
    )


# --------------------------------------------------------------------------
# grouped applyInPandas: per-entity time-series resample + forward fill
# --------------------------------------------------------------------------
RESAMPLE_USERS = 40  # user_id < 40 keeps the hourly grid a bounded fixture


@register(
    "q_resample_ffill",
    oracle=f"""WITH ev AS (
  SELECT user_id, ts, value, event_id FROM events WHERE user_id < {RESAMPLE_USERS}
),
b AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS t0,
         date_trunc('hour', max(ts)) AS t1
    FROM ev GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h FROM b
),
u AS (
  SELECT user_id, h AS t, CAST(NULL AS DOUBLE) AS v, 1 AS pri,
         CAST(NULL AS BIGINT) AS eid
    FROM grid
  UNION ALL
  SELECT user_id, ts, value, 0 AS pri, event_id FROM ev
),
f AS (
  SELECT user_id, t, pri,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY t ASC, pri ASC,
                    coalesce(eid, 9223372036854775807) ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
    FROM u
)
SELECT user_id, t AS hour, value FROM f WHERE pri = 1
""",
    doc="grouped time-series regularization via applyInPandas: each user's "
    "irregular event stream becomes an hourly grid carrying the last "
    "observed value forward (as-of semantics; ties broken by max "
    "event_id, leading grid points before any event stay NULL). The "
    "group-map Arrow path is the sanctioned escape hatch for per-entity "
    "sequence logic SQL windows express awkwardly — state stays inside "
    "one partition's pandas frame, the shuffle is one user-keyed "
    "exchange, and grid width bounds per-group memory. The oracle "
    "replays it relationally: grid UNION events, last_value IGNORE "
    "NULLS over (t, grid-after-event, event_id).",
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < RESAMPLE_USERS)
        .select("user_id", "ts", "value", "event_id")
    )

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        t0 = pdf["ts"].min().floor("h")
        t1 = pdf["ts"].max().floor("h")
        grid = pd.DataFrame(
            {"hour": pd.date_range(t0, t1, freq="h").astype(pdf["ts"].dtype)}
        )
        g = pd.merge_asof(
            grid, pdf[["ts", "value"]], left_on="hour", right_on="ts"
        )
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].iloc[0],
                "hour": g["hour"],
                "value": g["value"],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        fill, "user_id bigint, hour timestamp, value double"
    )
