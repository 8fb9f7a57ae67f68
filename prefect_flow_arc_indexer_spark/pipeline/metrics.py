"""Job observability — the reference's progress/error counters (SURVEY A7:
``records``/``errors`` accumulation and every-10% progress logging,
``/root/reference/flows/main_flow.py:354-363,423-436``) re-expressed as
Spark ``Observation`` metrics.

Why ``observe()`` and not accumulators: observation metrics are computed
inside the job as plain aggregate expressions (exactly-once per action,
merged on the driver when the action completes), while accumulators
double-count on task retry — the wrong default for *metrics that gate
decisions* like the reference's count reconciliation. The metrics ride the
existing job: NO extra pass over the data, no second count() action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def observe_actions(actions: DataFrame, name: str = "indexer") -> tuple[DataFrame, Observation]:
    """Attach the reference's operational counters to an action frame
    (columns ``_id``, ``_op_type``, ``_source``, per ``operators/actions``).

    Returns the observed frame plus the Observation; after ANY action runs
    on the frame, ``observation.get`` yields::

        n_actions   total rows shipped          (progress denominator)
        n_upserts   _op_type = 'index'
        n_deletes   _op_type = 'delete'
        n_errors    malformed rows (NULL id, or upsert without a payload)

    The reference logs progress every ~10% of ``record_count`` and tracks a
    per-row error counter; here the counts come out of the same job that
    writes the batch.
    """
    obs = Observation(name)
    observed = actions.observe(
        obs,
        F.count(F.lit(1)).alias("n_actions"),
        F.count_if(F.col("_op_type") == "index").alias("n_upserts"),
        F.count_if(F.col("_op_type") == "delete").alias("n_deletes"),
        F.count_if(
            F.col("_id").isNull()
            | ((F.col("_op_type") == "index") & F.col("_source").isNull())
        ).alias("n_errors"),
    )
    return observed, obs


def observe_rowcount(df: DataFrame, name: str = "rows") -> tuple[DataFrame, Observation]:
    """Minimal variant: row count piggybacked on the caller's next action —
    the skip-if-zero gate (SURVEY T4/V9) without a separate count() job."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs
