"""Deterministic release of localCheckpoint storage.

Two facts about ``DataFrame.localCheckpoint`` that make it a silent leak
in a long-lived session (both measured on this build, see
tests/test_cache_soak.py):

1. ``DataFrame.unpersist()`` is a NO-OP for a checkpointed frame: it only
   consults the SQL cache manager, while the checkpoint's storage is an
   RDD-level persist the cache manager never sees.
2. The ContextCleaner never reclaims them from PySpark: the JVM ``Dataset``
   behind a Python wrapper stays strongly reachable long after the wrapper
   is garbage-collected, so the cleaner's weak reference never clears and
   the checkpoint blocks stay resident for the session's lifetime.

The only working release is ``SparkContext.unpersistRDD(id)`` on the RDD
the checkpoint created — reachable through the frame's analyzed plan
(a ``LogicalRDD`` whose ``rdd`` IS the persisted one).

CONTRACT: a released checkpoint frame (and anything derived from it) is
UNUSABLE afterwards — the blocks are the only data source, there is no
lineage to recompute from. Release only frames you own, after their last
consumer has materialized. This is unlike releasing a persist()-cache,
where a late reader just recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(frame: DataFrame) -> bool:
    """Free the executor blocks behind a localCheckpoint'ed ``frame``.

    Returns True when the frame was checkpoint-backed and its RDD was
    unpersisted; False when it is not checkpoint-backed (or the JVM handle
    is already gone — e.g. session stopped)."""
    try:
        plan = frame._jdf.queryExecution().analyzed()
        if not plan.getClass().getName().endswith(".LogicalRDD"):
            return False
        rdd = plan.rdd()
        # a LogicalRDD plan is NOT proof of a checkpoint: createDataFrame-
        # from-local-rows also analyzes to LogicalRDD. Only claim the
        # release when the RDD is actually persisted — otherwise fall
        # through so release_frame's unpersist() can clear a SQL-cache
        # entry on a persist()-cached frame of this shape (ADVICE r8)
        if not rdd.getStorageLevel().isValid():
            return False
        frame.sparkSession.sparkContext._jsc.sc().unpersistRDD(rdd.id(), False)
        return True
    except Exception:  # session stopped / non-standard plan — best effort
        return False


def release_frame(frame: DataFrame) -> None:
    """Best-effort release for a frame that is EITHER checkpoint-backed or
    persist()-cached — the loop-body case where a variable holds a plain
    cached frame on round 0 and a checkpoint on every later round."""
    if not release_local_checkpoint(frame):
        try:
            frame.unpersist()
        except Exception:  # session already stopped
            pass


class CheckpointRelease:
    """Explicit-release handle for a checkpoint a returned frame depends
    on. NO GC backstop on purpose: unlike a cache (where an early release
    merely forces recomputation), releasing a checkpoint breaks every
    derived frame outright, so release must be a deliberate caller act."""

    def __init__(self, frame: DataFrame) -> None:
        self._frame: DataFrame | None = frame

    def release(self) -> bool:
        frame, self._frame = self._frame, None
        return release_local_checkpoint(frame) if frame is not None else False
