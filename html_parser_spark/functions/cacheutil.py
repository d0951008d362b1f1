"""Bounded persist registry for operator-internal cache boundaries.

Operators like ``dedup.simhash_pairs`` persist an internal table that
several downstream branches of the SAME returned plan consume (the
Manku-style fingerprint shard) — but the handle is internal, so a caller
can never unpersist it, and repeated calls (one warm + N timed bench
passes, or a long-lived driver) would accumulate cached copies for the
application lifetime.

``swap_persist`` keeps at most ONE live cached DataFrame per key: each
call unpersists the previous call's table (non-blocking) before
persisting the new one. Unpersisting an earlier result a caller still
holds is safe — persist is an optimization, not a correctness boundary;
a late consumer simply recomputes its lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["swap_persist"]

_LIVE: dict = {}


def swap_persist(key: str, df: DataFrame, storage_level=None) -> DataFrame:
    from pyspark import StorageLevel

    prev = _LIVE.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:  # session gone / already unpersisted — harmless
            pass
    out = df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    _LIVE[key] = out
    return out


def release_local_checkpoint(df: DataFrame) -> None:
    """Best-effort release of a ``localCheckpoint``-ed DataFrame's backing
    RDD. A local checkpoint TRUNCATES lineage, so the DataFrame is
    unrecoverable afterwards — call this ONLY on superseded loop-internal
    checkpoints that nothing references anymore (e.g. round N's labels
    once round N+1 has materialized). Best-effort: internal-API failures
    degrade to the old keep-until-session-end behavior.

    Guarded: only fires when the analyzed plan IS a checkpoint scan
    (``LogicalRDD``) — on any Spark version or call site where it is not
    (a live non-checkpointed DataFrame, a renamed internal class), this
    no-ops WITHOUT unpersisting, because unpersisting the RDD under a
    lineage-truncated plan makes the handle permanently uncomputable.
    Failures log at debug so misuse is observable, not swallowed."""
    import logging
    log = logging.getLogger(__name__)
    try:
        plan = df._jdf.queryExecution().analyzed()
        cls = plan.getClass().getSimpleName()
        if cls != "LogicalRDD":
            log.debug("release_local_checkpoint: plan is %s, not a "
                      "checkpointed LogicalRDD — skipping unpersist", cls)
            return
        plan.rdd().unpersist(False)
    except Exception as exc:  # py4j / internal-API drift — observable no-op
        log.debug("release_local_checkpoint: best-effort release failed "
                  "(%s: %s)", type(exc).__name__, exc)
