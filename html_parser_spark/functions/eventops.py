"""Event-stream analytics operators (batch twins of streaming/stream.py).

Gap sessionization and tumbling-window rollups — the batch shapes a crawl
/ telemetry pipeline replays over historical event tables, matching the
streaming sessionizer's semantics so backfills and live paths agree.

Scale notes: both operators shuffle ONCE on their natural key (user for
sessions, nothing extra for tumbling windows — the groupBy handles it with
map-side combine). The session window runs per-user; user partitions are
small by construction, so no skew guard is needed beyond AQE. Time math is
integer microseconds straight off the NTZ values (``timestamp_diff``), so
the DuckDB twin (``epoch_us`` differences on the same naive values)
matches exactly — no float drift and no session-timezone/DST dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["sessionize_events", "windowed_type_counts"]


def sessionize_events(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      val_col: str = "value",
                      gap_min: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap to
    the previous event exceeds ``gap_min`` minutes.

    lag-over-user-window marks session starts, a running sum numbers them
    (the standard sessionization idiom), then one aggregation per
    (user, session). ``id_col`` breaks ordering ties deterministically so
    the DuckDB twin enumerates identically. Gaps use ``timestamp_diff`` on
    the NTZ values directly — no cast through the session timezone, whose
    DST transitions would shift wall-clock gap lengths (and desync the
    ``epoch_us``-based oracle) on any non-UTC-configured cluster.

    Output: (user_id, session_no, n_events, sum_value, start_ts, end_ts).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = F.timestamp_diff("MICROSECOND", prev, F.col(ts_col))
    is_new = F.when(
        prev.isNull() | (gap_us > gap_min * 60 * 1_000_000),
        F.lit(1)).otherwise(F.lit(0))
    sess = (events
            .withColumn("_new", is_new)
            .withColumn("session_no", F.sum("_new").over(w)))
    return (sess.groupBy(F.col(user_col).alias("user_id"), "session_no")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(val_col), 6).alias("sum_value"),
                 F.min(ts_col).alias("start_ts"),
                 F.max(ts_col).alias("end_ts")))


def windowed_type_counts(events: DataFrame, ts_col: str = "ts",
                         type_col: str = "event_type",
                         val_col: str = "value") -> DataFrame:
    """Tumbling 1-hour rollup per event type: count + summed value.

    ``date_trunc`` keys the window (identical semantics in DuckDB), the
    groupBy is map-side combinable — the batch twin of the streaming
    windowed aggregation.
    """
    return (events
            .groupBy(F.date_trunc("hour", F.col(ts_col)).alias("window_start"),
                     F.col(type_col).alias("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(val_col), 6).alias("sum_value")))
