"""Structured Streaming tests: AvailableNow drain of a pages directory with
checkpointed restart (no reprocessing), watermarked windowed aggregation,
and the applyInPandasWithState sessionizer."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from html_parser_spark.job import pipeline as P
from html_parser_spark.streaming import stream as ST


def _write_pages(spark, path: str, n: int, start: int = 0) -> None:
    from html_parser_spark.sources import synth

    rows = [synth.page_record(i) for i in range(start, start + n)]
    spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
         for r in rows], schema=P.PAGES_SCHEMA,
    ).coalesce(2).write.mode("append").parquet(path)


def test_stream_extract_available_now_and_restart(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    table_dir = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")

    _write_pages(spark, pages_dir, 40)
    q = ST.stream_extract(spark, pages_dir, table_dir, ckpt)
    q.awaitTermination(120)
    got = P.committed_table(spark, table_dir)
    assert got.count() == 40
    snaps1 = P.committed_snapshots(table_dir)
    assert snaps1 and sum(s["rows"] for s in snaps1) == 40

    # Restart with 20 NEW pages: checkpoint must skip the original files.
    _write_pages(spark, pages_dir, 20, start=40)
    q2 = ST.stream_extract(spark, pages_dir, table_dir, ckpt)
    q2.awaitTermination(120)
    got2 = P.committed_table(spark, table_dir)
    assert got2.count() == 60
    assert got2.select("url").distinct().count() == 60  # no dupes


def test_windowed_event_counts_batch_twin(spark):
    rows = [("2024-01-01 10:05:00", "click", 1.0),
            ("2024-01-01 10:55:00", "click", 2.0),
            ("2024-01-01 11:05:00", "click", 4.0),
            ("2024-01-01 10:30:00", "view", 8.0)]
    ev = (spark.createDataFrame(rows, ["ts", "event_type", "value"])
          .select(F.col("ts").cast("timestamp").alias("ts"),
                  "event_type", "value"))
    got = {(str(r.window_start), r.event_type): (r.n_events, r.sum_value)
           for r in ST.windowed_event_counts(ev).collect()}
    assert got[("2024-01-01 10:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 11:00:00", "click")] == (1, 4.0)
    assert got[("2024-01-01 10:00:00", "view")] == (1, 8.0)


def test_sessionize_stateful_stream(spark, tmp_path):
    # Two users; user 1 has a >30min gap → 2 sessions, user 2 → 1 session.
    rows = [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:10:00", 2.0),
        (1, "2024-01-01 11:00:01", 4.0),   # gap > 30 min → new session
        (2, "2024-01-01 09:00:00", 8.0),
        (2, "2024-01-01 09:20:00", 16.0),
    ]
    src = str(tmp_path / "events")
    (spark.createDataFrame(rows, ["user_id", "ts", "value"])
     .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
     .coalesce(1).write.parquet(src))

    stream = (spark.readStream
              .schema("user_id long, ts timestamp, value double")
              .parquet(src))
    sessions = ST.sessionize(stream)
    sink = []
    q = (sessions.writeStream
         .foreachBatch(lambda df, _id: sink.extend(df.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)

    # Only CLOSED sessions are emitted: user 1's first session closed when
    # the 11:00 event arrived; the open tails stay in state.
    closed = {(r.user_id, str(r.session_start), r.n_events, r.total_value)
              for r in sink}
    assert (1, "2024-01-01 10:00:00", 2, 3.0) in closed
    assert not any(u == 2 for (u, *_rest) in closed)
