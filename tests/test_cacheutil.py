"""Bounded-persist registry + checkpoint-release guard behavior."""
from __future__ import annotations

from html_parser_spark.functions.cacheutil import (release_local_checkpoint,
                                                   swap_persist)


def test_release_guard_noops_on_live_dataframe(spark):
    """release_local_checkpoint must be a no-op on a DataFrame whose plan
    is NOT a checkpointed LogicalRDD (ADVICE r4): unpersisting the RDD
    under a live plan would be wrong, and on a checkpointed handle a
    misuse would make it permanently uncomputable. The guard checks the
    analyzed plan class before touching anything."""
    live = spark.range(100).selectExpr("id", "id * 2 AS dbl").persist()
    try:
        assert live.count() == 100
        release_local_checkpoint(live)  # plan is Project<-Range: must skip
        assert live.storageLevel.useMemory, \
            "guard must not unpersist a live non-checkpointed DataFrame"
        assert live.count() == 100
    finally:
        live.unpersist()


def test_release_frees_checkpointed_rdd(spark):
    """The guarded release still fires on a real localCheckpoint plan:
    its backing RDD blocks are dropped (the caller promises nothing
    references the handle afterwards)."""
    ck = spark.range(50).localCheckpoint(eager=True)
    assert ck.count() == 50
    release_local_checkpoint(ck)  # plan IS a LogicalRDD: releases


def test_swap_persist_keeps_one_live_copy(spark):
    a = swap_persist("test.swap", spark.range(10))
    assert a.count() == 10
    b = swap_persist("test.swap", spark.range(20))
    assert b.count() == 20
    assert not a.storageLevel.useMemory and not a.storageLevel.useDisk, \
        "previous copy must be unpersisted on swap"
    b.unpersist()
