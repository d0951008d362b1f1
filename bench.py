#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: end-to-end extraction throughput (synthesize → tokenize →
carrier dispatch → rules → envelopes → count) plus the relational /
training-data queries at $SPARK_GRAFT_SF_DIR.

Usage:
    python bench.py                 # driver mode: one JSON line
    python bench.py --scaling       # also run local[8] vs local[32] and
                                    # report scaling efficiency (north_rule
                                    # two-cluster-size evidence)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_PAGES, BENCH_FILLER.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("BENCH_PAGES", "20000"))
FILLER = int(os.environ.get("BENCH_FILLER", "30"))


def _session(cores: int):
    from pyspark.sql import SparkSession
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def run_extract(spark, n_pages: int, cores: int) -> tuple[float, int]:
    from html_parser_spark.job import pipeline as P
    pages = P.synthesize_pages(spark, n_pages, partitions=cores * 2,
                               filler=FILLER)
    ext = P.extract_pages(pages, partitions=cores * 2)
    t0 = time.perf_counter()
    n_ok = ext.where("status = 'ok'").count()
    dt = time.perf_counter() - t0
    return dt, n_ok


def main() -> None:
    scaling = "--scaling" in sys.argv
    import __spark_entry__ as E

    spark = _session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}

    # Headline: extraction throughput.
    warm_dt, _ = run_extract(spark, min(2000, N_PAGES), CPUS)  # warm-up/JIT
    ext_dt, n_ok = run_extract(spark, N_PAGES, CPUS)
    queries["extract_pipeline"] = round(ext_dt, 3)
    docs_per_sec = round(N_PAGES / ext_dt, 1)

    # Relational + training-data queries on the sf tables.
    qmap = E.queries()
    for name in ("pricing_summary", "top_revenue_nations",
                 "semi_join_priority", "weighted_avg_discount",
                 "exact_dedup", "token_stats", "langid", "quality_score",
                 "shingle_count", "cosine_topk", "explode_tokens"):
        df = qmap[name](spark, SF_DIR)
        queries[name] = _time(lambda d=df: d.count())

    result = {
        "metric": "extraction_throughput",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "docs_per_sec": docs_per_sec,
        "n_pages": N_PAGES,
        "filler_blocks": FILLER,
        "cores": CPUS,
        "ok_rate": round(n_ok / N_PAGES, 4),
    }

    if scaling:
        spark.stop()
        levels = {}
        for cores in (8, 32):
            s = _session(cores)
            s.sparkContext.setLogLevel("ERROR")
            run_extract(s, min(2000, N_PAGES), cores)  # warm
            dt, _ = run_extract(s, N_PAGES, cores)
            levels[str(cores)] = {"sec": round(dt, 3),
                                  "docs_per_sec": round(N_PAGES / dt, 1)}
            s.stop()
        t8 = levels["8"]["docs_per_sec"]
        t32 = levels["32"]["docs_per_sec"]
        result["scaling"] = {
            "levels": levels,
            "efficiency_8_to_32": round(t32 / (4 * t8), 3),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
