#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: extraction throughput over a *materialized* pages corpus —
parquet on disk, read → mapInPandas extract → count — the same plan shape as
the production job (scan → map-only UDF; no shuffle of page bytes). Corpus
synthesis is untimed setup, written once and reused.

Each query gets one untimed warm pass (JIT/codegen/python-worker spin-up)
then a timed pass: steady-state engine throughput is what projects to a
long-running 100 TB job, not first-query JVM warm-up.

Usage:
    python bench.py                 # driver mode: one JSON line
    python bench.py --scaling       # also run pinned 2/8/32-CPU levels on
                                    # the same corpus (capped at the host's
                                    # CPU count) and report N-to-4N scaling
                                    # efficiency (north_rule two-cluster-
                                    # size evidence)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_PAGES, BENCH_FILLER, BENCH_DIR.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("BENCH_PAGES", "20000"))
FILLER = int(os.environ.get("BENCH_FILLER", "30"))
BENCH_DIR = os.environ.get("BENCH_DIR", "/tmp/html_parser_spark_bench")
CORPUS_FILES = 128  # fixed file count → identical splits at every core level


def _session(cores: int):
    from pyspark.sql import SparkSession
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _timed(df_factory, repeats: int = 2) -> float:
    df_factory().count()                       # warm: JIT + python workers
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        df_factory().count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def corpus_path() -> str:
    import hashlib
    from html_parser_spark.sources import synth
    # Version the corpus by renderer source hash so any synth change
    # invalidates the cached parquet.
    with open(synth.__file__, "rb") as f:
        tag = hashlib.md5(f.read()).hexdigest()[:8]
    return os.path.join(BENCH_DIR, f"pages_{tag}_n{N_PAGES}_f{FILLER}")


def ensure_corpus(spark) -> str:
    """Materialize the synthetic pages corpus once (untimed setup)."""
    path = corpus_path()
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from html_parser_spark.job import pipeline as P
        shutil.rmtree(path, ignore_errors=True)
        (P.synthesize_pages(spark, N_PAGES, partitions=CORPUS_FILES,
                            filler=FILLER)
         .write.mode("overwrite").parquet(path))
    return path


def run_extract(spark, path: str, repeats: int = 2) -> tuple[float, int]:
    """Timed: scan parquet pages → map-only extract → count.

    One warm pass, then best-of-``repeats`` — min is the standard
    noise-robust throughput estimator on a shared box (GC, page cache and
    turbo transitions only ever make a run slower, not faster)."""
    from html_parser_spark.job import pipeline as P

    def job():
        return (P.extract_pages(spark.read.parquet(path))
                .where("status = 'ok'"))

    n_ok = job().count()                       # warm pass
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        n_ok = job().count()
        best = min(best, time.perf_counter() - t0)
    return best, n_ok


def _level_child() -> None:
    """Child process for one scaling level: pin this process (and the JVM
    it spawns) to its own N-CPU set, so every level emulates a machine that
    fully owns N cores — the cluster-faithful N vs 4N proxy. Unpinned, a
    small level borrows the idle box's cache/bandwidth headroom and the
    comparison under-reports real multi-node scaling."""
    cores = int(sys.argv[sys.argv.index("--level") + 1])
    os.sched_setaffinity(0, set(range(cores)))
    spark = _session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    dt, n_ok = run_extract(spark, corpus_path(), repeats=3)
    print(json.dumps({"sec": round(dt, 3),
                      "docs_per_sec": round(N_PAGES / dt, 1),
                      "n_ok": n_ok}))
    spark.stop()


def _ensure_corpus_child() -> None:
    s0 = _session(CPUS)
    s0.sparkContext.setLogLevel("ERROR")
    ensure_corpus(s0)
    s0.stop()


def _child(args: list) -> str:
    """Run a bench subprocess; stderr passes through so failures are
    diagnosable, stdout (the JSON line) is captured."""
    import subprocess
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + args,
        stdout=subprocess.PIPE, text=True, check=True)
    return out.stdout


def _run_scaling_levels() -> dict:
    """Run the pinned levels (capped at the host CPU count), each in a
    subprocess with NO other JVM alive (a lingering stopped-session JVM
    measurably slows the 32-core leg: 3119 → 1751 docs/s observed)."""
    n_cpus = os.cpu_count() or 2
    levels = {}
    for cores in (c for c in (2, 8, 32) if c <= n_cpus):
        out = _child(["--level", str(cores)])
        levels[str(cores)] = json.loads(out.strip().splitlines()[-1])
    result = {
        "levels": levels,
        "protocol": "per-level subprocess pinned to its own N-CPU set, "
                    "fresh JVM, no other JVM alive, one warm pass then "
                    "best-of-3",
    }
    for lo, hi in ((2, 8), (8, 32)):
        if str(lo) in levels and str(hi) in levels:
            result[f"efficiency_{lo}_to_{hi}"] = round(
                levels[str(hi)]["docs_per_sec"]
                / (4 * levels[str(lo)]["docs_per_sec"]), 3)
    return result


def main() -> None:
    if "--level" in sys.argv:
        _level_child()
        return
    if "--ensure-corpus" in sys.argv:
        _ensure_corpus_child()
        return
    scaling = "--scaling" in sys.argv
    import __spark_entry__ as E

    # Corpus generation is heavy (20k rendered pages); do it in a throwaway
    # subprocess so the timed session starts with a clean JVM heap —
    # measured 44 s vs 12 s for the same extract job otherwise (GC debt).
    path = corpus_path()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        _child(["--ensure-corpus"])

    # Scaling levels BEFORE the parent JVM exists (see _run_scaling_levels).
    scaling_result = _run_scaling_levels() if scaling else None

    spark = _session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}

    ext_dt, n_ok = run_extract(spark, path)
    queries["extract_pipeline"] = round(ext_dt, 3)
    docs_per_sec = round(N_PAGES / ext_dt, 1)

    # Every registered query except the two extraction-corpus ones (the
    # headline extract_pipeline above already covers that path at bench
    # scale) — iterating the registry keeps new operators from silently
    # dropping out of the bench.
    qmap = E.queries()
    skip = {"extract_pages", "extract_metrics", "extract_dispatch",
            "host_doc_counts"}
    for name in sorted(set(qmap) - skip):
        queries[name] = _timed(lambda n=name: qmap[n](spark, SF_DIR))

    result = {
        # value = total wall seconds of the whole query suite (per-query
        # map below); extraction throughput itself is docs_per_sec.
        "metric": "query_suite_seconds",
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

    if scaling_result is not None:
        # Two N-to-4N pairs documented in BASELINE.md; see
        # _run_scaling_levels for the pinned-subprocess protocol.
        result["scaling"] = scaling_result
    print(json.dumps(result))


if __name__ == "__main__":
    main()
