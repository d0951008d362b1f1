"""End-to-end Spark pipeline tests: golden envelopes + byte-identical text,
error routing, metrics, snapshot resume (SURVEY.md §5.2 items 1, 4, 5)."""

from __future__ import annotations

import json

import pytest

from html_parser_spark.job import pipeline as P
from html_parser_spark.sources import synth

from .oracle import oracle_text

N_PAGES = 150


@pytest.fixture(scope="module")
def extracted_rows(spark):
    pages = P.synthesize_pages(spark, N_PAGES, partitions=4)
    ext = P.extract_pages(pages, partitions=4)
    rows = {r["url"]: r for r in ext.collect()}
    assert len(rows) == N_PAGES
    return rows


def test_envelopes_match_goldens(extracted_rows):
    checked = 0
    for idx in range(N_PAGES):
        golden = synth.golden_envelope(idx)
        if golden is None:
            continue
        row = extracted_rows[synth.url_for(idx)]
        assert row["status"] == "ok", (idx, row["error"])
        assert json.loads(row["envelope"]) == golden, idx
        checked += 1
    assert checked > 100


def test_text_byte_identical_vs_oracle(extracted_rows):
    for idx in range(N_PAGES):
        profile = synth.profile_for(idx)
        if profile == "pdf":
            continue
        html = synth.render_page(idx).decode("utf-8", errors="replace")
        row = extracted_rows[synth.url_for(idx)]
        assert row["text"] == oracle_text(html), idx


def test_pdf_branch(extracted_rows):
    idx = 48
    assert synth.profile_for(idx) == "pdf"
    row = extracted_rows[synth.url_for(idx)]
    assert row["profile"] == "pdf" and row["status"] == "ok"
    assert f"Report {idx}" in row["text"]


def test_error_pages_never_fail_job(extracted_rows):
    for idx in (49, 99, 149):
        row = extracted_rows[synth.url_for(idx)]
        assert row["status"] in ("no_rule", "error")


def test_boilerplate_main_text_strips_chrome(extracted_rows):
    idx = 0
    row = extracted_rows[synth.url_for(idx)]
    mt = row["main_text"]
    p = synth.payload_for(idx)
    assert p["description"].split(".")[0] in mt
    assert "Privacy Policy" not in mt
    assert "© 2025 Example Retail Group" not in mt


def test_metrics_side_table(spark):
    pages = P.synthesize_pages(spark, 100, partitions=4)
    ext = P.extract_pages(pages, partitions=4)
    m = {(r["profile"], r["status"]): r["n_docs"]
         for r in P.metrics_from_extracted(ext).collect()}
    assert sum(m.values()) == 100
    assert m.get(("pdf", "ok")) == 2
    ok = sum(v for (p, s), v in m.items() if s == "ok")
    assert ok >= 96


def test_snapshot_resume_idempotent(spark, tmp_path):
    table = str(tmp_path / "extracted")
    pages = P.synthesize_pages(spark, 60, partitions=4)

    # First run: only the first 30 urls (simulated partial run).
    first = pages.limit(30)
    P.write_snapshot(P.extract_pages(first, partitions=2), table, "run1")

    # Resume: anti-join must leave exactly the other 30.
    remaining = P.resume_remaining(pages, table)
    assert remaining.count() == 30
    P.write_snapshot(P.extract_pages(remaining, partitions=2), table, "run2")

    final = P.committed_table(spark, table)
    assert final.count() == 60
    assert final.select("url").distinct().count() == 60  # no dupes

    # Re-resume after everything is committed: nothing left, plan is a no-op.
    assert P.resume_remaining(pages, table).count() == 0
    snaps = P.committed_snapshots(table)
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert snaps[1]["parent"] == 1
    assert sum(s["rows"] for s in snaps) == 60


def test_host_salted_partitioning_runs(spark):
    pages = P.synthesize_pages(spark, 40, partitions=2)
    out = P.extract_pages(pages, partitions=4, host_salted=True, salt=4)
    assert out.count() == 40


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    """north_rule deployment shape: `spark-submit --py-files pkg.zip
    run.py` in a fresh process whose imports can only resolve from the
    shipped zip (run.py is copied OUT of the repo and cwd is the temp
    dir), writing a committed snapshot the resume machinery can read."""
    import os
    import shutil
    import subprocess
    import sys
    import zipfile

    from html_parser_spark.job import pipeline as P

    src = str(tmp_path / "pages")
    out = str(tmp_path / "extracted")
    P.synthesize_pages(spark, 30).write.parquet(src)

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(P.__file__)))
    repo_root = os.path.dirname(pkg_dir)
    zpath = str(tmp_path / "html_parser_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo_root))
    run_py = str(tmp_path / "run.py")
    shutil.copy(os.path.join(pkg_dir, "job", "run.py"), run_py)

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zpath, run_py,
         "--input", src, "--output", out, "--cores", "4"],
        capture_output=True, text=True, timeout=570, env=env,
        cwd=str(tmp_path))
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-3000:])

    committed = P.committed_table(spark, out)
    assert committed is not None and committed.count() == 30
    assert len(P.committed_snapshots(out)) == 1


def test_snapshot_manifest_carries_per_partition_lineage(spark, tmp_path):
    """north_rule: per-partition lineage — every parquet part file in the
    snapshot appears in the manifest with its row count, summing to the
    snapshot total."""
    from html_parser_spark.job import pipeline as P
    table = str(tmp_path / "tbl")
    df = P.extract_pages(P.synthesize_pages(spark, 20, partitions=4))
    m = P.write_snapshot(df, table, "r1")
    assert m["files"], m
    assert sum(f["rows"] for f in m["files"]) == m["rows"] == 20
    import os
    for f in m["files"]:
        assert f["file"].startswith("data/run_id=r1"), f
        assert os.path.exists(os.path.join(table, f["file"])), f
