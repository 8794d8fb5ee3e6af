"""The north rule's launch contract: `spark-submit --py-files`.

Launches the REAL spark-submit binary (the one shipped inside the
installed pyspark distribution, so versions always match) with the
package delivered ONLY through the --py-files zip: the job script is
copied into a bare temp directory, cwd is that directory, and
PYTHONPATH is stripped — if the zip were not wired through to driver
and executor sys.path, every `indonesian_id_ocr_service_spark` import
(including the executor-side corpus generator + Arrow kernel) would
fail. Asserts:

1. the submitted run commits all buckets and prints the JSON line;
2. the results parquet is span-for-span identical to an in-process
   `run_pipeline` over the same deterministic corpus;
3. re-submitting the identical command resumes from the lineage log
   (0 buckets run) — crash-resume across PROCESS boundaries, not just
   within a session.

One submit launch is a full JVM boot (~20-40 s); the corpus is kept
small and both launches share one module-scoped run.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                            "spark-submit")
N_DOCS = 240
SEED = 42
N_BUCKETS = 8


def _submit(workdir: str, base_dir: str) -> str:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--driver-memory", "3g",
        "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", os.path.join(workdir, "pkg.zip"),
        os.path.join(workdir, "extract_job.py"),
        "--synth", str(N_DOCS), "--seed", str(SEED),
        "--base-dir", base_dir,
        "--run-id", "submit-smoke",
        "--n-buckets", str(N_BUCKETS),
        "--log-month", "2026-08",
    ]
    proc = subprocess.run(cmd, cwd=workdir, env=env, timeout=420,
                          capture_output=True, text=True)
    assert proc.returncode == 0, (
        f"spark-submit failed\nSTDOUT:\n{proc.stdout[-3000:]}\n"
        f"STDERR:\n{proc.stderr[-3000:]}")
    return proc.stdout


def _last_json_line(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in stdout: {stdout[-2000:]}")


@pytest.fixture(scope="module")
def submitted_run(tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("submit"))
    base_dir = os.path.join(workdir, "run_out")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_pyfiles", os.path.join(REPO, "tools", "make_pyfiles.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    zip_path = mod.build(os.path.join(workdir, "pkg.zip"))
    assert os.path.getsize(zip_path) > 50_000
    shutil.copy(os.path.join(REPO, "jobs", "extract_job.py"),
                os.path.join(workdir, "extract_job.py"))
    first = _last_json_line(_submit(workdir, base_dir))
    return workdir, base_dir, first


def test_submit_commits_all_buckets(submitted_run):
    _, base_dir, first = submitted_run
    assert first["buckets_run"] == N_BUCKETS
    assert first["buckets_skipped"] == 0
    assert first["rows"] == N_DOCS
    lineage = os.path.join(base_dir, "lineage.jsonl")
    with open(lineage) as f:
        recs = [json.loads(ln) for ln in f]
    assert sorted(r["bucket"] for r in recs) == list(range(N_BUCKETS))
    assert all(r["status"] == "committed" for r in recs)


def test_submit_output_matches_in_process_pipeline(spark, submitted_run):
    _, base_dir, _ = submitted_run
    from indonesian_id_ocr_service_spark.corpus.generator import corpus_df
    from indonesian_id_ocr_service_spark.pipeline import run_pipeline

    def spans_of(df):
        out = {}
        for r in df.collect():
            out[r["doc_id"]] = [
                (s["kind"], s["text"], s["media_ref"], s["order"])
                for s in sorted(r["out_spans"], key=lambda s: s["order"])
            ]
        return out

    expected = spans_of(run_pipeline(corpus_df(spark, N_DOCS, seed=SEED)))
    got = spans_of(
        spark.read.parquet(os.path.join(base_dir, "results"))
        .select("doc_id", "out_spans"))
    assert len(got) == N_DOCS
    assert got == expected


def test_resubmit_resumes_from_lineage(submitted_run):
    workdir, base_dir, _ = submitted_run
    second = _last_json_line(_submit(workdir, base_dir))
    assert second["buckets_run"] == 0
    assert second["buckets_skipped"] == N_BUCKETS
    assert second["rows"] == 0
