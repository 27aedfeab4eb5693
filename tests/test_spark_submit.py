"""North-rule deployment gate: the engine runs via real ``spark-submit
--py-files engine.zip`` with NO repo directory on the path — proving the
package is self-contained and zip-importable."""

from __future__ import annotations

import os
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w") as z:
        pkg = os.path.join(REPO, "zh_ner_tf_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


@pytest.mark.slow
def test_spark_submit_pyfiles_runs_pipeline(tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    _build_zip(zip_path)
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)   # engine must come from the zip alone
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        env[v] = "1"
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "run_pipeline_job.py"),
            "150", out_dir,
        ],
        cwd=str(tmp_path),          # NOT the repo: imports must hit the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    marker = [l for l in proc.stdout.splitlines() if l.startswith("TRIPLES_WRITTEN=")]
    assert marker, proc.stdout[-2000:]
    assert int(marker[0].split("=")[1]) > 0
    assert os.path.exists(os.path.join(out_dir, "nodes"))


@pytest.mark.slow
def test_spark_submit_incremental_consumes_batches(tmp_path):
    """The crawl-consumption loop under real spark-submit --py-files:
    each invocation appends one deterministic page batch as a snapshot
    and consumes EXACTLY that batch (run_incremental cursor), advancing
    the published graph."""
    zip_path = str(tmp_path / "engine.zip")
    _build_zip(zip_path)
    ptable = str(tmp_path / "pages")
    groot = str(tmp_path / "graph")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        env[v] = "1"

    def submit(*extra):
        return subprocess.run(
            [
                "spark-submit",
                "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
                "--py-files", zip_path,
                os.path.join(REPO, "scripts", "run_pipeline_job.py"),
                "incremental", ptable, groot, "50", *extra,
            ],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=600,
        )

    def val(out, key):
        return [l for l in out.splitlines() if l.startswith(key + "=")][0].split("=", 1)[1]

    p1 = submit()
    assert p1.returncode == 0, p1.stderr[-3000:]
    assert val(p1.stdout, "PROCESSED_PAGES") == "50"
    assert val(p1.stdout, "UP_TO_DATE") == "False"
    assert val(p1.stdout, "PAGES_SNAPSHOT") == "1"
    # default CLI shape (no --links): no link state is touched/printed
    assert "LINK_MODE=" not in p1.stdout
    p2 = submit("--links")
    assert p2.returncode == 0, p2.stderr[-3000:]
    assert val(p2.stdout, "PROCESSED_PAGES") == "50"   # ONLY the new batch
    assert val(p2.stdout, "PAGES_SNAPSHOT") == "2"
    # --links over state an unmaintained increment left stale must
    # BOOTSTRAP (full relink) from the zip, not delta-merge
    assert val(p2.stdout, "LINK_MODE") == "bootstrap"
    assert os.path.exists(os.path.join(groot, "nodes", "snapshots"))
    assert os.path.exists(os.path.join(groot, "mentions"))
    assert os.path.exists(os.path.join(groot, "state", "links"))
