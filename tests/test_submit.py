"""Ship-path evidence: the pipeline runs under `spark-submit --py-files`
with NO repo on the driver/executor PYTHONPATH — the deployment the
north rule names (and the analog of the reference's `spamscope-topology
submit`, src/cli/spamscope_topology.py:32-142). The test zips the
package, launches app.py from a foreign cwd, and asserts the drained
output; a resubmit with the same checkpoints must add zero rows
(resumability + exactly-once across process restarts, not just across
query restarts inside one JVM)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "app.zip")
    pkg = os.path.join(REPO, "spamscope_spark")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    zf.write(p, os.path.relpath(p, REPO))
    return zpath


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_round_trip(spark, tmp_path):
    input_dir = str(tmp_path / "turns_in")
    work_dir = str(tmp_path / "work")
    from spamscope_spark.datagen import generate_turns

    generate_turns(spark, n_convs=30, turns_per_conv=8).coalesce(2).write.parquet(
        input_dir
    )

    zpath = _zip_package(str(tmp_path))
    cmd = [
        "spark-submit",
        "--master", "local[2]",
        "--py-files", zpath,
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        os.path.join(REPO, "app.py"),
        "--input", input_dir,
        "--work-dir", work_dir,
        "--gap-s", "1800",
        "--watermark", "4 hours",
    ]
    # Foreign cwd + scrubbed PYTHONPATH: the ONLY route to the package
    # is the --py-files zip, exactly like a cluster submit.
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    env["PYSPARK_PYTHON"] = sys.executable

    def submit() -> None:
        r = subprocess.run(
            cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=420,
        )
        assert r.returncode == 0, r.stderr[-4000:]

    submit()
    enriched = spark.read.parquet(
        os.path.join(work_dir, "out", "enriched", "data", "epoch=*")
    )
    n_in = spark.read.parquet(input_dir).count()
    assert enriched.count() == n_in > 0
    assert {"conv_id", "turn_idx", "json"} <= set(enriched.columns)
    sessions = spark.read.parquet(
        os.path.join(work_dir, "out", "sessions", "data", "epoch=*")
    )
    assert sessions.count() > 0
    manifest = os.path.join(work_dir, "out", "enriched", "_manifest.jsonl")
    assert os.path.exists(manifest)

    # resubmit from the same checkpoints: a fresh JVM resumes, drains
    # nothing new, and the committed output is unchanged
    submit()
    assert (
        spark.read.parquet(
            os.path.join(work_dir, "out", "enriched", "data", "epoch=*")
        ).count()
        == n_in
    )
