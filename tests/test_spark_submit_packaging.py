"""The north rule's packaging clause, CI-checked: the engine must run
via ``spark-submit --py-files pyspider_spark.zip`` — i.e. the package
must be importable from a zip alone (no repo checkout on the cluster),
with the entry script shipped separately.

The test builds the zip the README documents, copies scripts/run_crawl.py
into an empty temp dir (so its sys.path bootstrap points at nothing),
strips PYTHONPATH, and drives a real ``spark-submit --master local[4]``
crawl: if any module were resolved from the repo instead of the zip, or
any module did something zip-import-hostile (``__file__``-relative data
loads, package dir walks), this fails.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "pyspider_spark.zip")
    pkg = os.path.join(REPO, "pyspider_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_crawl(tmp_path):
    zpath = build_zip(str(tmp_path))
    entry = shutil.copy(os.path.join(REPO, "scripts", "run_crawl.py"), tmp_path)
    workdir = str(tmp_path / "crawl")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            entry,
            "crawl", "--workdir", workdir, "--rounds", "2",
            "--hosts", "3", "--chains", "2",
        ],
        cwd=str(tmp_path),  # NOT the repo — the zip must be the only source
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-3000:]}"
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    rounds = payload["rounds"]
    assert len(rounds) == 2
    assert sum(r["popped"] for r in rounds) > 0
    assert sum(r["new_links"] for r in rounds) > 0
    # the table store landed real snapshots under the workdir
    manifests = os.path.join(workdir, "_manifests")
    assert os.path.isfile(os.path.join(manifests, "frontier.json"))
    assert os.path.isfile(os.path.join(manifests, "metrics.json"))
