"""True ``spark-submit --py-files globalign_spark.zip`` runs.

test_main_cli.py drives main.py in-process; these tests exercise the real
cluster submit path the north rule names: the package is imported FROM THE
ZIP (the entry script is copied to a temp dir outside the repo and the
subprocess environment carries no repo PYTHONPATH), so anything that is not
zip-import-safe — e.g. ``Path(__file__)``-relative data access — fails here.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _clean_env(tmp_path: Path) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # keep derby/metastore litter out of the repo
    env["SPARK_SUBMIT_OPTS"] = f"-Dderby.system.home={tmp_path}"
    return env


def test_packaged_scoring_mat_zipimport(tmp_path):
    """Vendored .mtx data must load when the package lives in a zip."""
    sys.path.insert(0, str(REPO / "tools"))
    try:
        from make_pyfiles_zip import build
    finally:
        sys.path.pop(0)
    zip_path = build(tmp_path / "globalign_spark.zip")

    code = (
        "import globalign_spark.matrices as M;"
        "m = M.packaged_scoring_mat('BLOSUM62');"
        "print(m['A']['A'], m['W']['W'])"
    )
    env = _clean_env(tmp_path)
    env["PYTHONPATH"] = str(zip_path)  # the zip is the ONLY import source
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr
    from globalign_spark import matrices as M

    fs = M.read_scoring_mat(M.packaged_matrix_path("BLOSUM62"))
    assert proc.stdout.split() == [str(fs["A"]["A"]), str(fs["W"]["W"])]


def test_spark_submit_pyfiles_pipeline(tmp_path):
    """End-to-end ER pipeline via real spark-submit --py-files."""
    import pyspark

    spark_submit = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    assert spark_submit.is_file(), "pyspark install has no spark-submit"

    sys.path.insert(0, str(REPO / "tools"))
    try:
        from make_pyfiles_zip import build
    finally:
        sys.path.pop(0)
    zip_path = build(tmp_path / "globalign_spark.zip")
    entry = tmp_path / "main.py"
    shutil.copy(REPO / "globalign_spark" / "main.py", entry)

    wh = tmp_path / "wh"
    proc = subprocess.run(
        [
            str(spark_submit), "--master", "local[4]",
            "--driver-memory", "4g",
            "--py-files", str(zip_path),
            str(entry),
            "--warehouse", str(wh),
            "--n-entities", "120",
            "--evaluate",
        ],
        capture_output=True, text=True, env=_clean_env(tmp_path),
        cwd=str(tmp_path), timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = proc.stdout
    summary = json.loads(out[out.index("{"):])
    assert summary["eval"]["f1"] >= 0.99
    assert "s5_components" in summary["stages"]


def test_spark_submit_local_cluster_multi_executor(tmp_path):
    """The SAME submit on a real multi-executor cluster (north-rule shape).

    local-cluster[2,2,2048] runs TWO SEPARATE EXECUTOR JVMs with real
    inter-process Netty shuffle and per-executor python worker pools —
    the closest this sandbox gets to "N executors" that isn't threads in
    one JVM. Asserts the submitted master was honored (get_spark must not
    override spark-submit's --master with local[cpus]) and that both
    executors registered, via the block-manager count the pipeline
    records in its own summary.
    """
    import pyspark

    spark_submit = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    assert spark_submit.is_file(), "pyspark install has no spark-submit"

    sys.path.insert(0, str(REPO / "tools"))
    try:
        from make_pyfiles_zip import build
    finally:
        sys.path.pop(0)
    zip_path = build(tmp_path / "globalign_spark.zip")
    entry = tmp_path / "main.py"
    shutil.copy(REPO / "globalign_spark" / "main.py", entry)

    wh = tmp_path / "wh"
    proc = subprocess.run(
        [
            str(spark_submit), "--master", "local-cluster[2,2,2048]",
            "--driver-memory", "4g",
            "--py-files", str(zip_path),
            str(entry),
            "--warehouse", str(wh),
            "--n-entities", "120",
            "--evaluate",
        ],
        capture_output=True, text=True, env=_clean_env(tmp_path),
        cwd=str(tmp_path), timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = proc.stdout
    summary = json.loads(out[out.index("{"):])
    assert summary["eval"]["f1"] >= 0.99
    assert summary["spark"]["master"] == "local-cluster[2,2,2048]"
    assert summary["spark"]["default_parallelism"] == 4
    # driver block manager + 2 executor JVMs
    assert summary["spark"]["block_managers"] == 3
