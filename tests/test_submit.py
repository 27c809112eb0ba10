"""spark-submit --py-files launch path (north-rule): the packaged zip must be
the ONLY way the job finds covsar_spark — the subprocess runs from a clean
cwd with no repo on sys.path."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    assert os.path.exists(spark_submit), "spark-submit not found"

    sys.path.insert(0, REPO)
    from covsar_spark.datagen import write_tokens
    from scripts.make_pyfiles import build

    zip_path = build(str(tmp_path / "covsar_spark.zip"))
    tokens = str(tmp_path / "tokens")
    write_tokens(tokens, 2000, seed=42)
    out = str(tmp_path / "out")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_flagship.py"),
            "--tokens", tokens,
            "--out", out,
            "--tiers", "1m,1h",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # clean cwd: the repo is NOT importable here
        timeout=300,
        env=env,
    )
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON summary; stderr tail: {r.stderr[-1500:]}"
    summary = json.loads(lines[-1])
    assert summary["points"] > 0
    # every advertised output tree exists and reads back
    for sub in ("tier_1m", "tier_1h", "chunks_1m", "chunks_1h", "timeseries_1m"):
        assert os.path.isdir(os.path.join(out, sub)), sub
