"""Real `spark-submit --py-files` launch of the CLI pipeline.

The north rule requires the job to launch via `spark-submit --py-files`;
this test exercises that path for real: build the reproducible zip
(tools/make_pyfiles.py), then run the actual spark-submit binary from a
scratch cwd with a PYTHONPATH-free environment, so `import
osmcoastline_spark` inside the app and its executors can resolve ONLY
from the --py-files artifact. Asserts the full pipeline runs, exits by
the reference's code contract, and commits manifested output tables.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not on host"
)
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from osmcoastline_spark.synth import synth_nodes_ways
    from tools.make_pyfiles import build

    nodes, ways = synth_nodes_ways(spark, 6, seed=3)
    nodes.write.parquet(str(tmp_path / "nodes.parquet"))
    ways.write.parquet(str(tmp_path / "ways.parquet"))

    zip_path = build(str(tmp_path / "osmcoastline_spark.zip"))
    # reproducibility: same tree -> same bytes
    again = build(str(tmp_path / "again.zip"))
    assert open(zip_path, "rb").read() == open(again, "rb").read()

    # the app file is a COPY of cli.py in the scratch dir: nothing about
    # the launch can accidentally resolve the package from the repo tree
    app = tmp_path / "app.py"
    shutil.copyfile(os.path.join(REPO, "osmcoastline_spark", "cli.py"), app)

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_TRACE")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.driver.memory=3g",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(app),
            "--nodes", str(tmp_path / "nodes.parquet"),
            "--ways", str(tmp_path / "ways.parquet"),
            "-o", str(out_dir),
            "--output-polygons", "land",
            "--water-cell-deg", "4.0",
        ],
        capture_output=True,
        text=True,
        cwd=tmp_path,
        env=env,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "There were 0 errors." in proc.stdout

    # committed, manifested output (CheckpointSink contract)
    land = out_dir / "land_polygons"
    assert (land / "_MANIFEST.json").exists(), os.listdir(out_dir)
    manifest = json.loads((land / "_MANIFEST.json").read_text())
    assert manifest["rows"] >= 6  # at least one land polygon per island
    meta = json.loads((out_dir / "meta.json").read_text())
    assert meta["stats"]["rings"] == 6  # one ring per synthesized island
