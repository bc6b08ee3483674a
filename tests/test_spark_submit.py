"""north_rule literal: "the job runs via spark-submit --py-files".

Packages fever_spark into a zip, then launches a REAL `spark-submit
--py-files fever_spark.zip` subprocess whose driver script imports the
library ONLY from the zip (cwd=/tmp, no repo on sys.path) and runs the
build→merge→estimate pipeline plus a checkpointed SketchJob.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_SCRIPT = """
import json, sys
import fever_spark  # resolved from the --py-files zip
from pyspark.sql import SparkSession, functions as F
from fever_spark.ops import SketchSpec, build_sketches, two_level_merge, hll_estimate_col
from fever_spark.jobs.sketch_job import run_sketch_job

spark = (SparkSession.builder.appName("submit_smoke")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
pages_dir, ckpt = sys.argv[1], sys.argv[2]

merged = two_level_merge(build_sketches(
    spark.read.parquet(pages_dir), ["lang"],
    [SketchSpec("u", "hll", "url", {"p": 12})]), ["lang"])
est = {r["lang"]: r["e"] for r in
       merged.withColumn("e", hll_estimate_col("state"))
       .select("lang", "e").collect()}

final = run_sketch_job(spark, pages_dir, ckpt, ["lang"],
                       [SketchSpec("u", "hll", "url", {"p": 12})],
                       files_per_chunk=2)
print("RESULT " + json.dumps({"langs": sorted(est),
                              "module": fever_spark.__file__,
                              "job_rows": final.count()}))
spark.stop()
"""


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "fever_spark.zip")
    src = os.path.join(REPO, "fever_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(src):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.slow
def test_spark_submit_py_files(spark, tmp_path):
    # input data written with the session fixture, read by the subprocess
    from fever_spark.sources.synth import synth_pages_df

    pages_dir = str(tmp_path / "pages")
    synth_pages_df(spark, 4000, partitions=4).write.parquet(pages_dir)

    zpath = _zip_package(str(tmp_path))
    script = tmp_path / "driver.py"
    script.write_text(DRIVER_SCRIPT)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]", "--py-files", zpath,
         str(script), pages_dir, str(tmp_path / "ckpt")],
        capture_output=True, text=True, timeout=420, cwd="/tmp", env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")][-1]
    res = json.loads(line[len("RESULT "):])
    # library really came from the zip, not the repo checkout
    assert "fever_spark.zip" in res["module"], res["module"]
    assert res["langs"] == ["de", "en", "es", "fr", "ru", "zh"]
    assert res["job_rows"] == 6
    # checkpoint manifest written by the submitted job
    man = json.load(open(tmp_path / "ckpt" / "manifest.json"))
    assert man["completed"] and len(man["chunks"]) == 2
