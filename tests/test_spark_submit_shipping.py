"""North-rule shipping shape, executed literally: zip the package, run
``spark-submit --py-files crocodile_spark.zip jobs/run_pipeline.py`` from a
NEUTRAL cwd with the job file copied outside the repo, so the engine code
reaches the workers only through the --py-files artifact."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest


@pytest.mark.slow
def test_spark_submit_py_files_end_to_end(spark, corpus_dfs, tmp_path):
    import pyspark

    spark_submit = os.path.join(pyspark.__path__[0], "bin", "spark-submit")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # ship artifact: the package zip (the reference ships --py-files too)
    zip_path = str(tmp_path / "crocodile_spark.zip")
    pkg = os.path.join(repo, "crocodile_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for base, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py") or f.endswith(".json"):
                    full = os.path.join(base, f)
                    zf.write(full, os.path.relpath(full, repo))

    # the job file copied OUTSIDE the repo: its sys.path tweak then points
    # at tmp, so crocodile_spark can only come from the --py-files zip
    job = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(repo, "jobs", "run_pipeline.py"), job)

    wp, _, _ = corpus_dfs
    src = str(tmp_path / "web_pages")
    out_dir = str(tmp_path / "lake")
    wp.select("url", "warc_ts", "html", "text", "lang").limit(300).write.parquet(src)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            job,
            "--input", src,
            "--output", out_dir,
            "--shuffle-partitions", "8",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    report = json.loads(res.stdout[res.stdout.index("{"):])
    from crocodile_spark.operators.normalize_stage import normalize_pages

    expected_records = normalize_pages(
        spark.read.parquet(src), use_html=True
    ).count()
    assert report["n_records"] == expected_records
    assert report["n_clusters"] >= 1
    assert {"records", "signatures", "pairs", "scored", "clusters"} == set(
        report["stages"]
    )
    # the lakehouse the job wrote is a valid resume point for THIS session
    clusters = spark.read.parquet(os.path.join(out_dir, "clusters"))
    assert clusters.count() == expected_records
