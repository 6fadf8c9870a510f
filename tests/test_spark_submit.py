"""End-to-end ``spark-submit --py-files`` launch smoke test.

The north rule requires the full job to launch via ``spark-submit
--py-files`` on multi-executor clusters.  Every ``jobs/*.py`` documents
that invocation, but the rest of the suite drives the library through an
in-process SparkSession — this test shells out to the real launcher:

* packages the engine with ``jobs/make_pyfiles.py`` (the artifact a
  cluster deploy would ship),
* copies ONLY the thin job script into an empty working directory (so
  every ``face_hunter_spark.*``/``__spark_entry__`` import must resolve
  from the zip, exactly as on an executor that never saw the source
  tree), and
* runs the link job end-to-end on the sf0.001 driver corpus, asserting
  the committed triple snapshot and the printed stats line.

Reference parity: the reference's README launch path is ``python cli.py
link ...`` on one node (cli.py:149-212); the Spark-native analogue is
this spark-submit form.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

pytestmark = [pytest.mark.spark, pytest.mark.slow]


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_link_job(tmp_path, spark):
    sys.path.insert(0, os.path.join(ROOT, "jobs"))
    try:
        import make_pyfiles
    finally:
        sys.path.pop(0)
    zip_path = make_pyfiles.build(str(tmp_path / "dist"))
    assert os.path.exists(zip_path)

    # Bare working dir: only the job script, no package source on disk.
    workdir = tmp_path / "launch"
    workdir.mkdir()
    shutil.copy(os.path.join(ROOT, "jobs", "link_job.py"), workdir)
    catalog_root = str(tmp_path / "kg_out")

    env = dict(os.environ)
    # Ensure the source tree cannot leak onto the import path.
    env.pop("PYTHONPATH", None)

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "link_job.py",
            "--documents", os.path.join(SF_DIR, "documents.parquet"),
            "--catalog-root", catalog_root,
            "--n-entities", "20",
            "--run-id", "submit-smoke",
        ],
        cwd=str(workdir),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # The job prints exactly one JSON stats line on stdout.
    stats_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert stats_lines, proc.stdout[-4000:]
    stats = json.loads(stats_lines[-1])
    assert stats["run_id"] == "submit-smoke"
    assert stats["n_triples"] > 0

    # The committed snapshot is readable back through the catalog with a
    # fresh in-process session (proves on-disk layout, not just stdout).
    from face_hunter_spark.catalog import ParquetCatalog

    triples = ParquetCatalog(catalog_root).read(spark, "triples")
    n = triples.count()
    assert n == stats["n_triples"]
    assert set(triples.columns) >= {"subj", "pred", "obj"}
