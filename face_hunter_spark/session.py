"""SparkSession factory with scale-oriented defaults.

Tuned for the target deployment (1000-executor cluster over ~100 TB)
but parameterized so local test runs (local[32], 128 GiB single JVM)
use the same code path.  Key choices:

* AQE on: runtime shuffle-partition coalescing, auto broadcast-join
  demotion/promotion, and skew-join splitting — the reference handles
  skew by hand (salting is still applied for groupBy aggs, see
  operators/skew.py; AQE only fixes *join* skew).
* Arrow on: every pandas UDF / mapInPandas exchange is Arrow-batched;
  ``maxRecordsPerBatch`` plays the role of the reference's 128-frame
  detection batch (face_recognition.py:85).
* Shuffle partitions default to 2×cores locally; on a real cluster the
  submitter sets this to ~2-3× total cores (spark-submit --conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "face-hunter-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 2048,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    # pin per-task BLAS/OpenMP to 1 thread: the task is Spark's unit of
    # parallelism, and N workers x M BLAS threads oversubscribes cores
    # (SURVEY.md §4 "intra-op parallelism").  Set in the driver env so
    # forked local-mode Python workers inherit it; executorEnv covers
    # real clusters.
    _thread_vars = ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                    "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS")
    for var in _thread_vars:
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows)
        )
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: keep the UI off and the JVM quiet
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for var in _thread_vars:
        # propagate the (possibly user-exported) driver value so local
        # and cluster executors behave identically
        builder = builder.config(
            f"spark.executorEnv.{var}", os.environ[var]
        )
    if shuffle_partitions is None:
        # sensible local default; cluster submitters override
        shuffle_partitions = 32
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions)
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
