"""SparkSession factory tuned for this engine.

Local-mode defaults follow the public Spark tuning guidance: shuffle
partitions ~ cores, AQE on (runtime coalesce + skew-join), Arrow enabled for
pandas-UDF batches, UTC session timezone so DuckDB oracle comparisons are
stable.
"""

from __future__ import annotations

import os

import pandas as pd  # module-level so pandas_udf type hints resolve

from pyspark.sql import SparkSession


def _package_parent() -> str:
    """Directory containing the crocodile_spark package (repo root)."""
    import crocodile_spark

    return os.path.dirname(os.path.dirname(os.path.abspath(crocodile_spark.__file__)))


def get_spark(
    app_name: str = "croco-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = os.cpu_count() or 8
    # Executor python workers must be able to unpickle our pandas UDFs even
    # when the driver script runs from another cwd. On a real cluster this
    # is `spark-submit --py-files`; locally we put the repo root on the
    # worker PYTHONPATH.
    pkg_root = _package_parent()
    env_pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in env_pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{env_pp}" if env_pp else pkg_root
        )
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        # match parallelism to cores in local mode (not the 200 default)
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cores if n in ("", "*") else int(n)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    # Shuffle files on tmpfs when available: local-mode shuffles are
    # disk-bound on the default /tmp block device. (On a real cluster the
    # equivalent is fast local SSD / disaggregated shuffle service.)
    shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    try:
        os.makedirs(shm, exist_ok=True)
        b = b.config("spark.local.dir", shm)
    except OSError:
        pass
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _prewarm_python_workers(spark)
    return spark


def _prewarm_python_workers(spark: SparkSession) -> None:
    """Fork the Python UDF daemon + one worker per task slot at session
    build, so the FIRST pandas-UDF query does not pay the fork/import cost
    (pyarrow+pandas import is ~1-2 s across a 32-slot local master). The
    production analog is executor warmup; workers are reused afterwards
    (spark.python.worker.reuse default). Guarded by
    ``spark.croco.prewarmPython`` (default true); failures are benign --
    the first real UDF job simply pays the fork as before."""
    try:
        if (
            str(spark.conf.get("spark.croco.prewarmPython", "true")).lower()
            != "true"
        ):
            return
        import pandas as _pd  # noqa: F401  (driver side, already imported)
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        @F.pandas_udf(T.LongType())
        def _noop(x: pd.Series) -> pd.Series:
            return x

        n = spark.sparkContext.defaultParallelism
        spark.range(0, n, 1, n).select(_noop("id")).write.format("noop").mode(
            "overwrite"
        ).save()
        # touch the parquet reader+writer once: Hadoop FS / parquet-mr
        # class-init otherwise lands on the session's FIRST real parquet
        # query (~0.8 s, measured). Session-private path, removed after.
        import shutil
        import tempfile

        pq = tempfile.mkdtemp(prefix="croco_pq_warm_")
        try:
            spark.range(1).write.mode("overwrite").parquet(pq)
            spark.read.parquet(pq).collect()
        finally:
            shutil.rmtree(pq, ignore_errors=True)
    except Exception:
        pass  # warmup must never break session creation
