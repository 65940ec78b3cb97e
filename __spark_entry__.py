"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end record-linkage pipeline
(normalize -> block -> score -> cluster) over the sf0.001 documents table.
``queries()``/``oracle_sql()`` expose one entry per implemented operator
family from SURVEY.md section 2, each DuckDB-checkable (see
crocodile_spark/plans/entry_queries.py for the parity rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from crocodile_spark.config import PipelineConfig  # noqa: E402
from crocodile_spark.pipeline import run_pipeline  # noqa: E402
from crocodile_spark.plans.entry_queries import ORACLES, QUERIES  # noqa: E402


def _documents_as_web_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's documents table to the web_pages input shape
    (BASELINE.json input_hint): url from (source, doc_id), no html payload."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.org/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.col("text"),
        F.col("lang"),
    )


def _er_pipeline_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    wp = _documents_as_web_pages(spark, sf_dir)
    out = run_pipeline(spark, wp, PipelineConfig(), use_html=False)
    sizes = out.clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return out.clusters.join(sizes, "cluster_id").select("url", "cluster_id", "cluster_size")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _er_pipeline_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    q = dict(QUERIES)
    # full-pipeline entry: clustering is iterative (not single-statement
    # SQL-expressible) -> rows-only check, by design
    q["er_pipeline_clusters"] = _er_pipeline_clusters
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per queries() key (omissions = rows-only)."""
    return dict(ORACLES)
