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

from crocodile_spark.plans.entry_queries import (  # noqa: E402
    ORACLES,
    QUERIES,
    q_er_pipeline_clusters,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Uses a private oracle dir so the smoke run can never clobber the
    parquet the correctness gate's er_pipeline_clusters oracle reads."""
    return q_er_pipeline_clusters(
        spark, "/root/testdata/sf0.001", oracle_dir="/tmp/croco_spark_er_entry"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per queries() key (omissions = rows-only)."""
    return dict(ORACLES)
