"""Tabular sources & sinks (SURVEY.md section 2.1).

- S1 CSV scan: the reference streams pd.read_csv in 2048-row chunks
  (crocodile/crocodile.py:199,234-248); Spark's distributed CSV reader
  subsumes chunking. The <=1024-row classification sample (M2 input) is
  ``df.limit(1024)``.
- S2 in-memory DataFrame source (crocodile/crocodile.py:193-197): Arrow
  createDataFrame.
- S8 CSV sink (crocodile/crocodile.py:477-494): distributed write; the
  reference's single-file append mode maps to ``coalesce(1)`` on request.
- S10 gold CEA scan (training/onboard_data.py:85-93): headerless
  (table, row 1-based, col, entity url) with F12 QID extraction.
- S11 training-sample export (training/export_training.py:38-75).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crocodile_spark.functions.normalize import qid_from_url


def read_input_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    sample_rows: int = 1024,
) -> tuple[DataFrame, DataFrame]:
    """S1: CSV scan + the classification sample.

    Returns (full df, head sample). Schema inference is avoided when a
    schema is given (production posture); header row expected like the
    reference's pandas reader.
    """
    reader = spark.read.option("header", "true")
    df = (reader.schema(schema) if schema else reader.option("inferSchema", "true")).csv(
        path
    )
    return df, df.limit(sample_rows)


def read_pandas(spark: SparkSession, pdf: pd.DataFrame, schema=None) -> DataFrame:
    """S2: in-memory pandas source (Arrow-accelerated)."""
    return spark.createDataFrame(pdf, schema=schema)


def json_rows_to_input_rows(
    spark: SparkSession,
    header: list[str],
    rows: list[dict],
    client_id: str = "c1",
    dataset_name: str = "ds1",
    table_name: str = "t1",
) -> DataFrame:
    """S3 JSON rows ingest, REST-body form: ``{header, data: [{col->val}]}``
    -> the canonical input_rows shape (data array<string> in header order,
    sequential row_id), mirroring backend/app/endpoints/crocodile_api.py:
    39-115 + data_service.py:164-186. Missing columns -> null; NaN/Inf
    scrubbed to null (F11 law, backend/app/services/utils.py:10-30).

    The REST body is driver-side by nature (like the reference's request
    handler); for data-scale JSON use ``parse_json_rows`` over a
    distributed string column instead.
    """
    import math

    def scrub(v):
        if v is None:
            return None
        if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
            return None
        return str(v)

    payload = [
        (client_id, dataset_name, table_name, i, [scrub(r.get(c)) for c in header])
        for i, r in enumerate(rows)
    ]
    schema = T.StructType(
        [
            T.StructField("client_id", T.StringType(), False),
            T.StructField("dataset_name", T.StringType(), False),
            T.StructField("table_name", T.StringType(), False),
            T.StructField("row_id", T.IntegerType(), False),
            T.StructField("data", T.ArrayType(T.StringType()), True),
        ]
    )
    return spark.createDataFrame(payload, schema)


def parse_json_rows(df: DataFrame, header: list[str], json_col: str = "json") -> DataFrame:
    """S3, distributed form: a string column of JSON objects {col->val} ->
    ``data array<string>`` in header order (missing keys -> null). The JSON
    never reaches the driver; from_json is JVM-side."""
    schema = T.StructType([T.StructField(c, T.StringType(), True) for c in header])
    parsed = df.withColumn("_r", F.from_json(F.col(json_col), schema))
    # getField, not F.col(f"_r.{c}"): header names may contain dots
    return parsed.withColumn(
        "data", F.array(*[F.col("_r").getField(c) for c in header])
    ).drop("_r")


def export_csv_stream(df: DataFrame, batch_rows: int = 256):
    """S9 streaming enriched-CSV export (crocodile_api.py:1581-1656): a
    generator of CSV text chunks (header first), bounded driver memory via
    toLocalIterator -- the serving-side artifact stream, not an engine op.
    """
    import csv
    import io

    cols = df.columns

    def chunks():
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(cols)
        n = 0
        for row in df.toLocalIterator():
            w.writerow(["" if row[c] is None else row[c] for c in cols])
            n += 1
            if n >= batch_rows:
                yield buf.getvalue()
                buf.seek(0)
                buf.truncate(0)
                n = 0
        if buf.tell():
            yield buf.getvalue()

    return chunks()


def export_csv(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    single_file_row_bound: int = 1_000_000,
    row_count: int | None = None,
) -> None:
    """S8: CSV sink with header; ``single_file`` mirrors the reference's
    one-growing-file behavior (one task writes everything -- only for
    human-sized exports).

    Scale guard (r4): ``single_file=True`` counts the frame first and
    raises when it exceeds ``single_file_row_bound`` rather than silently
    serializing a 100x table through one task; callers that genuinely want
    a giant single file raise the bound explicitly. Callers that already
    know the row count pass ``row_count`` so the guard does not re-execute
    the upstream plan."""
    if single_file:
        n = row_count if row_count is not None else df.count()
        if n > single_file_row_bound:
            raise ValueError(
                f"export_csv(single_file=True): {n} rows exceeds the "
                f"single-file bound {single_file_row_bound}; write "
                "distributed (single_file=False) or raise "
                "single_file_row_bound explicitly"
            )
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


GOLD_CEA_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType()),
        T.StructField("row_id_1based", T.IntegerType()),
        T.StructField("col_id", T.IntegerType()),
        T.StructField("entity_url", T.StringType()),
    ]
)


def read_gold_cea(spark: SparkSession, path: str) -> DataFrame:
    """S10: headerless CEA gold CSV -> (table_name, row_id 0-based, col_id,
    qid). Row ids are 1-based in the file (data starts at spreadsheet row
    2, training/onboard_data.py:89) and QID is the URL's last path segment
    (F12)."""
    raw = spark.read.schema(GOLD_CEA_SCHEMA).csv(path)
    return raw.select(
        "table_name",
        (F.col("row_id_1based") - 1).alias("row_id"),
        "col_id",
        qid_from_url(F.col("entity_url")).alias("qid"),
    )


def write_training_samples(ranked: DataFrame, cfg, path: str) -> None:
    """S11: per-candidate training rows (3dp features + binary target) to
    CSV."""
    from crocodile_spark.operators.el import training_export

    export_csv(training_export(ranked, cfg), path)
