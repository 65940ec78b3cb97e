"""Incremental normalize-stage ingest via Structured Streaming.

``readStream`` over a web_pages directory -> the same frozen normalization
laws as the batch stage (the transformation is stateless, row-local) ->
``writeStream`` appending to the records table with exactly-once file-sink
semantics (checkpointLocation). Event-time windowed counts over warc_ts
(with a watermark for late crawls) feed the ingest-rate metrics table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crocodile_spark.operators.normalize_stage import normalize_pages

WEB_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def normalize_stream(
    spark: SparkSession, input_dir: str, use_html: bool = True
) -> DataFrame:
    """Streaming DataFrame of normalized records from a web_pages dir."""
    stream = (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    return normalize_pages(stream, use_html=use_html)


def ingest_rate(stream_records: DataFrame, window: str = "1 hour") -> DataFrame:
    """Event-time ingest counts with a 2-hour watermark for late crawls."""
    return (
        stream_records.withWatermark("warc_ts", "2 hours")
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


def dedup_stream(stream_records: DataFrame, within: str = "24 hours") -> DataFrame:
    """Stateful streaming exact-dedup: drop re-crawled duplicate texts (same
    F3 row hash) across micro-batches. State is bounded by the watermark --
    a duplicate arriving later than ``within`` after the original is kept
    (state for its hash has been evicted), the standard bounded-state
    tradeoff for infinite streams.
    """
    return stream_records.withWatermark("warc_ts", within).dropDuplicatesWithinWatermark(
        ["row_hash"]
    )


def host_crawl_stats(stream_records: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState: per
    host, a running (pages_total, first_ts, last_ts) accumulator that
    survives across micro-batches -- the crawl-budget counter a 100 TB
    ingest would use to throttle hot hosts. Arrow-batched; state is one
    tiny tuple per host.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "host string, pages_total long, first_ts timestamp, last_ts timestamp"
    )
    state_schema = "pages_total long, first_ts timestamp, last_ts timestamp"

    def update(key, pdfs, state: GroupState):
        total, first_ts, last_ts = (
            state.get if state.exists else (0, None, None)
        )
        for pdf in pdfs:
            total += len(pdf)
            ts = pd.to_datetime(pdf["warc_ts"])
            if len(ts):
                mn, mx = ts.min(), ts.max()
                first_ts = mn if first_ts is None else min(first_ts, mn)
                last_ts = mx if last_ts is None else max(last_ts, mx)
        state.update((total, first_ts, last_ts))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "pages_total": [total],
                "first_ts": [first_ts],
                "last_ts": [last_ts],
            }
        )

    return (
        stream_records.groupBy("host")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    use_html: bool = True,
):
    """Start the append-only ingest query (exactly-once via checkpoint)."""
    records = normalize_stream(spark, input_dir, use_html=use_html)
    return (
        records.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
