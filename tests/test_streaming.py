"""Streaming ingest test: parquet-backed stream through the normalize
stage with exactly-once file sink, plus idempotent restart."""

from __future__ import annotations

import os

from crocodile_spark.streaming.incremental import start_ingest


def test_streaming_ingest_exactly_once(spark, corpus_dfs, tmp_path):
    wp, _, _ = corpus_dfs
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    wp.select("url", "warc_ts", "html", "text", "lang").write.parquet(src)
    n = wp.count()

    q = start_ingest(spark, src, out, chk, use_html=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == n
    assert {"url", "tokens", "row_hash", "text_norm", "host"} <= set(got.columns)

    # restart with same checkpoint: no new files to process -> no duplicates
    q2 = start_ingest(spark, src, out, chk, use_html=True)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == n
    assert os.path.exists(chk)


def test_streaming_dedup_within_watermark(spark, corpus_dfs, tmp_path):
    """Stateful exact-dedup across micro-batches: a re-crawl of the same
    text (same row_hash) inside the watermark window is dropped."""
    from crocodile_spark.streaming.incremental import (
        dedup_stream,
        normalize_stream,
    )
    from pyspark.sql import functions as F

    wp, _, _ = corpus_dfs
    src = str(tmp_path / "in2")
    out = str(tmp_path / "out2")
    chk = str(tmp_path / "chk2")
    base = wp.select("url", "warc_ts", "html", "text", "lang").limit(40).cache()
    # batch 1: originals; batch 2: the same texts re-crawled minutes later
    base.write.parquet(src + "/b1")
    base.withColumn("url", F.concat(F.col("url"), F.lit("/recrawl"))).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 5 MINUTES")
    ).write.parquet(src + "/b2")

    records = normalize_stream(spark, src + "/*", use_html=True)
    deduped = dedup_stream(records, within="24 hours")
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n_hashes = base.count()  # distinct texts
    assert got.select("row_hash").distinct().count() == got.count()
    assert got.count() <= n_hashes  # every duplicate hash collapsed
    assert got.count() >= 1


def test_host_crawl_stats_state_across_batches(spark, corpus_dfs, tmp_path):
    """applyInPandasWithState: the per-host accumulator must carry state
    ACROSS micro-batches (maxFilesPerTrigger=1 forces multiple), ending at
    the exact per-host totals."""
    from pyspark.sql import functions as F

    from crocodile_spark.streaming.incremental import (
        WEB_PAGES_SCHEMA,
        host_crawl_stats,
    )
    from crocodile_spark.operators.normalize_stage import normalize_pages

    wp, _, _ = corpus_dfs
    src = str(tmp_path / "in3")
    base = wp.select("url", "warc_ts", "html", "text", "lang").limit(60).cache()
    # two files -> two micro-batches under maxFilesPerTrigger=1
    half_a = base.where(F.xxhash64("url") % 2 == 0)
    half_b = base.where(F.xxhash64("url") % 2 != 0)
    half_a.coalesce(1).write.parquet(src + "/f1")
    half_b.coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    stats = host_crawl_stats(normalize_pages(stream, use_html=True))
    q = (
        stats.writeStream.outputMode("update")
        .format("memory")
        .queryName("host_stats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per host = final cumulative count
    got = (
        spark.table("host_stats")
        .groupBy("host")
        .agg(F.max("pages_total").alias("total"))
    )
    expected = (
        normalize_pages(base, use_html=True).groupBy("host").count()
    )
    diff = got.join(expected, "host").where(F.col("total") != F.col("count"))
    assert expected.count() > 0
    assert diff.count() == 0
    assert got.count() == expected.count()
