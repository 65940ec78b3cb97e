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
