"""Blocking stage tests: salted DF counts, block cap, key families, pair
generation determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from crocodile_spark.config import PipelineConfig
from crocodile_spark.operators.blocking import (
    block,
    cap_blocks,
    generate_pairs,
    minhash_signature,
    salted_count,
)
from crocodile_spark.operators.normalize_stage import normalize_pages


def test_salted_count_matches_plain_count(spark):
    df = spark.createDataFrame(
        [("k1",)] * 100 + [("k2",)] * 3 + [("k3",)] * 1, ["key"]
    )
    got = {r["key"]: r["count"] for r in salted_count(df, "key").collect()}
    assert got == {"k1": 100, "k2": 3, "k3": 1}


def test_cap_blocks_drops_oversized(spark):
    cfg = PipelineConfig(max_block_size=4)
    rows = [("hot", f"u{i}") for i in range(10)] + [("cold", "a"), ("cold", "b")]
    keys = spark.createDataFrame(rows, ["key", "url"])
    got = cap_blocks(keys, cfg).select("key").distinct().collect()
    assert {r["key"] for r in got} == {"cold"}


def test_generate_pairs_orientation_and_dedup(spark):
    cfg = PipelineConfig(shuffle_partitions=4)
    keys = spark.createDataFrame(
        [("k", "b"), ("k", "a"), ("k", "c"), ("j", "a"), ("j", "b")],
        ["key", "url"],
    )
    pairs = generate_pairs(keys, cfg).collect()
    got = {(r["url_a"], r["url_b"]) for r in pairs}
    # a<b ordering, (a,b) appears once despite two shared keys
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}


def test_minhash_identical_strings_share_signature(spark):
    df = spark.createDataFrame(
        [("same text here", "same text here", "other wording entirely")],
        ["a", "b", "c"],
    )
    row = df.select(
        minhash_signature(F.col("a"), 8).alias("sa"),
        minhash_signature(F.col("b"), 8).alias("sb"),
        minhash_signature(F.col("c"), 8).alias("sc"),
    ).collect()[0]
    assert row["sa"] == row["sb"]
    assert row["sa"] != row["sc"]
    assert len(row["sa"]) == 8


def test_block_stage_recall_on_corpus(spark, corpus_dfs):
    """Every same-entity page pair should share at least one block key
    (recall of the blocking stage on the planted clusters)."""
    wp, _, gold = corpus_dfs
    cfg = PipelineConfig(shuffle_partitions=4)
    records = normalize_pages(wp, use_html=True)
    sigs, pairs = block(records, cfg)
    pos = gold.where(F.col("label") == 1)
    covered = pos.join(pairs, ["url_a", "url_b"], "left_semi").count()
    total = pos.count()
    assert covered / total > 0.95, f"blocking recall {covered}/{total}"
