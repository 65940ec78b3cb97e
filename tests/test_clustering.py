"""Connected-components fixtures (FIXTURES.md section 7): chain, star, two
components joined by one edge, singleton handling, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from crocodile_spark.operators.clustering import cluster_records, connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["u", "v"])
    rows = connected_components(df).collect()
    return {r["node"]: r["cluster_id"] for r in rows}


def test_chain(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_star(spark):
    got = _cc(spark, [("m", "a"), ("m", "b"), ("m", "c")])
    assert got == {"m": "a", "a": "a", "b": "a", "c": "a"}


def test_two_components_bridged(spark):
    got = _cc(spark, [("a", "b"), ("c", "d"), ("b", "c"), ("x", "y")])
    assert got["a"] == got["b"] == got["c"] == got["d"] == "a"
    assert got["x"] == got["y"] == "x"


def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [("a", "b"), ("b", "a"), ("a", "b")])
    assert got == {"a": "a", "b": "a"}


def test_self_loop_only_yields_nothing(spark):
    df = spark.createDataFrame([("a", "a")], ["u", "v"])
    assert connected_components(df).count() == 0


def test_cluster_records_singletons(spark):
    records = spark.createDataFrame([("u1",), ("u2",), ("u3",)], ["url"])
    scored = spark.createDataFrame(
        [("u1", "u2", True), ("u1", "u3", False)], ["url_a", "url_b", "is_edge"]
    )
    got = {
        r["url"]: r["cluster_id"] for r in cluster_records(records, scored).collect()
    }
    assert got["u1"] == got["u2"] == "u1"
    assert got["u3"] == "u3"  # singleton clusters to itself


def test_long_chain_converges(spark):
    n = 40
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
    got = _cc(spark, edges)
    assert set(got.values()) == {"n000"}
    assert len(got) == n + 1


def test_dictionary_encoded_cc_matches_string_cc(spark):
    """r4: the long-encoded star loop must produce byte-identical
    assignments to the string loop (cluster_id = min member URL), at any
    encode threshold -- the auto mode only changes WHEN encoding kicks in,
    never the result."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(13)
    n, comp = 600, 40
    edges = []
    for i in range(n):
        a = rng.randrange(comp)
        edges.append((f"https://site-{a}.example/p{rng.randrange(50)}",
                      f"https://site-{a}.example/p{rng.randrange(50)}"))
    df = spark.createDataFrame(edges, "u string, v string")
    plain = connected_components(df, encode_ids=False)
    enc = connected_components(df, encode_ids=True)
    rp = sorted(map(tuple, plain.collect()))
    re_ = sorted(map(tuple, enc.collect()))
    assert rp == re_ and len(rp) > 0
    # every cluster_id is the lexicographic min of its members
    mins = (
        enc.groupBy("cluster_id").agg(F.min("node").alias("mn")).collect()
    )
    assert all(r["cluster_id"] == r["mn"] for r in mins)
