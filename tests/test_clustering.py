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
