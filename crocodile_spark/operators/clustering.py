"""Stage 4 -- transitive clustering via large-star/small-star connected
components (SURVEY.md section 7.1 step 5; algorithm from the published
MapReduce CC literature -- alternating star operations, deterministic
cluster id = min member).

No GraphFrames dependency: a driver-side loop of joins/aggregations with a
cheap fixed-point check (row count + order-independent xxhash checksum) and
``localCheckpoint`` per round to cut lineage. Node ids are the record urls
(strings); min-comparison on strings is total and deterministic. At 10^12
nodes one would dictionary-encode urls to longs in a prior stage; the loop
itself is scale-oblivious -- every round is two shuffles on the node key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Orient edges u > v, drop self-loops, distinct."""
    u, v = F.col("u"), F.col("v")
    return (
        edges.select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node n: link every strictly-larger neighbor to
    min(neighborhood + self)."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_minv"))
        .select("u", F.least(F.col("u"), F.col("_minv")).alias("m"))
    )
    out = (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return _canon(out)


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node n (edges oriented n > v): link all small neighbors and
    n itself to the minimum small neighbor."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = edges.join(mins, "u").select(F.col("v").alias("n"), F.col("m"))
    selfs = mins.select(F.col("u").alias("n"), F.col("m"))
    out = nbrs.union(selfs).select(F.col("n").alias("u"), F.col("m").alias("v"))
    return _canon(out)


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """edges(u, v) -> assignments(node, cluster_id) with cluster_id = min
    member of the component. Nodes appearing in no edge are absent (the
    caller unions singletons)."""
    e = _canon(edges).localCheckpoint(eager=True)
    prev = _checksum(e)
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    # converged: every edge is (member, root)
    members = e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("node"), F.col("v").alias("cluster_id")).distinct()
    return members.union(roots).distinct()


def cluster_records(
    records: DataFrame,
    scored: DataFrame,
    threshold_col: str = "is_edge",
    max_iterations: int = 20,
) -> DataFrame:
    """Full stage 4: scored pairs -> entity_clusters(url, cluster_id).

    Singleton records (no accepted edge) become their own cluster.
    """
    edges = scored.where(F.col(threshold_col)).select(
        F.col("url_a").alias("u"), F.col("url_b").alias("v")
    )
    assign = connected_components(edges, max_iterations)
    out = (
        records.select(F.col("url"))
        .join(assign.withColumnRenamed("node", "url"), "url", "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col("url")))
    )
    return out
