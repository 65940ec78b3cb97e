"""Stage 4 -- transitive clustering via large-star/small-star connected
components (SURVEY.md section 7.1 step 5; algorithm from the published
MapReduce CC literature -- alternating star operations, deterministic
cluster id = min member).

No GraphFrames dependency: a driver-side loop of joins/aggregations with a
cheap fixed-point check (row count + order-independent xxhash checksum) and
``localCheckpoint`` per round to cut lineage.

Node-id encoding (r4, the 10^12-node prerequisite this module's r3
docstring named): string node ids (urls) are DICTIONARY-ENCODED to longs
before the loop and decoded after. The dictionary is the distinct node
table, checkpointed, tagged with ``monotonically_increasing_id`` --
collision-free by construction (partition_id << 33 | position), no count
job, no giant map literal, no extra shuffle beyond the distinct the node
table needs anyway. Every CC round then shuffles 8-byte keys instead of
full url strings (the loop's dominant shuffle bytes at web scale). The
final assignment re-derives cluster_id = min member URL per component, so
the output is byte-identical to the un-encoded form regardless of which
long ids the dictionary handed out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    min(neighborhood + self).

    r8: the output is NOT deduplicated here -- it is already canonically
    oriented by construction (u = v > m = v's neighborhood min), and the
    following ``_small_star`` ends in ``_canon`` anyway, so the extra
    distinct was one full exchange per round for nothing. Duplicate
    (v, m) rows are bounded by the input edge count (each input edge
    emits at most one row), collapse map-side in small-star's min
    aggregation, and are removed by its closing distinct -- assignments
    are identical (A/B-verified), one exchange per round cheaper."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_minv"))
        .select("u", F.least(F.col("u"), F.col("_minv")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


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


def _cc_loop(
    edges: DataFrame,
    max_iterations: int,
    pre_canonical: bool = False,
    prev: tuple[int, int] | None = None,
) -> DataFrame:
    """The raw alternating-star loop: edges(u, v) -> (node, cluster_id)
    with cluster_id = min member under the node type's natural order.
    ``pre_canonical``: the input is already oriented/distinct/checkpointed;
    ``prev``: its (count, checksum) if the caller already computed it, so
    the fixed-point scan is not re-run on the identical frame."""
    if pre_canonical:
        e = edges
    else:
        e = _canon(edges).localCheckpoint(eager=False)
    if prev is None:
        prev = _checksum(e)
    for _ in range(max_iterations):
        # lazy checkpoint + checksum = ONE job per round: the checksum scan
        # materializes the checkpoint as it runs (r8; eager=True spent a
        # separate materialization job per round before the checksum job)
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    # converged: every edge is (member, root)
    members = e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("node"), F.col("v").alias("cluster_id")).distinct()
    return members.union(roots).distinct()


def encode_node_dictionary(edges: DataFrame) -> DataFrame:
    """(node, nid) dictionary over every node appearing in the edge set.

    ``monotonically_increasing_id`` over the CHECKPOINTED distinct node
    table: unique by construction, stable across the encode and decode
    joins because the input partitions are frozen first. Ids are sparse,
    which CC never cares about -- it needs only uniqueness and a total
    order."""
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    return nodes.withColumn("nid", F.monotonically_increasing_id())


# Below this edge count the ~5 extra encode/decode shuffles cost more than
# long-key star rounds save; the probe is free because the canonical edge
# set's checksum (needed for the fixed-point check anyway) carries the count.
CC_ENCODE_MIN_EDGES = 100_000


def connected_components(
    edges: DataFrame, max_iterations: int = 20, encode_ids: bool | None = None
) -> DataFrame:
    """edges(u, v) -> assignments(node, cluster_id) with cluster_id = min
    member of the component. Nodes appearing in no edge are absent (the
    caller unions singletons).

    ``encode_ids`` (default: auto -- on for string node ids once the
    canonical edge set reaches CC_ENCODE_MIN_EDGES): run the star loop
    over dictionary-encoded longs and decode afterwards; the returned
    cluster_id is the min member in the ORIGINAL id space either way, so
    callers and oracles see identical output at any threshold."""
    e = _canon(edges).localCheckpoint(eager=False)  # materialized by _checksum
    chk = _checksum(e)
    if encode_ids is None:
        encode_ids = (
            isinstance(e.schema["u"].dataType, T.StringType)
            and chk[0] >= CC_ENCODE_MIN_EDGES
        )
    if not encode_ids:
        # pass the checksum through: the probe scan doubles as the loop's
        # initial fixed-point state
        return _cc_loop(e, max_iterations, pre_canonical=True, prev=chk)

    node_dict = encode_node_dictionary(e)
    enc = (
        e.join(
            node_dict.select(F.col("node").alias("u"), F.col("nid").alias("_eu")), "u"
        )
        .join(
            node_dict.select(F.col("node").alias("v"), F.col("nid").alias("_ev")), "v"
        )
        .select(F.col("_eu").alias("u"), F.col("_ev").alias("v"))
    )
    assign_l = _cc_loop(enc, max_iterations)
    # decode: long -> original id, then re-derive the representative as the
    # min ORIGINAL id per component (the long-space min is an arbitrary
    # member under the dictionary's id assignment)
    dec = assign_l.join(
        node_dict.select(F.col("nid").alias("node"), F.col("node").alias("_orig")),
        "node",
    ).select(F.col("_orig").alias("node"), "cluster_id")
    rep = dec.groupBy("cluster_id").agg(F.min("node").alias("_rep"))
    return dec.join(rep, "cluster_id").select(
        "node", F.col("_rep").alias("cluster_id")
    )


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
