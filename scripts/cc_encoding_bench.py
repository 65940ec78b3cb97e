#!/usr/bin/env python
"""Evidence for the r4 CC dictionary-encoding change (VERDICT r3 #5):
run connected_components over the SAME synthetic string-edge graph with
and without dictionary encoding and report wall time plus total shuffle
read/write bytes (from the Spark REST status API), which the encoding is
meant to shrink -- every star round shuffles 8-byte longs instead of full
url strings.

Usage: python scripts/cc_encoding_bench.py [n_nodes] [chain_len]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def shuffle_totals(ui_port: int = 4040) -> tuple[int, int]:
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=10)
    )
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return r, w


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from crocodile_spark.operators.clustering import connected_components
    from crocodile_spark.session import get_spark

    spark = get_spark(
        app_name="cc-encoding-bench",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "true"},
    )

    # chain components over LONG url-like string ids (the web-scale shape:
    # ids are full urls, ~70 chars)
    url = F.concat(
        F.lit("https://content-archive.example.org/crawl/2026/segment-"),
        F.lpad((F.col("id") / chain).cast("long").cast("string"), 7, "0"),
        F.lit("/page-"),
        F.lpad((F.col("id") % chain).cast("string"), 4, "0"),
    )
    nxt = F.concat(
        F.lit("https://content-archive.example.org/crawl/2026/segment-"),
        F.lpad((F.col("id") / chain).cast("long").cast("string"), 7, "0"),
        F.lit("/page-"),
        F.lpad(((F.col("id") % chain) + 1).cast("string"), 4, "0"),
    )
    edges = (
        spark.range(n_nodes)
        .where((F.col("id") % chain) < chain - 1)
        .select(url.alias("u"), nxt.alias("v"))
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()

    results = {}
    for mode, encode in (("string_ids", False), ("dict_encoded", True)):
        r0, w0 = shuffle_totals()
        t0 = time.time()
        out = connected_components(edges, max_iterations=20, encode_ids=encode)
        n_assign = out.count()
        n_clusters = out.select("cluster_id").distinct().count()
        wall = time.time() - t0
        r1, w1 = shuffle_totals()
        results[mode] = {
            "wall_sec": round(wall, 2),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 2),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
            "assignments": n_assign,
            "clusters": n_clusters,
        }

    assert (
        results["string_ids"]["assignments"] == results["dict_encoded"]["assignments"]
    )
    assert results["string_ids"]["clusters"] == results["dict_encoded"]["clusters"]
    print(
        json.dumps(
            {"n_nodes": n_nodes, "n_edges": n_edges, "chain_len": chain, **results}
        )
    )


if __name__ == "__main__":
    main()
