#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Also reports the north-rule throughput numbers (candidate pairs/sec and
records/sec through the full ER pipeline) inside "queries" as informational
keys prefixed with "_".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from crocodile_spark.config import PipelineConfig
    from crocodile_spark.pipeline import run_pipeline
    from crocodile_spark.plans.entry_queries import QUERIES, documents_as_web_pages
    from crocodile_spark.session import get_spark

    spark = get_spark(
        app_name="croco-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    # warm the JVM/codegen path once (excluded from timings)
    spark.range(1000).selectExpr("sum(id)").collect()

    # r3: the ANN and portable-dedup families are part of the timed total
    # (they were informational in r1/r2 -- regressions there now gate the
    # bench, per VERDICT r2 #7). Keys are unchanged for cross-round trends.
    headline = [
        "tpch_q1",
        "f6_f7_pair_similarity",
        "w2_topk_per_block",
        "a1_type_frequency",
        "a4_row_avg_confidence",
        "j4_m3_training_labels",
        "dedup_ngram_jaccard",
        "doc_fingerprint",
        "quality_score",
        "cosine_topk",
        "minhash_lsh_dedup",
        "simhash_dedup",
        "ivf_ann_cosine",
    ]

    timings: dict[str, float] = {}
    for name in headline:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # the production ANN path (single-pass multi-table LSH, Arrow matmul
    # buckets -- the driver query pins arrow=False for oracle parity, so
    # time the scale path directly); timed in the total since r3
    from pyspark.sql import functions as F

    from crocodile_spark.operators.similarity_search import lsh_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = e.where(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cv = e.select(F.col("vec_id").alias("cand_id"), "embedding")
    t0 = time.time()
    lsh_topk(qv, cv, k=5, arrow=True).write.format("noop").mode("overwrite").save()
    timings["ann_lsh_arrow"] = round(time.time() - t0, 3)

    # full ER pipeline (the flagship): time it and derive throughput
    wp = documents_as_web_pages(spark, sf_dir)
    n_records = wp.count()
    t0 = time.time()
    out = run_pipeline(spark, wp, PipelineConfig(shuffle_partitions=cpus), use_html=False)
    n_pairs = out.pairs.count()
    out.clusters.write.format("noop").mode("overwrite").save()
    er_wall = time.time() - t0
    timings["er_pipeline"] = round(er_wall, 3)
    timings["_er_records"] = n_records
    timings["_er_candidate_pairs"] = n_pairs
    timings["_er_pairs_per_sec"] = round(n_pairs / er_wall, 1) if er_wall > 0 else 0.0
    timings["_er_records_per_sec"] = round(n_records / er_wall, 1) if er_wall > 0 else 0.0

    # r4 regression gate (VERDICT r3 #8): compare per-query times against
    # the newest prior BENCH_r*.json and surface >2x slowdowns loudly --
    # in-round, not at judging. The delta table goes to stderr (stdout
    # stays the one-JSON-line driver contract); offenders also ride along
    # under the informational "_regressions" key.
    prev_file, prev_q = None, {}
    here = os.path.dirname(os.path.abspath(__file__))
    cands = sorted(f for f in os.listdir(here) if f.startswith("BENCH_r") and f.endswith(".json"))
    if cands:
        prev_file = cands[-1]
        try:
            with open(os.path.join(here, prev_file)) as fh:
                prev_q = json.load(fh).get("parsed", {}).get("queries", {})
        except Exception:
            prev_q = {}
    regressions = {}
    if prev_q:
        print(f"-- per-query delta vs {prev_file} --", file=sys.stderr)
        for name, cur in timings.items():
            if name.startswith("_") or name not in prev_q:
                continue
            old = prev_q[name]
            if not isinstance(old, (int, float)) or old <= 0:
                continue  # no comparable prior (and inf would break the
                # strict-JSON stdout contract via json.dumps' Infinity)
            ratio = cur / old
            flag = ""
            # the documented same-day VM noise band is ~2x on sub-second
            # fixed-overhead queries; flag real regressions only
            if ratio > 2.0 and cur - old > 1.0:
                flag = "  <<< REGRESSION"
                regressions[name] = {"prev": old, "cur": cur, "ratio": round(ratio, 2)}
            print(f"  {name:28s} {old:7.2f} -> {cur:7.2f}  ({ratio:4.2f}x){flag}",
                  file=sys.stderr)
    if regressions:
        timings["_regressions"] = regressions

    total = round(
        sum(v for k, v in timings.items()
            if not k.startswith("_") and isinstance(v, (int, float))),
        3,
    )
    print(
        json.dumps(
            {
                "metric": "headline-suite wall time (15 queries incl. full ER pipeline; ANN+portable-dedup timed since r3)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
