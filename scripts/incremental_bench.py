#!/usr/bin/env python
"""Incremental-ER scale evidence: resolve a delta against a resolved base
corpus and compare against the full batch re-run on the union.

The claim under test is the 10^12-doc operating-mode claim: incremental
cost tracks the DELTA (plus a linear signature re-aggregation), not the
corpus, while producing the identical cluster partition. Reports walls,
delta-touching pair counts vs full pair counts, F1 of both paths, and a
partition-equality check.

Usage: python scripts/incremental_bench.py [n_entities] [pages] [delta_frac_denom]
  (defaults 13230 8 5 -> 111k records, ~20% delta by url hash)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 13230
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    denom = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import functions as F

    from crocodile_spark.config import PipelineConfig
    from crocodile_spark.datagen import corpus_to_spark, make_corpus
    from crocodile_spark.operators.incremental_er import incremental_er
    from crocodile_spark.pipeline import evaluate_pairwise_f1, run_pipeline
    from crocodile_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(
        app_name=f"incremental-bench-{n_entities}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 3,
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    corpus = make_corpus(
        n_entities=n_entities, pages_per_entity=pages, seed=42,
        filler_range=(40, 120),
    )
    wp, kb, gold = corpus_to_spark(spark, corpus)
    wp = wp.repartition(cores * 3).persist()
    n_records = wp.count()

    cfg = PipelineConfig(shuffle_partitions=cores * 3)
    is_new = F.pmod(F.xxhash64("url"), F.lit(denom)) == 0
    old_wp = wp.where(~is_new).persist()
    new_wp = wp.where(is_new).persist()
    n_old, n_new = old_wp.count(), new_wp.count()

    # base resolution (not timed against the comparison -- it exists
    # already in the incremental operating model), including the FULL
    # stored state a production deployment persists with it: static
    # blocking keys, the signature table, the (token, df) aggregate and
    # the record count (r6 -- removes the union re-aggregation floor)
    from crocodile_spark.operators.blocking import (
        static_keys,
        token_document_frequencies,
    )

    base = run_pipeline(spark, old_wp, cfg)
    base.clusters.persist().count()
    base.records.persist().count()
    base.signatures.persist().count()
    stored_keys = static_keys(base.signatures, cfg).persist()
    stored_keys.count()
    stored_token_df = token_document_frequencies(base.records, cfg).persist()
    stored_token_df.count()

    # incremental path: delta vs resolved base + stored state
    t0 = time.time()
    inc = incremental_er(
        spark, base.records, base.clusters, new_wp, cfg,
        existing_static_keys=stored_keys,
        existing_signatures=base.signatures,
        existing_token_df=stored_token_df,
        existing_n_records=n_old,
    )
    inc.clusters.write.format("noop").mode("overwrite").save()
    t_inc = time.time() - t0
    inc_pairs = inc.pairs.count()

    # full batch on the union
    t0 = time.time()
    full = run_pipeline(spark, wp, cfg)
    full.clusters.write.format("noop").mode("overwrite").save()
    t_full = time.time() - t0
    full_pairs = full.pairs.count()

    # equivalence + quality
    def partition_checksum(cl):
        # order-insensitive checksum of the (url -> cluster) partition
        return cl.select(
            F.bit_xor(F.xxhash64(F.concat_ws("\x00", "url", "cluster_id")))
        ).collect()[0][0]

    same_partition = partition_checksum(inc.clusters) == partition_checksum(
        full.clusters
    )
    # Divergence diagnosis. The DOMINANT direction at scale is incremental
    # retaining merges the from-scratch union run no longer re-derives:
    # for corpora past frac*N > max_block_size, tok-block eligibility is
    # just df <= cap, and df only grows as records are added, so tok
    # blocks (hence base edges) can only disappear under recompute. Two
    # second-order sources CAN go the other way -- k-rarest truncation
    # order shifting a token INTO an old record's block_tokens under
    # union DFs, and old-old pair scores drifting under union signatures
    # -- so refinement is MEASURED here, not assumed: full_refines_
    # incremental is True iff every full-batch cluster maps into exactly
    # one incremental cluster (pure retention; False would mean the
    # second-order sources manifested and the caveat section of
    # incremental_er.py applies).
    joined = (
        full.clusters.select("url", F.col("cluster_id").alias("cid_full"))
        .join(
            inc.clusters.select("url", F.col("cluster_id").alias("cid_inc")),
            "url",
        )
        .persist()
    )
    n_diff_urls = joined.where(F.col("cid_full") != F.col("cid_inc")).count()
    full_is_refinement = (
        joined.groupBy("cid_full")
        .agg(F.countDistinct("cid_inc").alias("n"))
        .where(F.col("n") > 1)
        .count()
        == 0
    )
    m_inc = evaluate_pairwise_f1(inc.clusters, gold, full.pairs)
    m_full = evaluate_pairwise_f1(full.clusters, gold, full.pairs)

    report = {
        "records": n_records,
        "base_records": n_old,
        "delta_records": n_new,
        "delta_frac": round(n_new / n_records, 3),
        "incremental_wall_s": round(t_inc, 2),
        "full_batch_wall_s": round(t_full, 2),
        "speedup": round(t_full / t_inc, 2),
        "delta_touching_pairs": inc_pairs,
        "full_pairs": full_pairs,
        "pair_frac": round(inc_pairs / full_pairs, 3),
        "partition_identical": bool(same_partition),
        "n_urls_assigned_differently": n_diff_urls,
        "full_refines_incremental": bool(full_is_refinement),
        "f1_incremental": round(m_inc["f1"], 4),
        "f1_full": round(m_full["f1"], 4),
        "cores": cores,
        "load_avg_1m": os.getloadavg()[0],
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
