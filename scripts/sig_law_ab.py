#!/usr/bin/env python
"""Signature-law A/B (VERDICT r5 #2): attribute the er_pipeline wall delta
(9.09 s r4-law vs 12.51 s HEAD-law in r5's quiet windows) to the blocking
law change vs host weather, by running BOTH laws in the SAME session on the
IDENTICAL corpus, alternating (law A, law B, law A, law B, ...) and taking
best-per-law -- the protocol the scaling bench uses for the same reason
(the VM's throughput drifts between minutes).

Laws under test (both produce a signature table feeding the same
downstream pair/score/cluster stages):
  head -- the r5 law: relative-only DF cutoff, k-rarest struct truncation,
          separate block_tokens family (blocking.mention_signatures).
  r4   -- the pre-r5 law reimplemented inline: cutoff clamped by
          max_block_size, collect_set(token) signature, block_tokens ==
          sig_tokens. (Known to LOSE 1.5 F1 points at 529k -- kept here
          only as the cost yardstick, never as a code path.)

Reports, per law: best/median signature-stage wall (materialized alone)
and best full-pipeline wall, plus the law cost ratio.

Usage: python scripts/sig_law_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from crocodile_spark.config import PipelineConfig
    from crocodile_spark.operators.blocking import (
        cap_blocks,
        exact_dup_pairs,
        key_count,
        mention_signatures,
        static_keys,
        token_keys,
    )
    from crocodile_spark.operators.clustering import cluster_records
    from crocodile_spark.operators.normalize_stage import normalize_pages
    from crocodile_spark.operators.scoring import score
    from crocodile_spark.plans.entry_queries import documents_as_web_pages
    from crocodile_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="sig-law-ab", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    cfg = PipelineConfig(shuffle_partitions=cpus)
    wp = documents_as_web_pages(spark, sf_dir)
    records = normalize_pages(wp, use_html=False).persist()
    n_records = records.count()

    def sigs_r4(recs):
        # pre-r5 law, verbatim semantics (git 21ce58f^): clamped cutoff,
        # token-set signature, no rarity struct, block on the full sig
        import math

        cutoff = max(
            cfg.mention_df_floor,
            min(cfg.max_block_size, math.ceil(cfg.mention_df_fraction * n_records)),
        )
        tok = recs.select("url", F.explode("tokens").alias("token")).where(
            F.length("token") >= cfg.min_token_length
        )
        rare = key_count(tok, "token").where(F.col("count") <= cutoff).select("token")
        dist = tok.join(rare, "token", "inner").select("url", "token")
        sig = dist.groupBy("url").agg(
            F.array_sort(F.collect_set("token")).alias("sig_tokens")
        )
        empty = F.array().cast("array<string>")
        return (
            recs.join(sig, "url", "left")
            .withColumn("sig_tokens", F.coalesce(F.col("sig_tokens"), empty))
            .withColumn("block_tokens", F.col("sig_tokens"))
            .withColumn("mention_norm", F.concat_ws(" ", F.col("sig_tokens")))
        )

    def sigs_head(recs):
        return mention_signatures(recs, cfg)

    def run_sig_stage(fn):
        t0 = time.time()
        fn(records).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def run_full(fn):
        # mirrors run_pipeline's non-checkpoint path incl. the r6 eager
        # materialization (sigs.count() before the multi-scan pair job)
        t0 = time.time()
        sigs = fn(records).persist()
        sigs.count()
        keys = token_keys(sigs).union(static_keys(sigs, cfg))
        pairs = (
            cap_blocks(keys, cfg)
            .transform(
                lambda capped: capped.withColumnRenamed("url", "url_a")
                .join(capped.withColumnRenamed("url", "url_b"), "key")
                .where(F.col("url_a") < F.col("url_b"))
                .select("url_a", "url_b")
            )
            .union(exact_dup_pairs(sigs))
            .dropDuplicates(["url_a", "url_b"])
            .persist()
        )
        scored = score(pairs, sigs, cfg).persist()
        clusters = cluster_records(
            records, scored, max_iterations=cfg.max_cc_iterations
        )
        clusters.write.format("noop").mode("overwrite").save()
        n_pairs = pairs.count()
        wall = time.time() - t0
        for df in (sigs, pairs, scored):
            df.unpersist()
        return wall, n_pairs

    results: dict[str, dict[str, list[float]]] = {
        "head": {"sig": [], "full": []},
        "r4": {"sig": [], "full": []},
    }
    pair_counts: dict[str, int] = {}
    for i in range(rounds):
        for name, fn in (("head", sigs_head), ("r4", sigs_r4)):
            results[name]["sig"].append(run_sig_stage(fn))
            w, n = run_full(fn)
            results[name]["full"].append(w)
            pair_counts[name] = n
            print(
                f"round {i} {name}: sig {results[name]['sig'][-1]:.2f}s "
                f"full {w:.2f}s pairs {n}",
                file=sys.stderr,
            )

    def summ(xs):
        return {"best": round(min(xs), 2), "median": round(statistics.median(xs), 2)}

    report = {
        "sf_dir": sf_dir,
        "records": n_records,
        "rounds": rounds,
        "cores": cpus,
        "sig_stage": {k: summ(v["sig"]) for k, v in results.items()},
        "full_pipeline": {k: summ(v["full"]) for k, v in results.items()},
        "pairs": pair_counts,
        "law_cost_sig_best_ratio": round(
            min(results["head"]["sig"]) / max(min(results["r4"]["sig"]), 1e-9), 3
        ),
        "law_cost_full_best_ratio": round(
            min(results["head"]["full"]) / max(min(results["r4"]["full"]), 1e-9), 3
        ),
        "load_avg_1m": os.getloadavg()[0],
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
