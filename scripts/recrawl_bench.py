#!/usr/bin/env python
"""Re-crawl upsert at checkpoint scale (r7): resolve a realistic re-crawl
batch -- ~5% updated content + ~3% byte-identical re-fetches + ~10% new
pages -- against a ~100k-record base resolution, and compare against the
full batch re-run of the mutated corpus.

Evidence this produces for the 10^12-doc operating mode:
  * recrawl wall vs full re-run wall (the upsert path must win);
  * partition equivalence with the full re-run (the dissolution/repair
    law at scale, not just the pytest fixtures);
  * pairwise F1 vs planted gold (updates are content tweaks that keep
    entity identity, so gold stays valid);
  * classification counts (updated / unchanged / new).

Usage: python scripts/recrawl_bench.py [n_entities] [pages] [filler_hi]
       defaults: 13230 8 120 (~111k records, the checkpoint law)
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
    filler_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 120

    from pyspark.sql import functions as F

    from crocodile_spark.config import PipelineConfig
    from crocodile_spark.datagen import corpus_to_spark, make_corpus
    from crocodile_spark.operators.blocking import (
        static_keys,
        token_document_frequencies,
    )
    from crocodile_spark.operators.recrawl import recrawl_upsert
    from crocodile_spark.pipeline import evaluate_pairwise_f1, run_pipeline
    from crocodile_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parts = cores * 3
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(
        app_name=f"recrawl-bench-{n_entities}",
        master=f"local[{cores}]",
        shuffle_partitions=parts,
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    corpus = make_corpus(
        n_entities=n_entities,
        pages_per_entity=pages,
        seed=42,
        filler_range=(max(2, filler_hi // 3), filler_hi),
    )
    wp, _kb, gold = corpus_to_spark(spark, corpus)
    cols = ["url", "warc_ts", "html", "text", "lang"]
    wp = wp.select(*cols).repartition(parts).persist()
    n_total = wp.count()

    h = F.pmod(F.xxhash64("url"), F.lit(20))
    base_wp = wp.where(h < 18).persist()
    new_wp = wp.where(h >= 18).persist()
    h2 = F.pmod(F.xxhash64("url"), F.lit(19))
    # content tweak keeps entity identity -> planted gold stays valid
    upd_wp = base_wp.where(h2 == 3).withColumn(
        "text", F.concat(F.col("text"), F.lit(" recrawl revision marker"))
    )
    unch_wp = base_wp.where(h2 == 5)
    batch = upd_wp.unionByName(unch_wp).unionByName(new_wp).persist()
    batch.count()
    mutated = (
        base_wp.where(h2 != 3)
        .unionByName(upd_wp)
        .unionByName(new_wp)
        .persist()
    )
    mutated.count()

    cfg = PipelineConfig(shuffle_partitions=parts)

    # base resolution + stored state (not timed: amortized)
    base = run_pipeline(spark, base_wp, cfg, use_html=False)
    base.clusters.persist().count()
    base.records.persist().count()
    base.signatures.persist().count()
    token_df = token_document_frequencies(base.records, cfg).persist()
    token_df.count()
    keys = static_keys(base.signatures, cfg).persist()
    keys.count()
    n_base = base.records.count()

    # JVM warmth ordering is deliberately CONSERVATIVE for the speedup
    # claims: dissolve mode runs coldest, edge-retaining mode second, the
    # full re-run last (warmest denominator)
    t0 = time.time()
    out = recrawl_upsert(
        spark,
        base.records,
        base.clusters,
        batch,
        cfg,
        use_html=False,
        existing_static_keys=keys,
        existing_signatures=base.signatures,
        existing_token_df=token_df,
        existing_n_records=n_base,
    )
    out.clusters.persist().count()
    t_recrawl = round(time.time() - t0, 1)

    edges = base.scored.where(F.col("is_edge")).select("url_a", "url_b").persist()
    edges.count()
    t0 = time.time()
    out_ret = recrawl_upsert(
        spark,
        base.records,
        base.clusters,
        batch,
        cfg,
        use_html=False,
        existing_static_keys=keys,
        existing_signatures=base.signatures,
        existing_token_df=token_df,
        existing_n_records=n_base,
        existing_edges=edges,
    )
    out_ret.clusters.persist().count()
    t_retain = round(time.time() - t0, 1)

    t0 = time.time()
    full = run_pipeline(spark, mutated, cfg, use_html=False)
    full.clusters.persist().count()
    t_full = round(time.time() - t0, 1)

    def partition(cl):
        by: dict = {}
        for r in cl.select("url", "cluster_id").collect():
            by.setdefault(r["cluster_id"], set()).add(r["url"])
        return {frozenset(v) for v in by.values()}

    p_rc, p_ret, p_full = (
        partition(out.clusters),
        partition(out_ret.clusters),
        partition(full.clusters),
    )
    n_div = sum(len(s) for s in p_rc ^ p_full) // 2
    n_div_ret = sum(len(s) for s in p_ret ^ p_full) // 2
    m = evaluate_pairwise_f1(out.clusters, gold, full.pairs)

    m_full = evaluate_pairwise_f1(full.clusters, gold, full.pairs)

    report = {
        "n_records_base": n_base,
        "n_records_final": out.n_records,
        "n_batch": out.stage_stats["n_batch"],
        "n_updated": out.stage_stats["n_updated"],
        "n_new_or_updated": out.stage_stats["n_new_or_updated"],
        "recrawl_pairs": out.pairs.count(),
        "retain_pairs": out_ret.pairs.count(),
        "full_pairs": full.pairs.count(),
        "recrawl_wall_s": t_recrawl,
        "retain_wall_s": t_retain,
        "full_rerun_wall_s": t_full,
        "speedup_vs_full": round(t_full / t_recrawl, 2),
        "retain_speedup_vs_full": round(t_full / t_retain, 2),
        "partition_equivalent": p_rc == p_full,
        "retain_partition_equivalent": p_ret == p_full,
        "n_urls_in_diverging_clusters": n_div,
        "n_urls_in_diverging_clusters_retain": n_div_ret,
        "f1": round(m["f1"], 4),
        "f1_full_rerun": round(m_full["f1"], 4),
        "cores": cores,
        "load_avg_1m": os.getloadavg()[0],
    }
    print(json.dumps(report))
    # The law is equivalence MODULO the documented drift caveat (old-old
    # blocks created purely by DF-cutoff / block-cap motion are skipped;
    # see incremental_er / recrawl docstrings): exact at 111k, ~1.7% of
    # urls at 529k with a 21% batch -- and the dissolve-mode A/B shows the
    # divergence is shared (not an edge-retention artifact). Quantitative
    # gate: F1 parity with the full re-run (no quality loss) + bounded
    # divergence, rather than the absolute partition equality that drift
    # breaks at scale. (The mutation marker shifts absolute F1 for both
    # paths equally, so the clean-corpus 0.9998 bar doesn't apply either.)
    div_frac = max(n_div, n_div_ret) / max(out.n_records, 1)
    if m["f1"] < m_full["f1"] - 1e-4 or div_frac > 0.05:
        sys.exit(1)


if __name__ == "__main__":
    main()
