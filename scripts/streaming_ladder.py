#!/usr/bin/env python
"""Streaming-ER ladder at checkpoint scale (VERDICT r6 #7): drive
``StreamingEntityResolution`` through a 3-batch ladder -- batch 0
bootstrap (~90% of the corpus) + two ~5% crawl deltas -- at >= 111k total
records, recording per-batch wall time and the on-disk size of every
state snapshot, then assert the partition-equivalence law against the
one-shot batch resolution of the full corpus.

What this evidences for the 10^12-doc operating mode:
  * per-batch wall tracks DELTA size, not corpus size (the O(delta)
    stored-state path end-to-end through the production loop);
  * the versioned snapshot state (clusters_b{B}/signatures_b{B}/
    token_df_b{B}) grows linearly in corpus size per snapshot -- no
    superlinear blowup across batches;
  * the ladder's final partition == run_pipeline(full corpus), and
    pairwise F1 vs planted gold holds the >= 0.9998 bar.

Batches are applied through ``process_batch`` with explicit batch ids --
the exact callback ``run_stream`` wires into foreachBatch (the stream ==
direct-call equivalence and the replay/orphan idempotency laws are
pytest-gated in test_streaming.py).

Usage: python scripts/streaming_ladder.py [n_entities] [pages] [filler_hi]
       defaults: 13230 8 120 (~111k records, the checkpoint law)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dir_mb(path: str) -> float:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return round(total / 1e6, 1)


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 13230
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    filler_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 120

    from pyspark.sql import functions as F

    from crocodile_spark.config import PipelineConfig
    from crocodile_spark.datagen import corpus_to_spark, make_corpus
    from crocodile_spark.pipeline import evaluate_pairwise_f1, run_pipeline
    from crocodile_spark.session import get_spark
    from crocodile_spark.streaming.incremental import StreamingEntityResolution

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parts = cores * 3
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(
        app_name=f"streaming-ladder-{n_entities}",
        master=f"local[{cores}]",
        shuffle_partitions=parts,
    )
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup

    t0 = time.time()
    corpus = make_corpus(
        n_entities=n_entities,
        pages_per_entity=pages,
        seed=42,
        filler_range=(max(2, filler_hi // 3), filler_hi),
    )
    wp, _kb, gold = corpus_to_spark(spark, corpus)
    wp = wp.select("url", "warc_ts", "html", "text", "lang", "entity_id")
    wp = wp.repartition(parts).persist()
    n_total = wp.count()
    datagen_s = round(time.time() - t0, 1)

    # ~90 / 5 / 5 split by deterministic url hash (crawl-delta shape)
    bucket = F.pmod(F.xxhash64("url"), F.lit(20))
    stream_cols = ["url", "warc_ts", "html", "text", "lang"]
    batches = [
        wp.where(bucket <= 17).select(*stream_cols),
        wp.where(bucket == 18).select(*stream_cols),
        wp.where(bucket == 19).select(*stream_cols),
    ]

    state_dir = "/tmp/croco_spark_streaming_ladder"
    shutil.rmtree(state_dir, ignore_errors=True)
    cfg = PipelineConfig(shuffle_partitions=parts)
    retention = int(os.environ.get("LADDER_SNAPSHOT_RETENTION", "2"))
    res = StreamingEntityResolution(
        spark, state_dir, cfg, use_html=True, snapshot_retention=retention
    )

    rows = []
    for b, df in enumerate(batches):
        df = df.persist()
        n_b = df.count()
        t0 = time.time()
        res.process_batch(df, b)
        wall = round(time.time() - t0, 1)
        snap = {
            "signatures_mb": dir_mb(os.path.join(state_dir, f"signatures_b{b}")),
            "clusters_mb": dir_mb(os.path.join(state_dir, f"clusters_b{b}")),
            "token_df_mb": dir_mb(os.path.join(state_dir, f"token_df_b{b}")),
            "records_batch_mb": dir_mb(
                os.path.join(state_dir, "records", f"batch_{b}")
            ),
            "static_keys_batch_mb": dir_mb(
                os.path.join(state_dir, "static_keys", f"batch_{b}")
            ),
        }
        rows.append(
            {
                "batch": b,
                "n_rows": n_b,
                "wall_s": wall,
                **snap,
                "state_total_mb": dir_mb(state_dir),
            }
        )
        df.unpersist()
        print(f"batch {b}: {n_b} rows in {wall}s, "
              f"state total {rows[-1]['state_total_mb']} MB", file=sys.stderr)

    # equivalence law at the final batch: ladder partition == one-shot
    # batch resolution of the full corpus
    t0 = time.time()
    full = run_pipeline(spark, wp.select(*stream_cols), cfg, use_html=True)
    full.clusters.persist().count()
    batch_wall = round(time.time() - t0, 1)

    def partition(cl):
        by: dict = {}
        for r in cl.select("url", "cluster_id").collect():
            by.setdefault(r["cluster_id"], set()).add(r["url"])
        return {frozenset(v) for v in by.values()}

    ladder_clusters = res.clusters().persist()
    p_ladder, p_full = partition(ladder_clusters), partition(full.clusters)
    equiv = p_ladder == p_full
    # the documented DF-drift caveat (incremental_er module docstring): a
    # token flipping distinctive as the cutoff grows can create an
    # old-old block the delta-scoped join rightly skips -- quantify any
    # divergence instead of hiding it behind a bool
    n_div = sum(len(s) for s in p_ladder ^ p_full) // 2
    m = evaluate_pairwise_f1(ladder_clusters, gold, full.pairs)

    report = {
        "n_records": n_total,
        "datagen_s": datagen_s,
        "batches": rows,
        "one_shot_batch_wall_s": batch_wall,
        "partition_equivalent": bool(equiv),
        "n_urls_in_diverging_clusters": n_div,
        "f1": round(m["f1"], 4),
        "delta_wall_over_bootstrap": round(
            (rows[1]["wall_s"] + rows[2]["wall_s"]) / 2 / rows[0]["wall_s"], 3
        ),
        "snapshot_retention": retention,
        "state_total_mb_final": dir_mb(state_dir),
        "cores": cores,
    }
    print(json.dumps(report))
    if m["f1"] < 0.9998:
        sys.exit(1)


if __name__ == "__main__":
    main()
