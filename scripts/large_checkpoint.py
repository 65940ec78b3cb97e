#!/usr/bin/env python
"""Large-corpus checkpoint runner (BENCH.md "large-corpus checkpoint"
rows): the FULL ER pipeline (normalize -> block -> score -> cluster) on a
seeded web-realistic corpus, per-stage walls, cold + warm pass, pairwise
F1, and total shuffle read/write bytes from the Spark REST status API.

One JSON line on stdout (plus a human table on stderr) so rows can be
pasted into BENCH.md with provenance.

Usage: python scripts/large_checkpoint.py [n_entities] [pages] [filler_hi] [--skew]
       defaults: 13230 8 120  (~111k records, the r3/r4 comparable law)
       r5 scale row: 63000 8 120  (~529k records)

``--skew`` (r6, VERDICT r5 #6) plants pathological skew on top of the
benign corpus: one exact-duplicate group of ~10% of the corpus (every
copy on ONE host -- a giant row-hash window partition AND a giant capped
host block), plus one near-universal token sitting just UNDER the
relative DF cutoff (a ~29k-row posting list through the distinctive-token
join and signature aggregation). Gold pairs are untouched (the dup group
is appended under new urls), so F1 comparability holds. The report adds
per-stage straggler quantiles (max/median task time for the slowest
stages) -- the skew-resilience evidence for the BENCH.md row.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shuffle_totals(spark) -> tuple[int, int]:
    """Total completed-stage shuffle read/write bytes via the REST status
    API at THIS session's UI url (port 4040 may be taken by a concurrent
    session). (0, 0) if the UI is unavailable."""
    try:
        ui = spark.sparkContext.uiWebUrl  # e.g. http://host:4041
        base = f"{ui}/api/v1/applications"
        apps = json.load(urllib.request.urlopen(base, timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/{app_id}/stages?status=complete", timeout=10
            )
        )
        w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        r = sum(s.get("shuffleReadBytes", 0) for s in stages)
        return r, w
    except Exception:
        return 0, 0


def task_straggler_stats(spark, top_n: int = 3) -> list[dict]:
    """Median/max task run time for the ``top_n`` heaviest completed
    stages (by total executor run time) via the REST taskSummary API --
    the max/median ratio is the straggler evidence for skew runs."""
    try:
        ui = spark.sparkContext.uiWebUrl
        base = f"{ui}/api/v1/applications"
        apps = json.load(urllib.request.urlopen(base, timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/{app_id}/stages?status=complete", timeout=10
            )
        )
        stages.sort(key=lambda s: s.get("executorRunTime", 0), reverse=True)
        out = []
        for s in stages[:top_n]:
            sid, att = s["stageId"], s["attemptId"]
            summ = json.load(
                urllib.request.urlopen(
                    f"{base}/{app_id}/stages/{sid}/{att}/taskSummary"
                    "?quantiles=0.5,1.0",
                    timeout=10,
                )
            )
            med, mx = summ["executorRunTime"]
            peak_mem = summ.get("peakExecutionMemory", [0, 0])
            spill = summ.get("memoryBytesSpilled", [0, 0])
            out.append(
                {
                    "stage": sid,
                    "name": s.get("name", "")[:60],
                    "n_tasks": s.get("numCompleteTasks"),
                    "task_ms_median": round(med),
                    "task_ms_max": round(mx),
                    "max_over_median": round(mx / med, 1) if med else None,
                    # per-task peak execution memory + spill: the
                    # executor-sizing evidence (VERDICT r5 #9)
                    "peak_exec_mem_mb_max": round(peak_mem[-1] / 1e6, 1),
                    "mem_spill_mb_max": round(spill[-1] / 1e6, 1),
                }
            )
        return out
    except Exception as e:  # UI off or API drift: report, don't fail the run
        return [{"error": str(e)}]


def plant_skew(corpus, dup_frac: float = 0.10, hot_token_frac: float = 0.05):
    """Adversarial-skew transform of the benign corpus (in place):

    * appends one exact-duplicate group of ``dup_frac``x corpus size --
      every copy of row 0's text under a fresh url on ONE shared host
      (megahost.example.com): a single row-hash Window partition with
      ~53k rows at the 529k row, and a host block 800x over the cap;
    * appends ' skewtok' to just under ``hot_token_frac`` of the FINAL
      row count of original texts: one token whose df sits directly
      under the relative cutoff, stress-testing the distinctive-token
      join + signature aggregation with a near-universal posting list.

    Gold pairs reference only original urls, so pairwise F1 stays
    comparable to the benign run."""
    import math

    import pandas as pd

    wpdf = corpus.web_pages
    n0 = len(wpdf)
    n_dup = int(n0 * dup_frac)
    src = wpdf.iloc[0]
    dup = pd.DataFrame(
        {
            "url": [f"https://megahost.example.com/dup/{i}" for i in range(n_dup)],
            "warc_ts": [src["warc_ts"]] * n_dup,
            "html": [src["html"]] * n_dup,
            "text": [src["text"]] * n_dup,
            "lang": [src["lang"]] * n_dup,
            "entity_id": [src["entity_id"]] * n_dup,
            "mention": [src["mention"]] * n_dup,
        }
    )
    n_final = n0 + n_dup
    cutoff = math.ceil(0.05 * n_final)  # cfg.mention_df_fraction default
    # df just UNDER the distinctive cutoff; clamped -- a negative value
    # would slice from the END and stopword nearly the whole corpus
    n_hot = max(0, min(n0, cutoff - 100))
    if n_hot == 0:
        raise SystemExit(
            f"corpus too small for the skew law: cutoff {cutoff} <= 100"
        )
    idx = wpdf.index[:n_hot]
    wpdf.loc[idx, "text"] = wpdf["text"].loc[idx] + " skewtok"
    # the pipeline re-extracts text from html (use_html=True), so the
    # token must live in the html payload too
    wpdf.loc[idx, "html"] = wpdf["html"].loc[idx].map(
        lambda b: b.replace(b"</p>", b" skewtok</p>", 1)
    )
    corpus.web_pages = pd.concat([wpdf, dup], ignore_index=True)
    return {"n_dup_group": n_dup, "n_hot_token_rows": n_hot, "cutoff": cutoff}


def main() -> None:
    args = [a for a in sys.argv[1:]]
    skew = "--skew" in args
    if skew:
        args.remove("--skew")
    # --emb (r7, VERDICT r6 #4): generate the corpus with 16-dim planted
    # embeddings so the emb_cosine feature is live end-to-end through the
    # TRAINED logistic_weights_emb.json (asserted below, not the literal
    # fallback) at checkpoint scale
    with_emb = "--emb" in args
    if with_emb:
        args.remove("--emb")
    n_entities = int(args[0]) if len(args) > 0 else 13230
    pages = int(args[1]) if len(args) > 1 else 8
    filler_hi = int(args[2]) if len(args) > 2 else 120

    from crocodile_spark.config import PipelineConfig
    from crocodile_spark.datagen import corpus_to_spark, make_corpus
    from crocodile_spark.operators.blocking import block
    from crocodile_spark.operators.clustering import cluster_records
    from crocodile_spark.operators.normalize_stage import normalize_pages
    from crocodile_spark.operators.scoring import score
    from crocodile_spark.pipeline import evaluate_pairwise_f1
    from crocodile_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parts = cores * 3
    # local[32] packs every task slot into ONE JVM: the library default of
    # 8g (250 MB/slot) OOMs around 500k records, which no real cluster
    # would -- give the measurement JVM a per-slot budget comparable to a
    # production executor (24g / 32 slots = 768 MB) unless overridden
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(
        app_name=f"large-checkpoint-{n_entities}",
        master=f"local[{cores}]",
        shuffle_partitions=parts,
        extra_conf={"spark.ui.enabled": "true"},  # REST shuffle metrics
    )
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup

    t0 = time.time()
    corpus = make_corpus(
        n_entities=n_entities,
        pages_per_entity=pages,
        seed=42,
        filler_range=(max(2, filler_hi // 3), filler_hi),
        embedding_dim=16 if with_emb else 0,
    )
    if with_emb:
        from crocodile_spark.operators.scoring import load_trained_weights

        trained = load_trained_weights("emb")
        assert trained is not None, "trained emb weights must ship"
        assert "emb_cosine" in trained[0]
    skew_info = plant_skew(corpus) if skew else None
    wp, kb, gold = corpus_to_spark(spark, corpus)
    wp = wp.repartition(parts).persist()
    n_records = wp.count()
    datagen_s = time.time() - t0
    cfg = PipelineConfig(shuffle_partitions=parts)

    def one_pass() -> dict:
        stage = {}
        t0 = time.time()
        records = normalize_pages(wp, use_html=True).persist()
        records.write.format("noop").mode("overwrite").save()
        stage["normalize_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        sigs, pairs = block(records, cfg)
        sigs = sigs.persist()
        pairs = pairs.persist()
        pairs.write.format("noop").mode("overwrite").save()
        stage["block_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        scored = score(pairs, sigs, cfg).persist()
        scored.write.format("noop").mode("overwrite").save()
        stage["score_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        clusters = cluster_records(
            records, scored, max_iterations=cfg.max_cc_iterations
        ).persist()
        clusters.write.format("noop").mode("overwrite").save()
        stage["cluster_s"] = round(time.time() - t0, 2)
        stage["wall_s"] = round(sum(stage.values()), 2)
        stage["_frames"] = (records, sigs, pairs, scored, clusters)
        return stage

    r0, w0 = shuffle_totals(spark)
    cold = one_pass()
    r1, w1 = shuffle_totals(spark)
    n_pairs = cold["_frames"][2].count()
    scored_cols = cold["_frames"][3].columns
    m = evaluate_pairwise_f1(cold["_frames"][4], gold, cold["_frames"][2])
    # warm: identical job again with the cold pass's persisted frames
    # RELEASED -- codegen/Python workers/shuffle files exist, but every
    # stage recomputes. This is the honest amortized-fixed-cost number.
    for df in cold.pop("_frames"):
        df.unpersist()
    warm = one_pass()
    # hot: identical job a third time with the warm pass's frames still
    # persisted -- Spark's CacheManager plan-matches them, so this mostly
    # measures cache traversal + the cluster stage. This is the metric
    # prior rounds reported as "warm" (r3 11.9 s / r4 15.0 s at 111k);
    # kept for cross-round comparability, labeled for what it is.
    hot = one_pass()
    for df in warm.pop("_frames"):
        df.unpersist()
    for df in hot.pop("_frames"):
        df.unpersist()
    # r1/w1 above bracket the COLD pass only (reported as
    # shuffle_*_mb_cold_pass); r2/w2 close over the whole session
    # (cold+warm+hot+metric jobs) for the honest session total (r5 review
    # finding: the two differ ~3x and must not share a label)
    r2, w2 = shuffle_totals(spark)

    report = {
        "n_entities": n_entities,
        "pages_per_entity": pages,
        "filler_hi": filler_hi,
        "records": n_records,
        "pairs": n_pairs,
        "datagen_s": round(datagen_s, 1),
        "cold": cold,
        "warm": warm,
        "hot_cached": hot,
        "cold_pairs_per_sec": round(n_pairs / cold["wall_s"], 1),
        "warm_pairs_per_sec": round(n_pairs / warm["wall_s"], 1),
        "hot_pairs_per_sec": round(n_pairs / hot["wall_s"], 1),
        "f1": round(m["f1"], 4),
        "shuffle_read_mb_cold_pass": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb_cold_pass": round((w1 - w0) / 1e6, 1),
        "shuffle_read_mb_session": round((r2 - r0) / 1e6, 1),
        "shuffle_write_mb_session": round((w2 - w0) / 1e6, 1),
        "cores": cores,
        "shuffle_partitions": parts,
        "load_avg_1m": os.getloadavg()[0],
    }
    report["stragglers"] = task_straggler_stats(spark)
    if with_emb:
        # the emb slot really flowed: the scored frame carries emb_cosine
        report["emb_feature_active"] = "emb_cosine" in scored_cols
        report["emb_weights"] = "trained"
    if skew_info is not None:
        report["skew"] = skew_info
    for k in ("cold", "warm", "hot_cached"):
        print(f"{k}: {report[k]}", file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
