#!/usr/bin/env python
"""Scaling-evidence runner (BASELINE.md protocol): run the identical ER
pipeline on the identical seeded corpus at two local parallelism levels
(stand-in for N vs 4N executors) and report throughput + scaling
efficiency.

Each level runs in its own subprocess (one JVM per master setting).

Usage: python scripts/scaling_bench.py [n_entities] [pages_per_entity]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
cores = int(sys.argv[1])
n_entities = int(sys.argv[2])
pages = int(sys.argv[3])
filler_hi = int(sys.argv[4])
from crocodile_spark.session import get_spark
from crocodile_spark.config import PipelineConfig
from crocodile_spark.datagen import make_corpus, corpus_to_spark
from crocodile_spark.pipeline import run_pipeline, evaluate_pairwise_f1

from crocodile_spark.operators.normalize_stage import normalize_pages
from crocodile_spark.operators.blocking import block
from crocodile_spark.operators.scoring import score
from crocodile_spark.operators.clustering import cluster_records

# 3x partitions per core: with partitions == cores every stage tail idles
# (cores-1) slots; finer tasks pack concurrent AQE stages ~fully. Scaled
# with cores, so both levels run the identical config law.
spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores * 3)
spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
corpus = make_corpus(n_entities=n_entities, pages_per_entity=pages, seed=42,
                     filler_range=(max(2, filler_hi // 3), filler_hi))
wp, kb, gold = corpus_to_spark(spark, corpus)
wp = wp.repartition(cores * 3).persist()
n_records = wp.count()

cfg = PipelineConfig(shuffle_partitions=cores * 3)
# north-metric section: normalize + block + score (candidate-pairs/sec).
# best-of-2 trials to damp noisy-neighbor variance on this VM.
trials = []
for trial in range(2):
    t0 = time.time()
    records = normalize_pages(wp, use_html=True).persist()
    sigs, pairs = block(records, cfg)
    sigs = sigs.persist(); pairs = pairs.persist()
    scored = score(pairs, sigs, cfg).persist()
    scored.write.format("noop").mode("overwrite").save()
    trials.append(time.time() - t0)
    if trial == 0:
        for df in (records, sigs, pairs, scored):
            df.unpersist()
t_block_score = min(trials)
n_pairs = pairs.count()

t0 = time.time()
clusters = cluster_records(records, scored, max_iterations=cfg.max_cc_iterations)
clusters = clusters.persist()
clusters.write.format("noop").mode("overwrite").save()
t_cluster = time.time() - t0

m = evaluate_pairwise_f1(clusters, gold, pairs)
wall = t_block_score + t_cluster
print("RESULT " + json.dumps({{
    "cores": cores, "records": n_records, "pairs": n_pairs,
    "wall_s": round(wall, 2),
    "block_score_s": round(t_block_score, 2),
    "cluster_s": round(t_cluster, 2),
    "pairs_per_sec": round(n_pairs / t_block_score, 1),
    "records_per_sec": round(n_records / wall, 1),
    "f1": round(m["f1"], 4),
}}))
"""


def run_level(cores: int, n_entities: int, pages: int, filler_hi: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = WORKER.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_entities), str(pages),
         str(filler_hi)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker {cores} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def _busy(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def raw_cpu_throughput(workers: int, per: int = 6_000_000, rounds: int = 24) -> float:
    """Same-session hardware baseline: pure-CPU ops/sec at ``workers``
    processes (mp.Pool busy loop). The VM's multi-core throughput drifts
    with noisy neighbors (observed 2->8 ceiling between 2.8x and 4.1x
    within minutes), so the ceiling must be measured WITH the run it
    contextualizes, not quoted from a past session."""
    import multiprocessing as mp

    with mp.Pool(workers) as pool:
        t0 = time.time()
        pool.map(_busy, [per] * rounds)
        return rounds * per / (time.time() - t0)


def main():
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    filler_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    # N and 4N cores (driver protocol allows any N with 4N <= hardware).
    # Default 2->8: on this VM raw CPU scaling 8->32 threads caps at ~3.04x
    # (clock/memory ceiling measured in BENCH.md), so the N=2 pair isolates
    # *software* scaling from the hardware ceiling.
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    alternations = max(1, int(sys.argv[5])) if len(sys.argv) > 5 else 2
    levels = [n, 4 * n]
    # ALTERNATE the levels (N, 4N, N, 4N) and keep the best run per level:
    # VM load drifts on the scale of minutes, so running all of one level
    # then all of the other lets a contended window land entirely on one
    # side of the ratio and corrupt the efficiency (observed 0.75 vs 0.89
    # for the identical code). Alternation + best-of puts both levels
    # through the same weather.
    best: dict[int, dict] = {}
    ceilings = []
    for _ in range(alternations):
        ceilings.append(raw_cpu_throughput(levels[1]) / raw_cpu_throughput(levels[0]))
        for c in levels:
            r = run_level(c, n_entities, pages, filler_hi)
            if c not in best or r["pairs_per_sec"] > best[c]["pairs_per_sec"]:
                best[c] = r
    results = [best[c] for c in levels]
    lo, hi = results[0], results[-1]
    speedup = hi["pairs_per_sec"] / lo["pairs_per_sec"]
    ideal = levels[-1] / levels[0]
    eff = speedup / ideal
    raw_ceiling = max(ceilings)
    report = {
        "corpus": {"n_entities": n_entities, "pages_per_entity": pages,
                   "records": lo["records"]},
        "levels": results,
        "speedup": round(speedup, 3),
        "ideal": ideal,
        "scaling_efficiency": round(eff, 3),
        "raw_cpu_ceiling_speedup": round(raw_ceiling, 3),
        "raw_cpu_ceiling_efficiency": round(raw_ceiling / ideal, 3),
        "efficiency_vs_measured_ceiling": round(speedup / raw_ceiling, 3),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
