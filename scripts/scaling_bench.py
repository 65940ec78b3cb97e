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

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
cores = int(sys.argv[1])
n_entities = int(sys.argv[2])
pages = int(sys.argv[3])
from crocodile_spark.session import get_spark
from crocodile_spark.config import PipelineConfig
from crocodile_spark.datagen import make_corpus, corpus_to_spark
from crocodile_spark.pipeline import run_pipeline, evaluate_pairwise_f1

spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
corpus = make_corpus(n_entities=n_entities, pages_per_entity=pages, seed=42)
wp, kb, gold = corpus_to_spark(spark, corpus)
wp = wp.repartition(cores).persist()
n_records = wp.count()

t0 = time.time()
cfg = PipelineConfig(shuffle_partitions=cores)
out = run_pipeline(spark, wp, cfg, use_html=True)
n_pairs = out.pairs.count()
out.clusters.write.format("noop").mode("overwrite").save()
wall = time.time() - t0
m = evaluate_pairwise_f1(out.clusters, gold, out.pairs)
print("RESULT " + json.dumps({{
    "cores": cores, "records": n_records, "pairs": n_pairs,
    "wall_s": round(wall, 2),
    "pairs_per_sec": round(n_pairs / wall, 1),
    "records_per_sec": round(n_records / wall, 1),
    "f1": round(m["f1"], 4),
}}))
"""


def run_level(cores: int, n_entities: int, pages: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = WORKER.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_entities), str(pages)],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker {cores} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    levels = [8, 32]
    results = [run_level(c, n_entities, pages) for c in levels]
    lo, hi = results[0], results[-1]
    speedup = hi["pairs_per_sec"] / lo["pairs_per_sec"]
    ideal = levels[-1] / levels[0]
    eff = speedup / ideal
    report = {
        "corpus": {"n_entities": n_entities, "pages_per_entity": pages,
                   "records": lo["records"]},
        "levels": results,
        "speedup": round(speedup, 3),
        "ideal": ideal,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
