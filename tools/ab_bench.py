"""Interleaved A/B trials for the bench queries that drifted between
rounds (VERDICT r3 task #5: simhash, token_count, quality_score,
cosine_topk regressed r2->r3 at sub-half-second scale).

The operators' plans are byte-identical between rounds (judge-verified),
so the hypothesis is host/neighbor CPU steal, not a code regression.
This tool measures it the only way that separates noise from drift on a
noisy box: N ROUND-ROBIN rounds over the query set inside ONE warmed
session — every query samples every noise epoch, so a noisy epoch shows
up as cross-query correlated slowdown while a real per-query regression
shows up as one query consistently slow across all epochs.

Appends {"type": "ab", "trials": {...}} to BENCH/history.json.

Usage: python tools/ab_bench.py [rounds=12] [cpus=32]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

QUERIES = ("simhash", "token_count", "quality_score", "cosine_topk")
# round-3 / round-2 published times (BENCH_r0{2,3}.json) for the verdict
REFERENCE = {
    "simhash": (0.28, 0.34),
    "token_count": (0.10, 0.12),
    "quality_score": (0.17, 0.20),
    "cosine_topk": (0.39, 0.43),
}


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from html_qt_spark.operators import dedup, similarity, textstats
    from html_qt_spark.plans.session import get_spark

    spark = get_spark("ab_bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    dfs = {
        "simhash": lambda: dedup.simhash(docs),
        "token_count": lambda: textstats.token_count(docs),
        "quality_score": lambda: textstats.quality_score(docs),
        "cosine_topk": lambda: similarity.cosine_topk(emb),
    }
    # warm: one untimed pass per query (JIT + page cache)
    for name in QUERIES:
        dfs[name]().count()

    trials: dict[str, list[float]] = {q: [] for q in QUERIES}
    for r in range(rounds):
        for name in QUERIES:
            t0 = time.time()
            dfs[name]().count()
            trials[name].append(round(time.time() - t0, 3))
    spark.stop()

    summary = {}
    for q in QUERIES:
        ts = sorted(trials[q])
        r2, r3 = REFERENCE[q]
        summary[q] = {
            "min": ts[0],
            "median": ts[len(ts) // 2],
            "max": ts[-1],
            "r2": r2,
            "r3": r3,
            "min_le_r2": ts[0] <= r2,
        }
        print(q, json.dumps(summary[q]))

    hist_path = Path("BENCH/history.json")
    hist = json.loads(hist_path.read_text())
    hist["runs"].append({
        "type": "ab_regressed_r3",
        "sf": sf_dir,
        "cpus": cpus,
        "rounds": rounds,
        "trials": trials,
        "summary": summary,
    })
    hist_path.write_text(json.dumps(hist, indent=1))
    print("recorded", rounds, "interleaved rounds to", hist_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
