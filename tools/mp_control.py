"""Spark-free scaling control: the identical extraction kernel over the
identical span corpus, fanned out with raw multiprocessing at pinned core
counts.

Purpose: attribute the 8->32 scaling ceiling.  If a plain fork/map with
zero framework overhead shows the same efficiency knee as the Spark
pipeline, the ceiling is the HOST (DRAM bandwidth / neighbor steal), not
the engine's plan.  Referenced by BENCH/BASELINE.md.

Usage: taskset is applied per-config INSIDE the script.

    python tools/mp_control.py [sf_dir] [replication] [configs]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _load_spans(sf_dir: str, replication: int) -> list[str]:
    import duckdb

    from html_qt_spark.sources.interleaved import INTERLEAVED_SPANS_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    rows = con.execute(
        "SELECT text FROM (" + INTERLEAVED_SPANS_SQL
        + ") WHERE kind = 'text'").fetchall()
    return [r[0] for r in rows if r[0]] * replication


def _worker(chunk: list[str]) -> int:
    from html_qt_spark.kernel.extractor import extract_html

    n = 0
    for h in chunk:
        n += len(extract_html(h))
    return n


def run_config(spans: list[str], cores: int, repeats: int = 3) -> float:
    os.sched_setaffinity(0, set(range(cores)))
    chunks = [spans[i::cores * 4] for i in range(cores * 4)]
    best = 0.0
    with mp.get_context("fork").Pool(cores) as pool:
        pool.map(_worker, [c[:50] for c in chunks])  # warm imports
        for _ in range(repeats):
            t0 = time.perf_counter()
            pool.map(_worker, chunks)
            el = time.perf_counter() - t0
            best = max(best, len(spans) / el)
    os.sched_setaffinity(0, set(range(os.cpu_count())))
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replication = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    configs = ([int(c) for c in sys.argv[3].split(",")]
               if len(sys.argv) > 3 else [8, 32])
    spans = _load_spans(sf_dir, replication)
    out = {"spans": len(spans)}
    tput = {}
    for c in configs:
        tput[str(c)] = round(run_config(spans, c), 1)
    out["spans_per_sec"] = tput
    if "8" in tput and "32" in tput:
        out["efficiency_8_32"] = round((tput["32"] / tput["8"]) / 4.0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
