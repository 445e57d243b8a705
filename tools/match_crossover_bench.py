"""Fused-vs-by_join match crossover sweep (VERDICT r2 item #7).

Sweeps the corpus duplication factor (via synth_webpages(line_pool=...)) and
times the full pipeline under both match strategies at local[32]. The
measured crossover sets PipelineConfig.auto_dup_threshold, which
match_strategy='auto' compares against the duplication the mining pass
measures for free (in-band stats rows, parse/distributed.py).

Each (pool, strategy) cell runs in a fresh subprocess (one JVM per
measurement — sharing a JVM skews the later runs via heap growth), with a
steal sample before each timed window per the host-noise protocol
(BASELINE.md §3: this VM shows bursty hypervisor steal; only near-zero-steal
windows are trustworthy).

Run:  python tools/match_crossover_bench.py [n_docs] [repeats]
Cell: python tools/match_crossover_bench.py --single POOL STRATEGY N_DOCS
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POOLS = [0, 2000, 200, 40]  # 0 = no pool (natural low duplication)


def steal_pct(seconds: float = 3.0) -> float:
    def snap():
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return sum(vals), vals[7]  # total, steal

    t0, s0 = snap()
    time.sleep(seconds)
    t1, s1 = snap()
    return 100.0 * (s1 - s0) / max(t1 - t0, 1)


def run_cell(pool: int, strategy: str, n_docs: int) -> dict:
    from logai_spark.pipeline import PipelineConfig, run_pipeline
    from logai_spark.session import get_spark
    from logai_spark.sources.webpages import synth_webpages

    scratch = tempfile.mkdtemp(
        prefix="xover_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    spark = get_spark(
        f"xover_{pool}_{strategy}",
        extra_conf={"spark.local.dir": os.path.join(scratch, "spark_local")},
    )
    lp = pool or None
    cfg = PipelineConfig(match_strategy=strategy)
    try:
        # warmup pays JIT + python worker spawn outside the timed window
        run_pipeline(
            spark,
            synth_webpages(spark, 2000, line_pool=lp),
            os.path.join(scratch, "warm"),
            cfg,
        )
        pages = synth_webpages(spark, n_docs, line_pool=lp).cache()
        pages.count()
        t0 = time.perf_counter()
        m = run_pipeline(spark, pages, os.path.join(scratch, "out"), cfg)
        wall = time.perf_counter() - t0
    finally:
        spark.stop()
        subprocess.run(["rm", "-rf", scratch], check=False)
    return {
        "pool": pool,
        "strategy": strategy,
        "wall_sec": round(wall, 2),
        "duplication": m["duplication"],
        "lines": m["lines"],
        "templates": m["templates"],
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        print(json.dumps(run_cell(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    results = []
    for pool in POOLS:
        for strategy in ("fused", "by_join"):
            best = None
            for _ in range(repeats):
                st = steal_pct()
                out = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--single",
                        str(pool),
                        strategy,
                        str(n_docs),
                    ],
                    capture_output=True,
                    text=True,
                    check=True,
                )
                r = json.loads(out.stdout.strip().splitlines()[-1])
                r["steal_before_pct"] = round(st, 2)
                if best is None or r["wall_sec"] < best["wall_sec"]:
                    best = r
            results.append(best)
            print(json.dumps(best), flush=True)
    print(json.dumps({"n_docs": n_docs, "cells": results}, indent=1))


if __name__ == "__main__":
    main()
