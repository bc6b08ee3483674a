#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.json north_rule: throughput
scaling efficiency >= 0.8 from N to 4N executors; sandbox stand-in is
local[8] vs local[32] on the same input — see BASELINE.md).

Runs bench.py's sketch_pipeline in fresh subprocesses (a JVM can't change
master in-process), computes pages/sec at both levels and the efficiency
  eff = throughput(4N) / (4 * throughput(N)),
and rewrites BENCH/BASELINE.md with the measured table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
QUERIES = "sketch_pipeline,bloom_match"
RUNS_PER_LEVEL = int(os.environ.get("FEVER_SCALING_RUNS", "2"))


def run_level(cores: int) -> dict:
    best = None
    for _ in range(RUNS_PER_LEVEL):  # best-of-N absorbs JVM warmup noise
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores),
                   PYTHONPATH=REPO)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--master", f"local[{cores}]", "--queries", QUERIES],
            capture_output=True, text=True, env=env, timeout=3600)
        if out.returncode != 0:
            raise RuntimeError(f"bench failed at local[{cores}]:\n{out.stderr[-2000:]}")
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        res = json.loads(line)
        if best is None or res["queries"]["sketch_pipeline"] < best["queries"]["sketch_pipeline"]:
            best = res
    return best


def main():
    n, four_n = 8, 32
    res_n = run_level(n)
    res_4n = run_level(four_n)
    tp_n = res_n["pages_per_sec"]
    tp_4n = res_4n["pages_per_sec"]
    eff = tp_4n / (4 * tp_n)

    report = {
        "n_cores": n, "four_n_cores": four_n,
        "pages": res_n["n_pages"],
        "throughput_n": tp_n, "throughput_4n": tp_4n,
        "efficiency": round(eff, 3),
        "bloom_match_sec_n": res_n["queries"]["bloom_match"],
        "bloom_match_sec_4n": res_4n["queries"]["bloom_match"],
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — measured scaling evidence

North_rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so per the driver
instruction the SAME job (bench.py sketch_pipeline: synth pages →
mapInPandas sketch build (HLL p=14, CMS 1e-4/1e-3, KLL k=200 per lang) →
two-level salted shuffle merge → estimate) runs at two parallelism levels
on the same input ({report['pages']:,} pages, identical cached parquet).

| parallelism | pages/sec | bloom_match sec |
|---|---|---|
| local[{n}]  (N)  | {tp_n:,.0f} | {report['bloom_match_sec_n']} |
| local[{four_n}] (4N) | {tp_4n:,.0f} | {report['bloom_match_sec_4n']} |

**Scaling efficiency = {tp_4n:,.0f} / (4 x {tp_n:,.0f}) = {eff:.3f}**
(target >= 0.8 — {"PASS" if eff >= 0.8 else "MISS"})

Caveats stated explicitly (SURVEY.md §7.4.7): local mode shares one JVM and
one disk; a real 4N-executor cluster adds network shuffle but also 4x the
scan/memory bandwidth, which local mode cannot grant. The job's shuffle
volume is O(groups x salt x state_size), independent of row count, so the
partition-scaling behavior measured here is the component that transfers.

Measured {report['timestamp']}; best of {RUNS_PER_LEVEL} runs per level.
Reproduce: `python bench_scaling.py`.
""")


if __name__ == "__main__":
    main()
