#!/usr/bin/env python
"""Pure-kernel thread-scaling curve — no Spark (round-7 verdict task #4).

BENCH/BASELINE.md claims the scaling study's 4N band (3.1-3.5M pages/s
at local[8], flat across weather incl. a near-idle host) is the
machine's memory-bandwidth/SMT ceiling for the sketch-build workload.
This tool measures that mechanism directly: the HLL+CMS(+KLL) update
loops — the exact per-partition kernels build_sketches runs inside
mapInPandas — driven by 1..K concurrent OS processes with zero Spark,
zero Arrow, zero shuffle. If per-process throughput rolls off as
processes are added while total throughput plateaus, the ceiling is the
hardware charging concurrent memory traffic, not Spark overhead.

Each worker builds its own sketches over its own pre-generated value
arrays (private working set, like a Spark task), runs a warm pass, then
times R repetitions of the update loop. Reported per level: summed
pages/s, per-proc pages/s, and the rolloff vs 1 proc.

Usage: python tools_kernel_curve.py [--procs 1,2,4,8] [--pages 400000]
Writes one JSON line to stdout; humans read the table on stderr.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import sys
import time


def _worker(args):
    procs_seed, n_pages, reps = args
    import numpy as np

    from fever_spark.sketch.cms import CountMinSketch
    from fever_spark.sketch.hll import HyperLogLog
    from fever_spark.sketch.kll import KLLSketch

    rng = np.random.default_rng(procs_seed)
    # the bench workload's shapes: ~60-char url strings for HLL,
    # prehashed int64s for CMS (bench uses prehash=True), float lengths
    # for KLL — same dtypes the mapInPandas kernels see per Arrow batch
    urls = np.array([f"https://site{i % 997}.example/p/{i:016x}"
                     for i in rng.integers(0, 1 << 40, n_pages)],
                    dtype=object)
    hashed = rng.integers(-(1 << 62), 1 << 62, n_pages, dtype=np.int64)
    lens = rng.random(n_pages) * 1e4

    def one_pass():
        hll = HyperLogLog(p=14)
        cms = CountMinSketch(epsilon=1e-4, delta=1e-3)
        kll = KLLSketch(k=200)
        hll.update(urls)
        cms.update(hashed)
        kll.update(lens)

    one_pass()  # warm: numpy pages faulted, code paths jitted by numpy
    t0 = time.time()
    for _ in range(reps):
        one_pass()
    return (n_pages * reps) / (time.time() - t0)


def measure(procs: int, n_pages: int, reps: int) -> dict:
    with mp.Pool(procs) as pool:
        rates = pool.map(_worker, [(1000 + i, n_pages, reps)
                                   for i in range(procs)])
    total = sum(rates)
    return {"procs": procs, "pages_per_sec_total": round(total, 1),
            "pages_per_sec_per_proc": round(total / procs, 1)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,3,4,6,8")
    ap.add_argument("--pages", type=int, default=400_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    levels = [int(p) for p in args.procs.split(",")]
    out = []
    for p in levels:
        r = measure(p, args.pages, args.reps)
        out.append(r)
        base = out[0]["pages_per_sec_per_proc"]
        r["per_proc_vs_1proc"] = round(
            r["pages_per_sec_per_proc"] / base, 3)
        print(f"  {p:2d} procs: {r['pages_per_sec_total']:>12,.0f} pages/s "
              f"total, {r['pages_per_sec_per_proc']:>12,.0f}/proc "
              f"({r['per_proc_vs_1proc']:.2f}x of 1-proc)",
              file=sys.stderr)
    print(json.dumps({"metric": "pure-kernel HLL+CMS+KLL update curve",
                      "pages": args.pages, "reps": args.reps,
                      "levels": out}))


if __name__ == "__main__":
    main()
