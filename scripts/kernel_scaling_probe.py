"""Spark-free scaling probe for the vision-stage embedding kernel.

Purpose: attribute the 8->32-core scaling gap (BENCH_SCALING_8_32).
Runs the exact per-batch numpy kernel the fused vision stage executes
(fakevision.embed_faces_batch: SplitMix64 + Box-Muller + prototype
gather) in N independent OS processes — no Spark, no shuffle, no GIL
sharing, no driver.  If aggregate throughput stops scaling between 8
and 32 processes HERE, the limit is the machine (guest memory
bandwidth / hypervisor vCPU scheduling), not the Spark plan.

Usage: python scripts/kernel_scaling_probe.py [workers ...]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

import numpy as np

BATCH = 4096
N_BATCHES = 24


def work(n_batches: int) -> float:
    from face_hunter_spark import fakevision as fv

    seeds = np.arange(BATCH, dtype=np.uint64) + np.uint64(os.getpid())
    ents = (seeds % np.uint64(20)).astype(np.int64) - 1
    t0 = time.monotonic()
    for _ in range(n_batches):
        fv.embed_faces_batch(seeds, ents, 20)
    return time.monotonic() - t0


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    workers_list = [int(x) for x in sys.argv[1:]] or [1, 8, 32]
    results = {}
    for workers in workers_list:
        ctx = mp.get_context("fork")
        with ctx.Pool(workers) as p:
            t0 = time.monotonic()
            p.map(work, [N_BATCHES] * workers)
            wall = time.monotonic() - t0
        total = workers * N_BATCHES * BATCH
        results[workers] = total / wall
        print(f"{workers:3d} workers: {wall:6.2f}s  "
              f"{total / wall / 1000:8.0f}k faces/s aggregate")
    ks = sorted(results)
    for lo, hi in zip(ks, ks[1:]):
        ratio = hi / lo
        eff = (results[hi] / results[lo]) / ratio
        print(f"scaling {lo}->{hi}: throughput x{results[hi]/results[lo]:.2f} "
              f"on x{ratio} cores -> efficiency {eff:.2f}")


if __name__ == "__main__":
    main()
