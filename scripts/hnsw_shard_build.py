"""Sharded vs monolithic HNSW BUILD at the >10^5-gallery regime
(VERDICT r3 'Next round' #3 / 'What's wrong' #1: the driver build is
single-threaded and superlinear — 1,257s measured at 200k rows — so
the hnsw strategy's build side did not survive past bench scale).

Measures, at each gallery size:
  * sharded_payload_spark wall time (executor-parallel build on
    local[N]) and the resulting ShardedHNSW's top-1 label accuracy +
    per-worker scoring throughput (same methodology as
    scripts/hnsw_crossover.py);
  * the monolithic driver build time is NOT re-run at large sizes
    (known superlinear; see BENCH_HNSW_CROSSOVER.json) unless
    --with-mono is passed.

Usage: python scripts/hnsw_shard_build.py [sizes ...] [--with-mono]
Writes BENCH_HNSW_SHARD_BUILD.json and prints a markdown table row set
for BASELINE.md.
"""

from __future__ import annotations

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import json  # noqa: E402
import sys  # noqa: E402
import time  # noqa: E402

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.hnsw_crossover import (  # noqa: E402
    SCORE_BATCH, THRESHOLD, make_gallery, make_queries,
)
from face_hunter_spark.operators import hnsw  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def run_size(spark, n: int, with_mono: bool) -> dict:
    from face_hunter_spark import fakevision as fv

    ent, mat = make_gallery(n)
    labels = ent.astype(str)  # same truth labels as hnsw_crossover
    n_ent = int(ent.max()) + 1
    proto_noise = fv.noise_block(
        np.arange(n_ent, dtype=np.uint64) + np.uint64(1)
    )
    protos = (proto_noise
              / np.linalg.norm(proto_noise, axis=1, keepdims=True)
              * np.float32(4.6))
    q, q_ent = make_queries(n_ent, protos)

    out: dict = {"n": n}
    arrays = (labels, mat, np.linalg.norm(mat, axis=1))

    t0 = time.monotonic()
    payload = hnsw.sharded_payload_spark(spark, arrays, n_shards=CPUS)
    out["shards"] = len(payload["shards"])
    out["sharded_build_s"] = round(time.monotonic() - t0, 1)

    idx = hnsw.ShardedHNSW.from_payload(payload)
    t0 = time.monotonic()
    correct = 0
    for s in range(0, len(q), SCORE_BATCH):
        lab, _ = hnsw_score(q[s:s + SCORE_BATCH], labels, idx)
        correct += int(
            (lab == q_ent[s:s + SCORE_BATCH].astype(str)).sum()
        )
    out["sharded_score_qps"] = round(len(q) / (time.monotonic() - t0))
    out["sharded_accuracy"] = round(correct / len(q), 4)

    if with_mono:
        t0 = time.monotonic()
        hnsw.HNSWIndex(mat)
        out["mono_build_s"] = round(time.monotonic() - t0, 1)
    return out


def hnsw_score(qb, labels, idx):
    return hnsw.hnsw_score_batch(qb, labels, idx, THRESHOLD)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_mono = "--with-mono" in sys.argv
    sizes = [int(a) for a in args] or [50_000, 200_000]

    from face_hunter_spark.session import build_session

    spark = build_session(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    rows = []
    for n in sizes:
        r = run_size(spark, n, with_mono)
        print(json.dumps(r), flush=True)
        rows.append(r)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_HNSW_SHARD_BUILD.json"), "w") as f:
        json.dump({"cpus": CPUS, "rows": rows}, f, indent=1)
    print("\n| gallery | shards | sharded build (s) | score q/s/worker "
          "| top-1 acc |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['n']:,} | {r['shards']} | {r['sharded_build_s']} "
              f"| {r['sharded_score_qps']:,} | {r['sharded_accuracy']} |")
    spark.stop()


if __name__ == "__main__":
    main()
