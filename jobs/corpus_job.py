#!/usr/bin/env python
"""spark-submit entry point for training-corpus assembly — the
companion batch job to jobs/link_job.py, covering the training-data
side of the engine (dedup -> decontaminate -> quality -> mixture ->
split -> pack).

Usage (local example; on a cluster swap --master and executor confs):

    python jobs/make_pyfiles.py                # builds dist/face_hunter_spark.zip
    spark-submit --master local[8] \
      --py-files dist/face_hunter_spark.zip \
      --conf spark.sql.shuffle.partitions=64 \
      jobs/corpus_job.py \
      --documents /root/testdata/sf0.01/documents.parquet \
      --eval /path/to/benchmarks.parquet \
      --out-root /tmp/corpus_out \
      --mixture-rates '{"web": 0.5, "books": 1.0}' \
      --split-weights '{"train": 0.98, "val": 0.01, "test": 0.01}'

Reads a (doc_id, text[, source, ...]) document table, runs the
deterministic assembly pipeline (face_hunter_spark/corpus_pipeline.py),
writes split-partitioned document shards + the sequence-packing map
under --out-root, and prints one JSON stats line.
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--eval", default=None,
                    help="parquet of eval/benchmark texts to "
                         "decontaminate against (column: text)")
    ap.add_argument("--out-root", required=True)
    ap.add_argument("--near-dup-threshold", type=float, default=0.9,
                    help="MinHash Jaccard threshold; negative disables "
                         "near-dup removal")
    ap.add_argument("--decontam-n", type=int, default=13)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--langs", default=None,
                    help="comma-separated language allowlist (e.g. en,de)")
    ap.add_argument("--mixture-rates", default=None,
                    help="JSON {source: keep_rate}")
    ap.add_argument("--split-weights", default=None,
                    help='JSON {split: weight}, default '
                         '{"train":0.98,"val":0.01,"test":0.01}')
    ap.add_argument("--pack-budget", type=int, default=2048)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fhs-corpus-job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from face_hunter_spark.corpus_pipeline import assemble_corpus, write_corpus

    docs = spark.read.parquet(args.documents)
    eval_df = spark.read.parquet(args.eval) if args.eval else None
    corpus, packed, stats = assemble_corpus(
        spark,
        docs,
        eval_df=eval_df,
        near_dup_threshold=(
            None if args.near_dup_threshold < 0 else args.near_dup_threshold
        ),
        decontam_n=args.decontam_n,
        min_tokens=args.min_tokens,
        min_quality=args.min_quality,
        langs=tuple(args.langs.split(",")) if args.langs else None,
        mixture_rates=(
            json.loads(args.mixture_rates) if args.mixture_rates else None
        ),
        split_weights=(
            json.loads(args.split_weights) if args.split_weights else None
        ),
        pack_budget=args.pack_budget,
    )
    write_corpus(corpus, packed, args.out_root)
    stats["out_root"] = args.out_root
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
