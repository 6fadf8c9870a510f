#!/usr/bin/env python
"""spark-submit entry point for KG-embedding training: chain TransE
epochs over the committed triple table, commit the embedding tables,
report filtered link-prediction metrics (training.run_transe_job owns
the semantics — integer-exact, bit-stable at any parallelism).

Usage:

    python jobs/make_pyfiles.py
    spark-submit --master local[8] \
      --py-files dist/face_hunter_spark.zip \
      jobs/transe_job.py --catalog-root /tmp/kg_out \
      [--epochs 4] [--dim 8] [--k-neg 2] [--margin 2] [--lr 1] \
      [--step sign|sum] [--eval-pct 10] [--include-literals]

Prints ONE JSON stats line (counts, snapshots, eval numerators +
derived mean_rank / mrr).  Exit 2 when the triple table is missing.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog-root", required=True)
    ap.add_argument("--table", default="triples")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--dim", type=int, default=8)
    ap.add_argument("--k-neg", type=int, default=2)
    ap.add_argument("--margin", type=int, default=2)
    ap.add_argument("--lr", type=int, default=1)
    ap.add_argument("--step", default="sign", choices=["sign", "sum"])
    ap.add_argument("--eval-pct", type=int, default=10)
    ap.add_argument("--include-literals", action="store_true")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fhs-transe-job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from face_hunter_spark.catalog import ParquetCatalog
    from face_hunter_spark.training import run_transe_job

    cat = ParquetCatalog(args.catalog_root)
    if not cat.exists(args.table):
        print(f"no table {args.table!r} at {args.catalog_root}",
              file=sys.stderr)
        return 2
    stats = run_transe_job(
        spark,
        cat,
        table=args.table,
        epochs=args.epochs,
        dim=args.dim,
        k_neg=args.k_neg,
        margin=args.margin,
        lr=args.lr,
        step=args.step,
        eval_pct=args.eval_pct,
        include_literals=args.include_literals,
        run_id=args.run_id,
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
