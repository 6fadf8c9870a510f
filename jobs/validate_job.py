#!/usr/bin/env python
"""spark-submit entry point for the KG quality gate: SHACL-lite shape
validation + VoID statistics over the committed triple table, with the
report and stats appended to the catalog (face_hunter_spark/quality.py
owns the logic — this is the thin CLI).

Usage:

    python jobs/make_pyfiles.py
    spark-submit --master local[8] \
      --py-files dist/face_hunter_spark.zip \
      jobs/validate_job.py --catalog-root /tmp/kg_out \
      [--after SNAPSHOT]      # validate only rows committed after it
      [--shapes shapes.json]  # replace the default shapes (JSON list)
      [--strict]              # exit 1 if any violation
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog-root", required=True)
    ap.add_argument("--table", default="triples")
    ap.add_argument("--after", default=None,
                    help="snapshot id: validate only rows committed "
                         "strictly after it (incremental gate)")
    ap.add_argument("--shapes", default=None,
                    help="JSON file with a list of shape dicts; "
                         "replaces the default shapes")
    ap.add_argument("--strict", action="store_true",
                    help="exit nonzero when violations exist")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fhs-validate-job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from face_hunter_spark.catalog import ParquetCatalog
    from face_hunter_spark.quality import run_validate_job

    shapes = None
    if args.shapes:
        with open(args.shapes) as f:
            shapes = json.load(f)

    stats = run_validate_job(
        spark,
        ParquetCatalog(args.catalog_root),
        table=args.table,
        shapes=shapes,
        after=args.after,
        run_id=args.run_id,
    )
    print(json.dumps(stats))
    spark.stop()
    return 1 if (args.strict and stats["n_violations"]) else 0


if __name__ == "__main__":
    raise SystemExit(main())
