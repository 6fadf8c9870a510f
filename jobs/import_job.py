#!/usr/bin/env python
"""spark-submit entry point for n3 store migration: load an n3
artifact — this engine's export_n3 output (flat or sharded) or the
reference's own rdflib file (memory_store.py:48-59,
models/example_graph) — into the catalog-backed triple table as one
idempotent append (sources.import_n3 owns the semantics).

Usage:

    python jobs/make_pyfiles.py
    spark-submit --master local[8] \
      --py-files dist/face_hunter_spark.zip \
      jobs/import_job.py --catalog-root /tmp/kg_out \
      --n3 /path/to/graph.n3 [--sharded] [--table triples]

Prints ONE JSON stats line ({"parsed", "inserted", "snapshot",
"run_id"}).  Re-running on the same artifact inserts 0 and commits
nothing.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog-root", required=True)
    ap.add_argument("--n3", required=True,
                    help="n3 file (or sharded export dir with --sharded)")
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--table", default="triples")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fhs-import-job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from face_hunter_spark.catalog import ParquetCatalog
    from face_hunter_spark.sources import import_n3

    stats = import_n3(
        spark,
        ParquetCatalog(args.catalog_root),
        args.n3,
        table=args.table,
        run_id=args.run_id,
        sharded=args.sharded,
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
