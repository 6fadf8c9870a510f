#!/usr/bin/env python
"""spark-submit entry point for the SPARQL read path: run a query
string (or file) against the committed triple table and write/print
the result — the batch analogue of the reference's /api/query endpoint
(api/api.py:81-97), with operators/sparql.py owning the semantics.

Usage:

    python jobs/make_pyfiles.py
    spark-submit --master local[8] \
      --py-files dist/face_hunter_spark.zip \
      jobs/sparql_job.py --catalog-root /tmp/kg_out \
      --query 'SELECT ?v ?s WHERE { ?v hunter:hasScene ?s } LIMIT 10' \
      [--query-file q.rq]     # instead of --query
      [--update 'INSERT DATA { ... }']  # the WRITE path instead of a
                              # query: commits through the catalog and
                              # prints the {form, inserted, deleted,
                              # snapshot} report
      [--out /tmp/result]     # write result parquet; else print rows
      [--max-print 50]

Exit codes: 0 on success (ASK prints true/false; an ASK of false is
still success), 2 when the catalog table is missing.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog-root", required=True)
    ap.add_argument("--table", default="triples")
    ap.add_argument("--query", default=None)
    ap.add_argument("--query-file", default=None)
    ap.add_argument("--update", default=None,
                    help="SPARQL UPDATE string (INSERT/DELETE DATA, "
                         "DELETE WHERE, modify, CLEAR) — the write "
                         "path; commits through the catalog and "
                         "prints the report")
    ap.add_argument("--out", default=None,
                    help="parquet output dir; default prints rows")
    ap.add_argument("--max-print", type=int, default=50)
    args = ap.parse_args()
    given = [
        x for x in (args.query, args.query_file, args.update)
        if x is not None
    ]
    if len(given) != 1:
        ap.error(
            "exactly one of --query / --query-file / --update is "
            "required"
        )
    text = args.query
    if args.query_file:
        with open(args.query_file) as f:
            text = f.read()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fhs-sparql-job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from face_hunter_spark.catalog import ParquetCatalog
    from face_hunter_spark.operators.sparql import execute

    cat = ParquetCatalog(args.catalog_root)
    if args.update is not None:
        # write path: INSERT DATA may bootstrap a missing table, the
        # other forms raise FileNotFoundError -> exit 2 like reads
        from face_hunter_spark.operators.sparql_update import (
            execute_update,
        )

        try:
            report = execute_update(
                spark, cat, args.table, args.update
            )
        except FileNotFoundError as e:
            print(str(e), file=sys.stderr)
            return 2
        print(json.dumps(report))
        return 0
    if not cat.exists(args.table):
        print(f"no table {args.table!r} at {args.catalog_root}",
              file=sys.stderr)
        return 2
    triples = cat.read(spark, args.table)

    result = execute(triples, text)
    if isinstance(result, bool):
        print(json.dumps({"ask": result}))
        return 0
    if args.out:
        result.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"rows": n, "out": args.out,
                          "columns": result.columns}))
    else:
        rows = result.limit(args.max_print).collect()
        for r in rows:
            print(json.dumps(r.asDict()))
        print(json.dumps({"rows_printed": len(rows),
                          "columns": result.columns}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
