#!/usr/bin/env python
"""spark-submit entry point for gallery enrichment + re-link (the batch
analogue of the reference's enrich_with_photos.py:103-180 dataflow and
its 0.603 -> 0.85 accuracy lever, README.rst:36-40).

    python jobs/make_pyfiles.py
    spark-submit --master local[8] \
      --py-files dist/face_hunter_spark.zip \
      jobs/enrich_job.py \
      --catalog-root /tmp/kg_out \
      --candidates /path/candidates.parquet \
      [--relink-documents /path/documents.parquet --n-entities 20]

``--candidates`` is a (label, entity_uri, media_ref) table of scraped
thumbnail candidates; validation (single-face check + embed) runs
distributed.  With ``--relink-documents`` the job then re-links those
documents against the enriched gallery and appends only the delta
triples (idempotent).  Prints one JSON stats line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog-root", required=True)
    ap.add_argument("--candidates", required=True,
                    help="parquet: (label, entity_uri, media_ref)")
    ap.add_argument("--relink-documents", default=None,
                    help="documents parquet to re-link after enrichment "
                         "(pre-filter this at scale: a doc_bucket range "
                         "or an unknown-rate watermark)")
    ap.add_argument("--n-entities", type=int, default=54)
    ap.add_argument("--strategy",
                    choices=["bruteforce", "lsh", "hnsw"],
                    default="bruteforce")
    ap.add_argument("--encoder", default="hash")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fhs-enrich-job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from face_hunter_spark import enrich, synth
    from face_hunter_spark.catalog import ParquetCatalog
    from face_hunter_spark.schemas import ENTITY_CATALOG

    catalog = ParquetCatalog(args.catalog_root)
    candidates = spark.read.parquet(args.candidates)
    stats = enrich.run_enrich_job(
        spark, catalog, candidates, encoder=args.encoder,
        run_id=args.run_id,
    )
    out = {"enrich": stats}
    if args.relink_documents:
        docs = spark.read.parquet(args.relink_documents)
        if "spans" not in docs.columns:
            # driver-corpus shape -> interleaved contract (same
            # wrapping link_job applies, so the two jobs agree on
            # doc ids and the relink anti-join lines up)
            import os

            sys.path.insert(0, ".")
            import __spark_entry__ as em

            docs = em._interleaved_documents(
                spark, os.path.dirname(args.relink_documents.rstrip("/"))
            )
        ecat = spark.createDataFrame(
            synth.make_entity_catalog_pdf(n_entities=args.n_entities),
            ENTITY_CATALOG,
        )
        out["relink"] = enrich.run_relink_job(
            spark, catalog, docs, ecat,
            n_entities=args.n_entities, strategy=args.strategy,
            encoder=args.encoder,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
