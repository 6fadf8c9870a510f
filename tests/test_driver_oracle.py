"""driver_oracle: the pure-Python expected-pipeline model must agree
with Spark primitive-for-primitive (xxhash64) and end-to-end (the
driver pipeline's distinct triples per predicate)."""

import pyspark.sql.functions as F
import pytest

from face_hunter_spark import driver_oracle as DO
from tests.conftest import requires_testdata


def test_xxh64_matches_spark(spark):
    vals = [str(i) for i in range(50)] + ["", "a", "hello world", "x" * 100]
    rows = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", F.xxhash64("s").alias("h")
    ).collect()
    for r in rows:
        assert DO.spark_xxhash64_str(r.s) == r.h, r.s


def test_n_frames_matches_interleaved_documents(spark):
    import __spark_entry__ as em

    docs = em._interleaved_documents(spark, "/root/testdata/sf0.001")
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(F.filter("spans", lambda s: s["kind"] == F.lit("media"))
                   ).alias("n"),
        ).collect()
    }
    for doc_id, n in got.items():
        oid = int(doc_id.split("_")[1])
        assert DO.n_frames_for(oid) == n, doc_id


requires_testdata_mark = requires_testdata


@requires_testdata_mark
def test_expected_pred_counts_match_pipeline(spark):
    """End-to-end: the sequential Python model predicts the distributed
    pipeline's distinct triple counts exactly."""
    import __spark_entry__ as em

    got = {
        r.pred: r.n
        for r in em._q_kg_triples(spark, "/root/testdata/sf0.001").collect()
    }
    ids = [
        r.doc_id for r in
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id").collect()
    ]
    expected: dict[str, int] = {}
    counts = DO.expected_pred_counts()
    for oid in ids:
        for pred, n in counts[int(oid)].items():
            expected[pred] = expected.get(pred, 0) + n
    assert got == expected
