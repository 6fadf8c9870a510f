"""Negative sampling (operators/negatives.py): vocabulary indexing vs
a window-function mirror, content-keyed corruption vs a hand md5
replay, filtered protocol, and partitioning invariance."""

import hashlib

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from face_hunter_spark.operators.negatives import (
    indexed_vocabulary,
    negative_samples,
)


def test_indexed_vocabulary_matches_window(spark):
    vals = [f"v{(i * 37) % 101:03d}" for i in range(101)]
    df = spark.createDataFrame([(v,) for v in vals * 2], ["x"])
    got = sorted(
        (r.idx, r.value) for r in indexed_vocabulary(df, "x").collect()
    )
    exp = sorted(
        (r.idx, r.x)
        for r in df.distinct()
        .withColumn("idx", F.row_number().over(Window.orderBy("x")) - 1)
        .collect()
    )
    assert got == exp


def test_indexed_vocabulary_partitioning_invariant(spark):
    df = spark.createDataFrame([(f"k{i:04d}",) for i in range(200)], ["x"])
    a = sorted(map(tuple, indexed_vocabulary(df, "x", 3).collect()))
    b = sorted(map(tuple, indexed_vocabulary(df.repartition(17), "x", 11).collect()))
    assert a == b


@pytest.fixture()
def positives(spark):
    rows = [(f"s{i % 7}", "likes", f"o{i % 5}") for i in range(20)]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_negative_samples_md5_replay(spark, positives):
    got = negative_samples(positives, k=3).collect()
    vocab = sorted({r.obj for r in positives.collect()})
    truth = {(r.subj, r.pred, r.obj) for r in positives.collect()}
    expected = set()
    for s, p, o in truth:
        for i in range(3):
            key = "\x1f".join(["neg", s, p, o, str(i)])
            idx = int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % len(vocab)
            neg = vocab[idx]
            if (s, p, neg) not in truth:
                expected.add((s, p, neg, i))
    assert {(r.subj, r.pred, r.obj_neg, r.neg_idx) for r in got} == expected
    # filtered protocol: no emitted row is a true triple
    assert all((r.subj, r.pred, r.obj_neg) not in truth for r in got)


def test_negative_samples_external_pool(spark, positives):
    pool = spark.createDataFrame([("e1",), ("e2",), ("e3",)], ["ent"])
    got = negative_samples(positives, k=2, pool=pool, pool_col="ent").collect()
    assert got and all(r.obj_neg in {"e1", "e2", "e3"} for r in got)


def test_negative_samples_empty_pool_raises(spark, positives):
    empty = spark.createDataFrame([], "ent string")
    with pytest.raises(ValueError, match="empty vocabulary"):
        negative_samples(positives, k=1, pool=empty, pool_col="ent")


# ---------------------------------------------------------- property


def test_indexed_vocabulary_property(spark):
    """Fuzz the scale-safe ranking against sorted-enumerate across
    duplicate-heavy, unicode-ish, and skewed-partition inputs.  One
    Spark round per case (hypothesis would respawn jobs per example,
    so the cases are enumerated explicitly)."""
    cases = [
        ["a"],
        ["a", "a", "a"],
        [f"{i:03d}" for i in range(97)] * 3,
        ["é", "e", "E", "É", "z" * 50, ""],
        [f"k{(i * 7919) % 257}" for i in range(514)],
    ]
    from face_hunter_spark.operators.negatives import indexed_vocabulary

    for vals in cases:
        for parts in (1, 5):
            df = spark.createDataFrame([(v,) for v in vals], ["x"])
            got = sorted(
                (r.idx, r.value)
                for r in indexed_vocabulary(df, "x", parts).collect()
            )
            exp = list(enumerate(sorted(set(vals))))
            assert got == exp, (vals[:5], parts)
