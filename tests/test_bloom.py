"""Bloom-filter semi-join (operators/bloom.py).

Strategy: no-false-negatives as the hard invariant (the pass set is
always a superset of the true semi-join), measured false-positive rate
against the analytic bound, bounded filter size, NULL-key semantics,
partitioning invariance, and a plan audit asserting the probed side is
never shuffled (broadcast joins only).  The driver query
`bloom_prefilter_orders` adds a bit-exact DuckDB replay of build +
probe at sf0.01.
"""

import math

import pyspark.sql.functions as F
import pytest

from face_hunter_spark.operators.bloom import (
    WORD_BITS,
    bloom_filter_table,
    bloom_prefilter,
)


def _fact(spark, n=2000, parts=4):
    return spark.range(n, numPartitions=parts).select(
        F.col("id").alias("fk"), (F.col("id") % 7).alias("payload")
    )


def _dim(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "dk long")


def test_superset_of_true_semi_join(spark):
    fact = _fact(spark)
    keys = list(range(0, 2000, 3))
    dim = _dim(spark, keys)
    passed = {
        r["fk"]
        for r in bloom_prefilter(fact, "fk", dim, "dk", m=1 << 12, k=3).collect()
    }
    assert set(keys) <= passed  # no false negatives, ever


def test_false_positive_rate_near_bound(spark):
    fact = _fact(spark, n=5000)
    keys = list(range(0, 5000, 10))  # 500 dim keys
    dim = _dim(spark, keys)
    m, k = 1 << 13, 4
    passed = {
        r["fk"] for r in bloom_prefilter(fact, "fk", dim, "dk", m=m, k=k).collect()
    }
    fp = len(passed - set(keys))
    n_neg = 5000 - len(keys)
    bound = (1 - math.exp(-k * len(keys) / m)) ** k
    # allow generous slack over the analytic expectation
    assert fp / n_neg < max(4 * bound, 0.02)


def test_filter_table_bounded_and_62bit(spark):
    dim = _dim(spark, range(1000))
    m, k = 1 << 12, 5
    bf = bloom_filter_table(dim, "dk", m=m, k=k).collect()
    assert len(bf) <= m // WORD_BITS + 1
    assert all(r["bits"] > 0 for r in bf)  # bit 63 never set -> positive


def test_null_keys_never_pass(spark):
    fact = spark.createDataFrame([(1,), (None,)], "fk long")
    dim = _dim(spark, [1])
    rows = bloom_prefilter(fact, "fk", dim, "dk", m=1 << 10, k=3).collect()
    assert [r["fk"] for r in rows] == [1]


def test_partitioning_invariance(spark):
    keys = list(range(0, 300, 2))

    def run(parts):
        fact = _fact(spark, n=600, parts=parts)
        dim = _dim(spark, keys).repartition(max(parts // 2, 1))
        return sorted(
            r["fk"]
            for r in bloom_prefilter(fact, "fk", dim, "dk", m=1 << 10, k=3).collect()
        )

    assert run(1) == run(11)


def test_plan_no_shuffle_of_fact(spark):
    fact = _fact(spark)
    dim = _dim(spark, range(100))
    plan = (
        bloom_prefilter(fact, "fk", dim, "dk", m=1 << 12, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 3  # one per probe
    # schema restored: no helper columns survive
    out = bloom_prefilter(fact, "fk", dim, "dk", m=1 << 12, k=3)
    assert out.columns == fact.columns


def test_invalid_params_raise(spark):
    dim = _dim(spark, [1])
    with pytest.raises(ValueError):
        bloom_filter_table(dim, "dk", m=10, k=2)
    with pytest.raises(ValueError):
        bloom_filter_table(dim, "dk", m=1 << 10, k=0)


def test_filter_built_once_not_k_times(spark):
    import re

    fact = spark.range(100).select(F.col("id").alias("fk"))
    dim = spark.range(50).select(F.col("id").alias("dk"))
    plan = (
        bloom_prefilter(fact, "fk", dim, "dk", m=1 << 10, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the eager localCheckpoint truncates the build subtree: the dim
    # scan and its aggregation must not appear once per probe
    assert len(re.findall(r"Range \(0, 50", plan)) == 0
    assert plan.count("HashAggregate") == 0


def test_prebuilt_filter_reuse(spark):
    fact = spark.range(200).select(F.col("id").alias("fk"))
    dim = spark.range(0, 200, 2).select(F.col("id").alias("dk"))
    bf = bloom_filter_table(dim, "dk", m=1 << 10, k=3).localCheckpoint()
    a = bloom_prefilter(fact, "fk", dim, "dk", m=1 << 10, k=3, bf=bf)
    b = bloom_prefilter(fact, "fk", dim, "dk", m=1 << 10, k=3)
    assert sorted(r["fk"] for r in a.collect()) == sorted(
        r["fk"] for r in b.collect()
    )


def test_prebuilt_filter_mismatch_raises(spark):
    dim = _dim(spark, range(40))
    bf = bloom_filter_table(dim, "dk", m=1 << 10, k=3).localCheckpoint()
    fact = _fact(spark, 100)
    with pytest.raises(ValueError, match="mismatch"):
        bloom_prefilter(fact, "fk", dim, "dk", m=1 << 12, k=3, bf=bf)
    with pytest.raises(ValueError, match="mismatch"):
        bloom_prefilter(fact, "fk", dim, "dk", m=1 << 10, k=5, bf=bf)
