"""Weighted sampling (operators/corpus.py::weighted_sample).

Strategy: determinism and partitioning invariance, weight-biased
selection across independent salts, non-positive/NULL weight
exclusion, the TakeOrderedAndProject plan shape, and the loud
max_weight bound.  Driver query `weighted_sample_orders` adds the
bit-exact DuckDB replay of the integer race keys.
"""

# --- weighted sampling ---

from face_hunter_spark.operators.corpus import weighted_sample  # noqa: E402


def _wdf(spark, spec, parts=4):
    return spark.createDataFrame(
        [(k, w) for k, w in spec.items()], "doc_id string, w long"
    ).repartition(parts)


def test_weighted_sample_deterministic_and_partition_invariant(spark):
    spec = {f"d{i}": (i % 9) + 1 for i in range(200)}

    def run(parts):
        return sorted(
            r["doc_id"]
            for r in weighted_sample(_wdf(spark, spec, parts), "w", 20).collect()
        )

    assert run(1) == run(11)
    assert len(run(1)) == 20


def test_weighted_sample_bias_follows_weights(spark):
    # two-point corpus: heavy items must win far more often across
    # independent salts (each salt = an independent draw)
    import pyspark.sql.functions as F

    spec = {f"h{i}": 50 for i in range(20)} | {f"l{i}": 1 for i in range(20)}
    df = _wdf(spark, spec)
    heavy = 0
    for s in range(12):
        got = weighted_sample(df, "w", 5, salt=f"s{s}").collect()
        heavy += sum(1 for r in got if r["doc_id"].startswith("h"))
    # P[heavy wins a slot] ~ 50/51 per pairwise race; expect >> half
    assert heavy > 0.8 * 12 * 5


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    df = spark.createDataFrame(
        [("a", 5), ("zero", 0), ("neg", -3), ("null", None)],
        "doc_id string, w long",
    )
    got = [r["doc_id"] for r in weighted_sample(df, "w", 10).collect()]
    assert got == ["a"]


def test_weighted_sample_plan_take_ordered(spark):
    df = _wdf(spark, {f"d{i}": 3 for i in range(50)})
    plan = (
        weighted_sample(df, "w", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_max_weight_loud(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame([("big", 50_000)], "doc_id string, w long")
    with pytest.raises(Exception):
        weighted_sample(df, "w", 1, max_weight=10_000).collect()


def test_weighted_sample_invalid_n(spark):
    import pytest

    with pytest.raises(ValueError):
        weighted_sample(_wdf(spark, {"a": 1}), "w", 0)
