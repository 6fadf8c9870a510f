"""Table profiler (operators/profile.py).

Strategy: exact fields (nulls, min/max, modal value) against a
hand-computable corpus; the HLL distinct estimate against true counts
within the published error band and bit-identical across
partitionings; empty/all-null columns; a plan audit asserting the
melt-based shape (no per-column shuffle cascade).  Driver query
`profile_customer` adds the full bit-exact DuckDB replay at sf0.01.
"""

import pyspark.sql.functions as F

from face_hunter_spark.operators.profile import profile


def _df(spark, parts=4):
    rows = [
        (1, "a", 10.0),
        (2, "b", None),
        (3, "a", 30.0),
        (None, "a", 40.0),
        (5, None, 50.0),
        (6, "c", 60.0),
    ]
    return spark.createDataFrame(
        rows, "ident long, cat string, score double"
    ).repartition(parts)


def test_profile_exact_fields(spark):
    p = {r["column"]: r for r in profile(_df(spark)).collect()}
    assert p["ident"]["n_rows"] == 6 and p["ident"]["n_null"] == 1
    assert abs(p["ident"]["null_frac"] - 1 / 6) < 1e-12
    assert (p["ident"]["min_num"], p["ident"]["max_num"]) == (1.0, 6.0)
    assert p["cat"]["top_value"] == "a" and p["cat"]["top_count"] == 3
    assert p["cat"]["min_num"] is None and p["cat"]["max_num"] is None
    assert p["score"]["min_num"] == 10.0 and p["score"]["max_num"] == 60.0
    assert p["ident"]["dtype"] == "bigint" and p["cat"]["dtype"] == "string"


def test_profile_modal_tie_breaks_ascending(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), ("b",), ("a",)], "x string"
    )
    row = profile(df).collect()[0]
    assert row["top_value"] == "a" and row["top_count"] == 2


def test_profile_distinct_estimate_accuracy(spark):
    df = spark.range(20_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("small"),
    )
    p = {r["column"]: r for r in profile(df, hll_p=12).collect()}
    assert abs(p["k"]["n_distinct_est"] - 20_000) / 20_000 < 0.09
    # linear-counting regime is near-exact
    assert abs(p["small"]["n_distinct_est"] - 100) < 3


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "a long, b string")
    p = {r["column"]: r for r in profile(df).collect()}
    assert p["b"]["n_null"] == 2 and p["b"]["null_frac"] == 1.0
    assert p["b"]["n_distinct_est"] is None  # no non-null values
    assert p["b"]["top_value"] is None


def test_profile_partitioning_invariance(spark):
    a = sorted(map(tuple, profile(_df(spark, 1)).collect()))
    b = sorted(map(tuple, profile(_df(spark, 7)).collect()))
    assert a == b  # including the double-typed HLL estimates


def test_profile_column_subset(spark):
    out = profile(_df(spark), columns=["cat"])
    assert [r["column"] for r in out.collect()] == ["cat"]


def test_profile_plan_shape(spark):
    plan = (
        profile(_df(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # melt-based: the raw table is scanned a bounded number of times
    # (1 global agg + 1 melt reused by HLL and modal stages), never
    # once per column
    assert plan.count("Scan ExistingRDD") <= 4


# --- histogram ---

from face_hunter_spark.operators.profile import histogram  # noqa: E402


def test_histogram_buckets_and_overflow(spark):
    df = spark.createDataFrame(
        [(x,) for x in [-5.0, 0.0, 1.0, 9.9, 10.0, 15.0, 25.0, None]],
        "v double",
    )
    rows = {r["bucket"]: r for r in histogram(df, "v", 0.0, 20.0, 2).collect()}
    assert rows[0]["n"] == 1 and rows[0]["bin_lo"] == float("-inf")  # -5
    assert rows[1]["n"] == 3  # 0, 1, 9.9 in [0, 10)
    assert rows[2]["n"] == 2  # 10, 15 in [10, 20)
    assert rows[3]["n"] == 1 and rows[3]["bin_hi"] == float("inf")  # 25
    assert sum(r["n"] for r in rows.values()) == 7  # NULL excluded


def test_histogram_invalid_params(spark):
    import pytest

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        histogram(df, "v", 0.0, 10.0, 0)
    with pytest.raises(ValueError):
        histogram(df, "v", 10.0, 10.0, 4)


def test_histogram_excludes_nan(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (5.0,), (None,)], "v double"
    )
    rows = histogram(df, "v", 0.0, 10.0, 2).collect()
    assert all(r["bucket"] is not None for r in rows)
    assert sum(r["n"] for r in rows) == 2  # NaN and NULL both excluded
