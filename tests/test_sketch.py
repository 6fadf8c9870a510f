"""Cardinality sketches (operators/sketch.py): KMV and HyperLogLog.

Correctness strategy: accuracy bounds against the true distinct count
on synthetic corpora (the estimators' published standard errors give
generous 5-sigma bands), exact-mode behavior below the sketch size,
partitioning invariance (the determinism claim), and plan-shape audits
(KMV's limit must plan as TakeOrderedAndProject, not a global sort;
HLL must be a single partial-aggregated groupBy with no UDFs).  The
driver queries `kmv_distinct_customers` / `hll_distinct_orders` add
bit-exact DuckDB replays at sf0.01.
"""

import pyspark.sql.functions as F
import pytest

from face_hunter_spark.operators.sketch import hll_distinct, kmv_distinct


def _vals(spark, n, parts=4, prefix="v"):
    return spark.range(n, numPartitions=parts).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("x")
    )


def test_kmv_exact_below_k(spark):
    df = _vals(spark, 100)
    row = kmv_distinct(df, "x", k=256).collect()[0]
    assert row["n_min"] == 100
    assert row["estimate"] == 100.0


def test_kmv_estimate_within_bounds(spark):
    n = 20_000
    row = kmv_distinct(_vals(spark, n), "x", k=1024).collect()[0]
    # se ~ 1/sqrt(k-2) ~ 3.1%; allow 5 sigma
    assert abs(row["estimate"] - n) / n < 0.16
    assert row["n_min"] == 1024


def test_kmv_duplicates_ignored(spark):
    base = _vals(spark, 500)
    dup = base.unionAll(base).unionAll(base)
    a = kmv_distinct(base, "x", k=128).collect()[0]
    b = kmv_distinct(dup, "x", k=128).collect()[0]
    assert a == b


def test_kmv_partitioning_invariance(spark):
    df = _vals(spark, 5000)
    a = kmv_distinct(df.repartition(1), "x", k=64).collect()[0]
    b = kmv_distinct(df.repartition(13), "x", k=64).collect()[0]
    assert a == b


def test_kmv_plan_is_take_ordered(spark):
    plan = (
        kmv_distinct(_vals(spark, 100), "x", k=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "GlobalSort" not in plan and ", Sort " not in plan


def test_hll_estimate_within_bounds(spark):
    n = 30_000
    row = hll_distinct(_vals(spark, n), "x", p=12).collect()[0]
    # se ~ 1.04/sqrt(4096) ~ 1.6%; allow 5 sigma
    assert abs(row["estimate"] - n) / n < 0.09


def test_hll_small_range_linear_counting(spark):
    n = 200
    row = hll_distinct(_vals(spark, n), "x", p=12).collect()[0]
    assert row["v_zero"] > 0
    # linear counting at this occupancy is very tight
    assert abs(row["estimate"] - n) / n < 0.05


def test_hll_partitioning_invariance(spark):
    df = _vals(spark, 10_000)
    a = hll_distinct(df.repartition(1), "x", p=10).collect()[0]
    b = hll_distinct(df.repartition(17), "x", p=10).collect()[0]
    assert a == b  # bit-identical, including the double estimate


def test_hll_register_count_bounded(spark):
    row = hll_distinct(_vals(spark, 50_000), "x", p=8).collect()[0]
    assert row["n_reg"] <= 256
    assert row["v_zero"] == 256 - row["n_reg"]


def test_hll_plan_single_partial_groupby_no_udf(spark):
    plan = (
        hll_distinct(_vals(spark, 100), "x", p=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # two-phase hash aggregate over the register keys
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_hll_invalid_p_raises(spark):
    df = _vals(spark, 10)
    with pytest.raises(ValueError):
        hll_distinct(df, "x", p=3)
    with pytest.raises(ValueError):
        kmv_distinct(df, "x", k=1)


# --- count-min sketch ---

from face_hunter_spark.operators.sketch import cms_build, cms_estimate  # noqa: E402


def _freq_df(spark, spec, parts=4):
    """spec: {value: count} -> one row per occurrence."""
    rows = [(v,) for v, c in spec.items() for _ in range(c)]
    return spark.createDataFrame(rows, "x string").repartition(parts)


def test_cms_exact_when_sparse(spark):
    spec = {f"k{i}": i + 1 for i in range(20)}
    df = _freq_df(spark, spec)
    cms = cms_build(df, "x", d=4, w=4096)
    items = spark.createDataFrame([(k,) for k in spec], "x string")
    est = {r["x"]: r["est"] for r in cms_estimate(cms, items, "x", d=4, w=4096).collect()}
    assert est == spec  # no collisions at this occupancy


def test_cms_never_underestimates(spark):
    spec = {f"v{i}": (i % 7) + 1 for i in range(300)}
    df = _freq_df(spark, spec)
    cms = cms_build(df, "x", d=3, w=64)  # heavy collisions on purpose
    items = spark.createDataFrame([(k,) for k in spec], "x string")
    for r in cms_estimate(cms, items, "x", d=3, w=64).collect():
        assert r["est"] >= spec[r["x"]]


def test_cms_sketch_size_bounded(spark):
    df = _freq_df(spark, {f"v{i}": 2 for i in range(500)})
    cms = cms_build(df, "x", d=3, w=32)
    assert cms.count() <= 3 * 32
    total = cms.groupBy("row").sum("cnt").collect()
    assert all(r["sum(cnt)"] == 1000 for r in total)  # each row sees every item


def test_cms_partitioning_invariance(spark):
    spec = {f"v{i}": i % 5 + 1 for i in range(100)}
    items = spark.createDataFrame([(k,) for k in spec], "x string")

    def run(parts):
        cms = cms_build(_freq_df(spark, spec, parts), "x", d=4, w=128)
        return sorted(
            (r["x"], r["est"])
            for r in cms_estimate(cms, items, "x", d=4, w=128).collect()
        )

    assert run(1) == run(13)


def test_cms_unseen_item_zero_when_sparse(spark):
    cms = cms_build(_freq_df(spark, {"a": 5, "b": 3}), "x", d=4, w=4096)
    items = spark.createDataFrame([("zzz-never-seen",)], "x string")
    row = cms_estimate(cms, items, "x", d=4, w=4096).collect()[0]
    assert row["est"] == 0


def test_cms_invalid_params_raise(spark):
    df = _freq_df(spark, {"a": 1})
    with pytest.raises(ValueError):
        cms_build(df, "x", d=0, w=16)
    with pytest.raises(ValueError):
        cms_build(df, "x", d=2, w=1)


def test_hll_grouped_by_key(spark):
    df = spark.range(30_000, numPartitions=6).select(
        (F.col("id") % 3).alias("grp"),
        F.concat(
            (F.col("id") % 3).cast("string"), F.lit(":"),
            F.when(F.col("id") % 3 == 0, F.col("id") % 50)      # grp 0: 50
            .when(F.col("id") % 3 == 1, F.col("id") % 700)      # grp 1: 700
            .otherwise(F.col("id")).cast("string")              # grp 2: 10k
        ).alias("x"),
    )
    from face_hunter_spark.operators.sketch import hll_distinct

    rows = {r["grp"]: r for r in hll_distinct(df, "x", p=11, by=["grp"]).collect()}
    assert len(rows) == 3
    for grp, true in [(0, 50), (1, 700), (2, 10_000)]:
        est = rows[grp]["estimate"]
        assert abs(est - true) / true < 0.12, (grp, est)


def test_hll_grouped_matches_global_per_group(spark):
    # a single-group grouped run must equal the global sketch exactly
    df = spark.range(5000).select(
        F.lit("only").alias("g"), F.col("id").cast("string").alias("x")
    )
    from face_hunter_spark.operators.sketch import hll_distinct

    grouped = hll_distinct(df, "x", p=10, by=["g"]).collect()[0]
    flat = hll_distinct(df, "x", p=10).collect()[0]
    assert (grouped["estimate"], grouped["n_reg"], grouped["v_zero"]) == (
        flat["estimate"], flat["n_reg"], flat["v_zero"]
    )


def test_cms_estimate_builds_sketch_once(spark):
    import re

    data = spark.range(1000).select(F.col("id").alias("x"))
    cms = cms_build(data, "x", d=4, w=64)
    items = spark.range(10).select(F.col("id").alias("x"))
    plan = (
        cms_estimate(cms, items, "x", d=4, w=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the eager localCheckpoint truncates the build: the input corpus
    # must not be rescanned once per hash row
    assert len(re.findall(r"Range \(0, 1000", plan)) == 0


def test_sketches_ignore_nulls_and_empty_input(spark):
    from face_hunter_spark.operators.sketch import hll_distinct, kmv_distinct

    withnulls = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,), ("c",)], "x string"
    )
    k = kmv_distinct(withnulls, "x", k=16).collect()[0]
    assert k["estimate"] == 3.0 and k["n_min"] == 3  # count_distinct semantics
    h = hll_distinct(withnulls, "x", p=8).collect()[0]
    clean = hll_distinct(withnulls.filter("x IS NOT NULL"), "x", p=8).collect()[0]
    assert h == clean  # NULLs contribute nothing, bit-for-bit
    empty = hll_distinct(withnulls.filter("x IS NULL AND x IS NOT NULL"), "x", p=8)
    assert empty.collect()[0]["estimate"] == 0.0  # not NULL


def test_cms_estimate_passes_items_columns_through(spark):
    items = spark.createDataFrame(
        [("a", "keep-me"), ("b", "me-too")], "x string, label string"
    )
    cms = cms_build(_freq_df(spark, {"a": 4, "b": 1}), "x", d=3, w=256)
    rows = {r["x"]: r for r in cms_estimate(cms, items, "x", d=3, w=256).collect()}
    assert rows["a"]["label"] == "keep-me" and rows["a"]["est"] == 4
    assert rows["b"]["label"] == "me-too" and rows["b"]["est"] == 1


# --- KMV set operations ---

from face_hunter_spark.operators.sketch import (  # noqa: E402
    kmv_set_estimates,
    kmv_sketch,
)


def test_kmv_set_ops_exact_below_k(spark):
    a = _vals(spark, 60, prefix="x")  # x0..x59
    b = spark.range(40, 100).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("x")
    )  # x40..x99 -> overlap 20, union 100
    row = kmv_set_estimates(
        kmv_sketch(a, "x", k=512), kmv_sketch(b, "x", k=512), k=512
    ).collect()[0]
    assert row["union_est"] == 100.0
    assert row["n_both"] == 20
    assert abs(row["jaccard"] - 0.2) < 1e-12
    assert abs(row["intersect_est"] - 20.0) < 1e-9


def test_kmv_set_ops_estimation_regime(spark):
    n, half = 20_000, 10_000
    a = _vals(spark, n)  # v0..v19999
    b = spark.range(half, n + half).select(
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("x")
    )  # v10000..v29999: overlap 10k, union 30k, J = 1/3
    row = kmv_set_estimates(
        kmv_sketch(a, "x", k=1024), kmv_sketch(b, "x", k=1024), k=1024
    ).collect()[0]
    assert abs(row["union_est"] - 30_000) / 30_000 < 0.16
    assert abs(row["jaccard"] - 1 / 3) < 0.08
    assert abs(row["intersect_est"] - 10_000) / 10_000 < 0.25


def test_kmv_set_ops_disjoint_and_identical(spark):
    a = _vals(spark, 500, prefix="a")
    b = _vals(spark, 500, prefix="b")
    d = kmv_set_estimates(
        kmv_sketch(a, "x", k=256), kmv_sketch(b, "x", k=256), k=256
    ).collect()[0]
    assert d["n_both"] == 0 and d["jaccard"] == 0.0
    s = kmv_set_estimates(
        kmv_sketch(a, "x", k=256), kmv_sketch(a, "x", k=256), k=256
    ).collect()[0]
    assert s["jaccard"] == 1.0
    assert s["intersect_est"] == s["union_est"]


def test_kmv_set_ops_partitioning_invariance(spark):
    def run(parts):
        a = _vals(spark, 3000, parts=parts)
        b = _vals(spark, 3000, parts=parts, prefix="w")
        return kmv_set_estimates(
            kmv_sketch(a, "x", k=128), kmv_sketch(b, "x", k=128), k=128
        ).collect()[0]

    assert run(1) == run(9)
