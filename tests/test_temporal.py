"""Temporal join operators (operators/temporal.py): backward as-of
join and binned interval (range) join.

Correctness strategy: small hand-built frames with known answers, a
pandas.merge_asof cross-check on random data (the same semantics,
independently implemented), and a bin-width invariance property for
range_join (results must not depend on the binning parameter).  The
driver queries `asof_last_purchase` / `range_join_session_hits` add
the DuckDB ASOF/theta-join oracles at sf0.01.
"""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from face_hunter_spark.operators.temporal import asof_join, range_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_backward_inclusive(spark):
    left = _mk(
        spark,
        [("e1", 1, 10.0), ("e2", 1, 25.0), ("e3", 2, 5.0)],
        "event_id string, user_id int, ts double",
    )
    right = _mk(
        spark,
        [(1, 10.0, 100.0), (1, 20.0, 200.0), (2, 9.0, 50.0)],
        "user_id int, ts double, value double",
    )
    out = {
        r["event_id"]: (r["value_r"], r["ts_r"])
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }
    # e1: right row AT ts=10 matches (inclusive)
    assert out["e1"] == (100.0, 10.0)
    # e2: most recent <= 25 is ts=20
    assert out["e2"] == (200.0, 20.0)
    # e3: user 2 has no right row <= 5 -> nulls, row kept
    assert out["e3"] == (None, None)


def test_asof_tolerance(spark):
    left = _mk(spark, [("a", 1, 100.0)], "event_id string, user_id int, ts double")
    right = _mk(spark, [(1, 10.0, 7.0)], "user_id int, ts double, value double")
    ok = asof_join(left, right, tolerance_s=95.0).collect()[0]
    assert ok["value_r"] == 7.0
    gone = asof_join(left, right, tolerance_s=60.0).collect()[0]
    assert gone["value_r"] is None and gone["ts_r"] is None


def test_asof_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(7)
    lpdf = pd.DataFrame(
        {
            "event_id": np.arange(300),
            "user_id": rng.integers(0, 10, 300),
            "ts": rng.uniform(0, 1000, 300).round(3),
        }
    )
    rpdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, 10, 120),
            "ts": rng.uniform(0, 1000, 120).round(3),
            "value": rng.uniform(0, 1, 120).round(6),
        }
    )
    # merge_asof needs unique (by, on) on the right for a deterministic
    # comparison; dedupe both frames' key+ts.
    rpdf = rpdf.drop_duplicates(["user_id", "ts"])
    expected = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",
        suffixes=("", "_r"),
    ).sort_values("event_id")

    got = (
        asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            on="ts",
            by="user_id",
            right_cols=["value"],
        )
        .orderBy("event_id")
        .toPandas()
    )
    assert len(got) == len(expected) == 300
    exp_v = expected["value"].to_numpy()
    got_v = got["value_r"].to_numpy()
    both_nan = np.isnan(exp_v) & np.isnan(got_v)
    assert bool(np.all(both_nan | (exp_v == got_v)))


def test_asof_single_shuffle_no_join_node(spark):
    """The plan shape IS the operator's reason to exist: one hash
    exchange on the by-key feeding a window sort — no SortMergeJoin,
    no BroadcastNestedLoopJoin, no cartesian product."""
    left = _mk(spark, [("a", 1, 1.0)], "event_id string, user_id int, ts double")
    right = _mk(spark, [(1, 1.0, 2.0)], "user_id int, ts double, value double")
    plan = (
        asof_join(left, right)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("SortMergeJoin", "NestedLoop", "CartesianProduct"):
        assert bad not in plan, plan


def test_range_join_basic(spark):
    left = _mk(
        spark,
        [("c1", 1, 50.0), ("c2", 1, 350.0), ("c3", 2, 50.0)],
        "click_id string, user_id int, ts double",
    )
    right = _mk(
        spark,
        [("s1", 1, 0.0, 100.0), ("s2", 1, 40.0, 400.0), ("s3", 2, 60.0, 70.0)],
        "signup_id string, user_id int, start_ts double, end_ts double",
    )
    got = sorted(
        (r["click_id"], r["signup_id"])
        for r in range_join(
            left, right, by="user_id", bin_width_s=30.0
        ).collect()
    )
    # c1@50 covered by s1[0,100] and s2[40,400]; c2@350 only s2;
    # c3@50 for user 2 misses s3[60,70].
    assert got == [("c1", "s1"), ("c1", "s2"), ("c2", "s2")]


def test_range_join_inclusive_endpoints_and_bin_invariance(spark):
    left = _mk(
        spark,
        [("a", 10.0), ("b", 20.0), ("c", 9.999), ("d", 20.001)],
        "click_id string, ts double",
    )
    right = _mk(spark, [("i", 10.0, 20.0)], "signup_id string, start_ts double, end_ts double")
    expected = [("a", "i"), ("b", "i")]  # both endpoints inclusive
    for bw in (1.0, 7.0, 1000.0):
        got = sorted(
            (r["click_id"], r["signup_id"])
            for r in range_join(left, right, bin_width_s=bw).collect()
        )
        assert got == expected, f"bin_width={bw}"


def test_range_join_timestamp_ntz_columns(spark):
    """Driver testdata carries TIMESTAMP_NTZ event times; the epoch
    helper must route them through a timestamp cast (a straight double
    cast is an AnalysisException in Spark 4)."""
    left = spark.sql(
        "SELECT 'c' AS click_id, TIMESTAMP_NTZ'2024-01-01 00:30:00' AS ts"
    )
    right = spark.sql(
        """SELECT 's' AS signup_id,
                  TIMESTAMP_NTZ'2024-01-01 00:00:00' AS start_ts,
                  TIMESTAMP_NTZ'2024-01-01 01:00:00' AS end_ts"""
    )
    rows = range_join(left, right, bin_width_s=600.0).collect()
    assert [(r["click_id"], r["signup_id"]) for r in rows] == [("c", "s")]

    aleft = spark.sql(
        "SELECT 'e' AS event_id, 1 AS user_id, TIMESTAMP_NTZ'2024-01-01 01:00:00' AS ts"
    )
    aright = spark.sql(
        "SELECT 1 AS user_id, TIMESTAMP_NTZ'2024-01-01 00:00:00' AS ts, 5.0 AS value"
    )
    r = asof_join(aleft, aright, tolerance_s=3000.0).collect()[0]
    assert r["value_r"] is None  # 3600s gap > 3000s tolerance
    r2 = asof_join(aleft, aright, tolerance_s=4000.0).collect()[0]
    assert r2["value_r"] == 5.0
