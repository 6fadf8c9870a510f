"""Metric goldens from the reference test suite
(reference tests/test_evaluation.py:8-42): same inputs, same expected
[accuracy, precision, recall, f1] vectors."""

import numpy as np
import pandas as pd
import pytest

from face_hunter_spark.operators.metrics import (
    evaluation_metrics,
    video_level_accuracy,
)


def run(spark, y_pred, y_true):
    pdf = pd.DataFrame({"y_pred": y_pred, "y_true": y_true})
    df = spark.createDataFrame(pdf)
    r = evaluation_metrics(df).collect()[0]
    return [r.accuracy, r.precision, r.recall, r.f1]


def test_half(spark):
    got = run(spark, [["Sandler"], ["Sandler"]], [["Sandler"], ["Bullock"]])
    assert got == [0.5, 0.5, 0.5, 0.5]


def test_perfect(spark):
    assert run(spark, [["Sandler"]], [["Sandler"]]) == [1.0, 1.0, 1.0, 1.0]


def test_multiple_entities(spark):
    got = run(
        spark,
        [["Sandler", "Bullock"]] * 3,
        [["Sandler"], ["Sandler", "Bullock"], ["Sandler", "Aniston"]],
    )
    assert np.allclose(got, [0.61111111, 0.66666667, 0.83333333, 0.72222222])


def test_nothing_equal(spark):
    assert run(spark, [["Sandler"]], [["Bullock"]]) == [0.0, 0.0, 0.0, 0.0]


def test_video_level(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": ["a"] * 10 + ["b"] * 10,
            # a: 2 hits of 10 (>1 frame -> correct); b: 0 hits
            "y_pred": [["X"]] * 2 + [["u"]] * 8 + [["u"]] * 10,
            "y_true": [["X"]] * 20,
        }
    )
    r = video_level_accuracy(spark.createDataFrame(pdf)).collect()[0]
    assert r.video_accuracy == 0.5 and r.n_videos == 2


def test_evaluation_report_fuses_both_families(spark):
    """evaluation_report (one job) reproduces per_file_metrics +
    video_level_accuracy exactly on a mixed corpus."""
    from face_hunter_spark.operators.metrics import (
        evaluation_report,
        per_file_metrics,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": ["a"] * 10 + ["b"] * 10 + ["c"] * 4,
            "y_pred": (
                [["X"]] * 2 + [["u"]] * 8          # a: 2/10 hits
                + [["u"]] * 10                      # b: 0 hits
                + [["X", "Y"], ["X"], ["u"], ["Y"]]  # c: 3/4 hits
            ),
            "y_true": [["X"]] * 20 + [["X", "Y"]] * 4,
        }
    )
    df = spark.createDataFrame(pdf)
    fused = evaluation_report(df).collect()[0]
    fm = per_file_metrics(df).collect()[0]
    va = video_level_accuracy(df).collect()[0]
    assert (fused.accuracy, fused.precision, fused.recall, fused.f1) == (
        fm.accuracy, fm.precision, fm.recall, fm.f1
    )
    assert fused.video_accuracy == va.video_accuracy
    assert fused.n_videos == va.n_videos == 3
