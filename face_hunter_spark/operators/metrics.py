"""Evaluation metrics operator (src/models/evaluation.py:93-145).

Per-frame Jaccard accuracy / precision / recall / F1 between predicted
and true entity sets, averaged over frames (then over files for the
dataset harness).  Pure built-in array functions — a single narrow
projection plus one aggregation; Catalyst's partial aggregation gives
the running-mean behavior of the reference's np.add loop for free
(evaluation.py:63-90).

Set semantics note: the reference computes |Y∩Z| with set(intersect1d)
and |Y∪Z| with union1d (both deduplicating), but |Y| and |Z| are RAW
list lengths — duplicates in a prediction list count.  Mirrored here
exactly (size(col) vs size(array_distinct(...))).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def frame_metrics(df: DataFrame, pred_col: str = "y_pred",
                  true_col: str = "y_true") -> DataFrame:
    """Adds per-frame accuracy/precision/recall/f1 columns."""
    inter = F.size(F.array_intersect(F.array_distinct(pred_col),
                                     F.array_distinct(true_col)))
    union = F.size(F.array_union(pred_col, true_col))
    y = F.size(F.col(pred_col))
    z = F.size(F.col(true_col))
    # try_divide: an empty prediction/truth list yields NULL (skipped
    # by avg) instead of an ANSI divide-by-zero error — the reference
    # would emit numpy warnings/nans on the same inputs
    return (
        df.withColumn("accuracy", F.try_divide(inter, union))
        .withColumn("precision", F.try_divide(inter, y))
        .withColumn("recall", F.try_divide(inter, z))
        .withColumn("f1", F.try_divide(2 * inter, z + y))
    )


def evaluation_metrics(df: DataFrame, pred_col: str = "y_pred",
                       true_col: str = "y_true") -> DataFrame:
    """Frame-averaged scores: one row (accuracy, precision, recall, f1)
    — get_evaluation_metrics on a whole frame table."""
    return frame_metrics(df, pred_col, true_col).agg(
        F.avg("accuracy").alias("accuracy"),
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("f1").alias("f1"),
    )


def per_file_metrics(df: DataFrame, file_col: str = "doc_id",
                     pred_col: str = "y_pred",
                     true_col: str = "y_true") -> DataFrame:
    """Two-level average of the dataset harness (evaluation.py:63-90):
    frame-mean within each file, then mean over files."""
    per_file = (
        frame_metrics(df, pred_col, true_col)
        .groupBy(file_col)
        .agg(
            F.avg("accuracy").alias("accuracy"),
            F.avg("precision").alias("precision"),
            F.avg("recall").alias("recall"),
            F.avg("f1").alias("f1"),
        )
    )
    return per_file.agg(
        F.avg("accuracy").alias("accuracy"),
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("f1").alias("f1"),
    )


def evaluation_report(df: DataFrame, file_col: str = "doc_id",
                      pred_col: str = "y_pred",
                      true_col: str = "y_true") -> DataFrame:
    """per_file_metrics AND video_level_accuracy fused into ONE job
    (review r4: the eval harness used to run two separate collects
    over the same joined frame — two full recomputes).  One row:
    (accuracy, precision, recall, f1, video_accuracy, n_videos); both
    per-file groupings share a single shuffle on ``file_col``."""
    hit = (
        F.size(F.array_intersect(F.array_distinct(pred_col),
                                 F.array_distinct(true_col))) > 0
    ).cast("int")
    per_file = (
        frame_metrics(df, pred_col, true_col)
        .withColumn("hit", hit)
        .groupBy(file_col)
        .agg(
            F.avg("accuracy").alias("accuracy"),
            F.avg("precision").alias("precision"),
            F.avg("recall").alias("recall"),
            F.avg("f1").alias("f1"),
            F.sum("hit").alias("hits"),
            F.count(F.lit(1)).alias("frames"),
        )
        .withColumn(
            "correct",
            ((F.col("hits") / F.col("frames") > 0.1) | (F.col("hits") > 1))
            .cast("int"),
        )
    )
    return per_file.agg(
        F.avg("accuracy").alias("accuracy"),
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("f1").alias("f1"),
        F.avg("correct").alias("video_accuracy"),
        F.count(F.lit(1)).alias("n_videos"),
    )


def video_level_accuracy(
    df: DataFrame, file_col: str = "doc_id",
    pred_col: str = "y_pred", true_col: str = "y_true",
) -> DataFrame:
    """Video counted correct if >10% of its frames (or >1 frame) hit —
    evaluation.py:148-202 condition as one conditional aggregation."""
    hit = (
        F.size(F.array_intersect(F.array_distinct(pred_col),
                                 F.array_distinct(true_col))) > 0
    ).cast("int")
    per_file = (
        df.select(file_col, hit.alias("hit"))
        .groupBy(file_col)
        .agg(F.sum("hit").alias("hits"), F.count(F.lit(1)).alias("frames"))
        .withColumn(
            "correct",
            ((F.col("hits") / F.col("frames") > 0.1) | (F.col("hits") > 1))
            .cast("int"),
        )
    )
    return per_file.agg(
        F.avg("correct").alias("video_accuracy"),
        F.count(F.lit(1)).alias("n_videos"),
    )
