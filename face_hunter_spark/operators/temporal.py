"""Temporal joins Spark lacks as built-ins: as-of join and range
(interval) join — the alignment primitives of feature/label assembly
over event streams (join each observation to the most recent state, or
to every covering interval).

Both avoid the naive shapes that die at scale:

* ``asof_join`` is NOT a windowed cross join: both sides union into
  one relation, one hash shuffle on the key, one within-partition
  sort, and a running ``last(..., ignorenulls=True)`` carries the
  most recent right row forward onto each left row.  Cost ==
  sort-merge join, output == left row count, no candidate explosion.
  (The pandas merge_asof semantics, distributed.)
* ``range_join`` is NOT a theta join: intervals explode to the
  fixed-width time bins they overlap, the probe side computes its one
  bin, and an equi-join on (key, bin) + a residual BETWEEN filter
  yields exact matches.  Shuffle volume = rows x (interval/bin_width)
  — pick ``bin_width`` near the typical interval length so the
  explosion factor stays O(1).  This is the standard binned-interval
  equi-join (what Databricks' range-join hint does under the hood).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["asof_join", "range_join"]


def _epoch_seconds(df: DataFrame, col: str):
    """Numeric seconds for binning/tolerance arithmetic.  TIMESTAMP_NTZ
    refuses a direct double cast in Spark 4; route temporal types
    through TIMESTAMP first (session-tz — consistent on both join
    sides, and bins only need a shared monotone mapping)."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    c = F.col(col)
    if isinstance(
        df.schema[col].dataType,
        (TimestampType, TimestampNTZType, DateType),
    ):
        c = c.cast("timestamp")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on`` <= left's ``on`` within the same ``by`` group (backward
    as-of, inclusive — a right row AT the left timestamp matches).
    Left rows with no prior right row keep nulls (left-join
    semantics).  ``tolerance_s`` nulls matches older than the window.

    Right rows should be unique per (by, on); with duplicates the
    last in (on, input-order) wins — pre-aggregate if that matters.
    """
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in by and c != on
        ]
    matched = [f"{c}{suffix}" for c in right_cols] + [f"{on}{suffix}"]

    lhs = left.select(
        *left.columns,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols],
        F.lit(None).cast(right.schema[on].dataType).alias("__r_on"),
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by and c != on],
        *[F.col(c) for c in by], F.col(on),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(on).alias("__r_on"),
    )
    # right rows sort BEFORE left rows at equal timestamps -> inclusive
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs)
    pairs = [(f"__r_{c}", f"{c}{suffix}") for c in right_cols]
    pairs.append(("__r_on", f"{on}{suffix}"))
    for src, dst in pairs:
        carried = carried.withColumn(
            dst, F.last(F.col(src), ignorenulls=True).over(w)
        )
    out = carried.where("__is_left = 1").drop(
        "__is_left", *[f"__r_{c}" for c in right_cols], "__r_on"
    )
    if tolerance_s is not None:
        too_old = (
            _epoch_seconds(out, on) - _epoch_seconds(out, f"{on}{suffix}")
        ) > float(tolerance_s)
        for c in matched:
            out = out.withColumn(
                c, F.when(too_old, F.lit(None)).otherwise(F.col(c))
            )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    by: str | list[str] | None = None,
    bin_width_s: float = 300.0,
) -> DataFrame:
    """Inner-join each left row to every right interval covering it:
    ``start <= on <= end`` (inclusive both ends), optionally also
    equi-keyed on ``by``.  Exact results via binned equi-join + a
    residual filter — never a theta/cross join."""
    if bin_width_s <= 0:
        raise ValueError("bin_width_s must be > 0")
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    w = float(bin_width_s)

    lbin = F.floor(_epoch_seconds(left, on) / w)
    lhs = left.withColumn("__bin", lbin)
    rbins = F.sequence(
        F.floor(_epoch_seconds(right, start) / w).cast("long"),
        F.floor(_epoch_seconds(right, end) / w).cast("long"),
    )
    rhs = right.withColumn("__bin", F.explode(rbins))
    joined = lhs.join(rhs, on=by + ["__bin"], how="inner").where(
        (F.col(on) >= F.col(start)) & (F.col(on) <= F.col(end))
    )
    return joined.drop("__bin")
