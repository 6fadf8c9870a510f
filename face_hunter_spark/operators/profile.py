"""One-pass table profiler: per-column null counts, numeric ranges,
HyperLogLog distinct estimates and the modal value — the data-quality
census a training-data pipeline runs over every new corpus drop before
anything else touches it.

Shape at 100 TB (the reason this is an operator and not a for-loop of
``df.select(col).distinct().count()`` calls — which would be one full
shuffle PER COLUMN):

* min/max/null counts come from ONE aggregate over the raw scan
  (zero shuffle, one row), unpivoted to per-column rows with an
  inline explode — never collected to the driver.
* distinct estimates and modal values share one melt SHAPE ((column,
  value-as-string) pairs, n_cols x amplification in the map stage
  only): HLL registers groupBy to n_cols * 2^p bounded state
  (`operators/sketch.hll_distinct` math, identical bit-for-bit), and
  the modal value is a groupBy + per-column top-1 window.  Two
  shuffles total for ANY number of columns, both of bounded or
  distinct-bounded size.  The melt subtree is EVALUATED by each
  consumer (so the raw table is scanned three times end to end) —
  deliberately not persisted: caching an n_cols-times-amplified melt
  of a 100 TB table costs more than the rescans.
* For corpora where even the per-column distinct stream is too hot,
  swap the modal-value stage for `sketch.cms_build` probes — the
  docstring trade-off is deliberate: the profiler reports EXACT modal
  counts because profiling runs once per corpus drop.

Determinism: null/modal/min/max are exact set logic; the distinct
estimate is the package's integer-state HLL, so the whole profile is
bit-identical at any partitioning and SQL-replayable (driver query
`profile_customer` replays every stage, HLL registers included, in
DuckDB).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import NumericType

from .sketch import hll_distinct

__all__ = ["profile", "histogram"]


def profile(
    df: DataFrame, columns: list[str] | None = None, hll_p: int = 12
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Returns one row per column:
    (column, dtype, n_rows, n_null, null_frac, n_distinct_est,
    top_value, top_count, min_num, max_num) — min/max_num are NULL for
    non-numeric columns; top_value is the modal non-null value as a
    string (ties broken by value ascending); n_distinct_est is the
    HLL(p=hll_p) estimate over non-null string-cast values.
    """
    cols = columns or df.columns
    types = dict(df.dtypes)
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }

    # pass 1: zero-shuffle global aggregate, unpivoted to rows.
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__z_{c}"),
            (
                F.min(F.col(c)).cast("double")
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__mn_{c}"),
            (
                F.max(F.col(c)).cast("double")
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__mx_{c}"),
        ]
    onerow = df.agg(*aggs)
    base = onerow.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__n_{c}").alias("n_rows"),
                        F.col(f"__z_{c}").alias("n_null"),
                        F.col(f"__mn_{c}").alias("min_num"),
                        F.col(f"__mx_{c}").alias("max_num"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")

    # melt: (column, value) for non-null values, string-cast.
    melted = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.col(c).cast("string").alias("val"),
                        )
                        for c in cols
                    ]
                )
            ).alias("kv")
        )
        .select("kv.column", "kv.val")
        .filter(F.col("val").isNotNull())
    )

    # grouped HLL over the melt — the SAME estimator as
    # sketch.hll_distinct(by=['column']), not a reimplementation
    hll = hll_distinct(melted, "val", p=hll_p, by=["column"]).select(
        "column", F.col("estimate").alias("n_distinct_est")
    )

    # modal value: exact top-1 per column, ties -> value ascending.
    from pyspark.sql import Window

    counts = melted.groupBy("column", "val").agg(
        F.count("*").alias("top_count")
    )
    w = Window.partitionBy("column").orderBy(
        F.desc("top_count"), F.asc("val")
    )
    top = (
        counts.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("column", F.col("val").alias("top_value"), "top_count")
    )

    out = (
        base.join(hll, "column", "left")
        .join(top, "column", "left")
        .select(
            "column",
            "n_rows",
            "n_null",
            (F.col("n_null").cast("double") / F.col("n_rows")).alias(
                "null_frac"
            ),
            "n_distinct_est",
            "top_value",
            "top_count",
            "min_num",
            "max_num",
        )
    )
    dtype_map = F.create_map(
        *[x for c in cols for x in (F.lit(c), F.lit(types[c]))]
    )
    return out.withColumn("dtype", dtype_map[F.col("column")]).select(
        "column",
        "dtype",
        "n_rows",
        "n_null",
        "null_frac",
        "n_distinct_est",
        "top_value",
        "top_count",
        "min_num",
        "max_num",
    )


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, bins: int
) -> DataFrame:
    """Fixed-width histogram of ``df[col]`` over [lo, hi): one row per
    occupied bucket (bucket int, bin_lo double, bin_hi double,
    n long), bucket 0 = underflow (< lo), bucket bins+1 = overflow
    (>= hi), NULLs and NaNs excluded (width_bucket maps NaN to NULL —
    it belongs to no interval).  Pure `width_bucket` + groupBy — a
    scan-stage expression and one bounded (<= bins+2 keys) exchange,
    the data-distribution census to run next to `profile`.
    Engine-portable: DuckDB's width_bucket has identical edge
    semantics (driver query `totalprice_histogram`)."""
    if bins < 1 or not hi > lo:
        raise ValueError("need bins >= 1 and hi > lo")
    width = (hi - lo) / bins
    b = F.width_bucket(
        F.col(col), F.lit(float(lo)), F.lit(float(hi)), F.lit(bins)
    )
    return (
        df.filter(b.isNotNull())  # drops NULL values AND NaN
        .groupBy(b.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            F.when(F.col("bucket") == 0, F.lit(float("-inf")))
            .otherwise(F.lit(lo) + (F.col("bucket") - 1) * F.lit(width))
            .alias("bin_lo"),
            F.when(F.col("bucket") == bins + 1, F.lit(float("inf")))
            .otherwise(F.lit(lo) + F.col("bucket") * F.lit(width))
            .alias("bin_hi"),
            "n",
        )
    )
