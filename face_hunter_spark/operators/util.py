"""Small physical-plan helpers shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, factor: int = 2,
                       by: str | None = None) -> DataFrame:
    """Repartition up if the input has fewer partitions than the
    cluster can use.  Small parquet scans (one file = one partition)
    otherwise serialize every downstream Python/codegen stage onto one
    or two cores — the single biggest local-bench distortion, and the
    same trap on a real cluster when a stage follows a coalesced scan.
    Never shrinks an already-parallel input (repartitioning down would
    add a shuffle for nothing)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    # NB: deliberately no df.rdd.getNumPartitions() guard — converting
    # the plan to an RDD just to count partitions costs seconds of
    # driver time per query (it builds the whole Python-serializer
    # pipeline).  Call sites are narrow scans where fanning out is
    # always right; an explicit-count repartition is also exempt from
    # AQE coalescing, so the target sticks.
    return df.repartition(target, by) if by else df.repartition(target)
