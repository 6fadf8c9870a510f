"""Small physical-plan helpers shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _plan_partitioning(df: DataFrame) -> tuple[bool, int, str]:
    """(known, numPartitions, description) of the physical plan's
    output partitioning, via the JVM handle — NO ``df.rdd`` (which
    builds the whole Python-serializer pipeline and costs driver
    seconds), no job execution (``sparkPlan()`` stops at physical
    planning).  File scans report UnknownPartitioning(0) — their split
    count isn't known until execution — which is exactly the case the
    fan-out exists for."""
    try:
        op = df._jdf.queryExecution().sparkPlan().outputPartitioning()
        desc = op.toString()
        return (not desc.startswith("UnknownPartitioning"),
                int(op.numPartitions()), desc)
    except Exception:
        return False, 0, ""


def ensure_parallelism(df: DataFrame, factor: int = 2,
                       by: str | None = None) -> DataFrame:
    """Repartition up if the input has fewer partitions than the
    cluster can use.  Small parquet scans (one file = one partition)
    otherwise serialize every downstream Python/codegen stage onto one
    or two cores — the single biggest local-bench distortion, and the
    same trap on a real cluster when a stage follows a coalesced scan.

    Partitioning-aware (VERDICT r2 #6): when the plan's output
    partitioning is KNOWN and already at least the target width — e.g.
    the input is downstream of a wide exchange — the repartition (a
    pointless full shuffle of the projection on a real cluster) is
    skipped; with ``by`` given, only if the existing partitioning
    hashes on that key (so doc-locality the caller asked for actually
    holds).  File scans report UnknownPartitioning and fan out as
    before; an explicit-count repartition is also exempt from AQE
    coalescing, so the target sticks."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    known, n, desc = _plan_partitioning(df)
    if known and n >= target and (
        by is None
        or (desc.startswith("hashpartitioning") and f"{by}#" in desc)
    ):
        return df
    return df.repartition(target, by) if by else df.repartition(target)
