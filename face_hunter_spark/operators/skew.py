"""Skew handling: salted two-stage aggregation (SURVEY.md §4.1).

Celebrity entities are Zipf-hot: a naive groupBy(entity) sends every
mention of the hottest key to one reducer.  AQE's skew-join splitting
fixes *joins* but not hash aggregations whose partial-agg state is
itself the bottleneck (e.g. collect-type aggs, high-cardinality
composite keys).  The classic fix: shard each key into S salted
sub-keys, partially aggregate, then combine the S partials.

Only algebraic aggregates (decomposable into partial+merge) are
supported — count/sum/min/max — which covers the engine's uses
(triple counts, co-occurrence counts, lineage metrics).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {
    "count": lambda c: F.count(F.lit(1)),
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """groupBy(keys).agg(...) in two shuffle stages.

    aggs: {out_name: (fn, col)} with fn in count|sum|min|max.
    salt_source: column whose hash spreads a hot key.  Default (None)
    hashes the WHOLE row (xxhash64 over every input column) — fully
    deterministic across partitionings, so the partial-stage row->salt
    assignment is reproducible (identical duplicate rows share a salt
    bucket, which only narrows spreading for degenerate all-dup keys).
    Pass ``salt_source="__rand__"`` to opt into a uniform random salt
    (seeded, but per-partition-seeded: row assignment then depends on
    the input partitioning).
    """
    if salt_source == "__rand__":
        salt = (F.rand(seed=42) * salt_buckets).cast("int")
    elif salt_source:
        salt = F.pmod(F.xxhash64(salt_source), F.lit(salt_buckets))
    else:
        # xxhash64 rejects MapType inputs at ANY nesting depth — hash
        # the map-free columns only (salt quality is unaffected;
        # identical projections just share a bucket), and fall back to
        # the seeded random salt for the degenerate all-map schema
        hashable = [
            c for c, t in df.dtypes if "map" not in t
        ]
        if hashable:
            salt = F.pmod(
                F.xxhash64(F.struct(*[F.col(c) for c in hashable])),
                F.lit(salt_buckets),
            )
        else:
            salt = (F.rand(seed=42) * salt_buckets).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            *[
                _PARTIAL[fn](col).alias(f"_p_{name}")
                for name, (fn, col) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](f"_p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def entity_mention_counts(
    triples: DataFrame, salt_buckets: int = 16
) -> DataFrame:
    """How often each entity is depicted — THE hot-key aggregation at
    scale (Zipf celebrities).  Salted on the scene subject so one
    celebrity's mentions spread over salt_buckets reducers."""
    depicts = triples.where(
        F.col("pred") == "http://xmlns.com/foaf/0.1/depicts"
    )
    return salted_agg(
        depicts,
        keys=["obj"],
        aggs={"n_scenes": ("count", "subj")},
        salt_buckets=salt_buckets,
        salt_source="subj",
    ).withColumnRenamed("obj", "entity_uri")
