"""Distributed k-means (Lloyd's) as pure DataFrame ops.

The reference has no clustering operator; this is part of the
training-data suite (corpus partitioning for curriculum/mixture
construction, IVF coarse quantizers — similarity.py's IVF cells are
exactly a one-assignment-step special case of this loop).

Physical shape per iteration (the scale story):

* ASSIGN is a scan-stage expression: the k centroids ride into the
  executors as literal arrays (O(k·dim), driver-broadcast by plan
  serialization), each row evaluates k fold-summed squared distances
  inside whole-stage codegen and takes the lexicographic argmin —
  vectors never shuffle.
* UPDATE is one groupBy((cluster, dim)) over posexploded values with
  map-side combine: what crosses the wire is k·dim partial sums per
  map partition, independent of corpus size.  The new centroids
  (k·dim doubles) collect to the driver — the same O(k·dim) driver
  state MLlib's KMeans keeps.
* The prepared input is persisted once so the n_iter passes re-scan
  cached partitions, not the upstream lineage.

So a 10^12-row corpus runs n_iter scans + n_iter tiny shuffles; no
stage ever materializes more than k·dim rows per partition.

Determinism contract: for INTEGER-VALUED vector components every
cross-row sum is exact (doubles are exact integers below 2^53), so the
result is bit-identical regardless of partitioning — and reproducible
on a different engine with the same fold order.  The driver query
quantizes its input to integer-valued doubles for that reason; on
arbitrary floats the algorithm is still correct but the usual
float-sum order caveats apply.

Init is the md5-ordered prefix (same device as similarity.py's IVF
centroid pick): deterministic, engine-portable, and as arbitrary as
random for hash-distributed ids.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["kmeans", "assign_clusters"]


def _sq_dist(vec_col, centroid: list[float]):
    """Fold-summed squared euclidean distance to a literal centroid:
    0.0 + d_0 + d_1 + ... (left-to-right, the order an unrolled
    ``(v[1]-c[1])*(v[1]-c[1]) + ...`` SQL expression adds in)."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "vec",
    out_col: str = "cluster",
) -> DataFrame:
    """Attach the argmin-distance cluster index (ties -> lowest index,
    via lexicographic struct min on (dist, idx))."""
    v = F.col(vec_col)
    dists = F.array(*[
        F.struct(_sq_dist(v, c).alias("d"), F.lit(j).alias("j"))
        for j, c in enumerate(centroids)
    ])
    return df.withColumn(out_col, F.array_min(dists)["j"])


def kmeans(
    df: DataFrame,
    vec_col: str = "vec",
    id_col: str = "id",
    k: int = 8,
    n_iter: int = 5,
    init_centroids: list[list[float]] | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means; returns (assignments (id, cluster), final
    centroids).  Empty clusters keep their previous centroid (same
    carry-over the oracle SQL mirrors with a COALESCE join)."""
    if k < 1 or n_iter < 1:
        raise ValueError("k and n_iter must be >= 1")
    prepared = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).persist()
    try:
        if init_centroids is None:
            rows = (
                prepared.orderBy(F.md5(F.col("id").cast("string")), "id")
                .limit(k)
                .collect()
            )
            centroids = [list(r.v) for r in rows]
        else:
            centroids = [list(map(float, c)) for c in init_centroids]
        if not centroids:
            raise ValueError("empty input: no centroids to initialize")
        dim = len(centroids[0])

        for _ in range(n_iter):
            assigned = assign_clusters(prepared, centroids, vec_col="v")
            stats = (
                assigned.select(
                    "cluster", F.posexplode("v").alias("dim", "val")
                )
                .groupBy("cluster", "dim")
                .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            sums: dict[int, list[float]] = {}
            counts: dict[int, int] = {}
            for r in stats:
                sums.setdefault(r.cluster, [0.0] * dim)[r.dim] = r.s
                counts[r.cluster] = r.n
            centroids = [
                [sums[j][d] / counts[j] for d in range(dim)]
                if j in counts else centroids[j]
                for j in range(k)
            ]

        # final assignment re-derives from the SOURCE df (not the
        # persisted handle) so it stays a lazy distributed plan after
        # the cache below is released — never a driver materialization
        final = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        out = assign_clusters(final, centroids, vec_col="v").select(
            "id", "cluster"
        )
        return out, centroids
    finally:
        prepared.unpersist()
