"""Similarity search over embedding columns (array<float>): exact
brute-force cosine top-k as the correctness baseline, plus two
approximate scale paths (random-hyperplane LSH buckets, IVF coarse
quantization).

Physical strategy by corpus size:
* corpus fits in a broadcast (<~1 GB): ``cosine_topk_fast`` — one BLAS
  matmul per Arrow batch of queries.  Zero shuffle; the plan a 1000-
  executor cluster wants for gallery-sized corpora.
* corpus too big to broadcast: ``ann_lsh_topk`` / ``ivf_topk`` — both
  turn the similarity join into an equi-join on a bucket key, so the
  shuffle is O(N * buckets_per_point), never O(N * M).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType, StructField,
    StructType,
)


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(c):
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    q_id: str = "q_id", c_id: str = "c_id",
) -> DataFrame:
    """Exact top-k by cosine, pure built-in expressions (zip_with /
    aggregate are JVM codegen).  Cross-join based — the O(N*M) oracle-
    parity variant for tests and small corpora.  Ties broken by c_id."""
    q = queries.select(F.col(q_id).alias("q_id"), F.col("embedding").alias("qv"))
    c = corpus.select(F.col(c_id).alias("c_id"), F.col("embedding").alias("cv"))
    scored = q.crossJoin(F.broadcast(c)).withColumn(
        "cosine", _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def cosine_topk_fast(
    queries: DataFrame, corpus_pdf: pd.DataFrame, k: int = 5,
    q_id: str = "q_id", c_id: str = "c_id",
) -> DataFrame:
    """Broadcast-matmul top-k: one (B x d) @ (d x M) GEMM + argpartition
    per Arrow batch.  Same results as cosine_topk (incl. tie order)."""
    spark = SparkSession.getActiveSession()
    ids = corpus_pdf[c_id].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.vstack(
        [np.asarray(v, dtype=np.float32) for v in corpus_pdf["embedding"]]
    )[order]
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    out_schema = StructType([
        StructField("q_id", LongType(), False),
        StructField("c_id", LongType(), False),
        StructField("cosine", FloatType(), False),
        StructField("rank", IntegerType(), False),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat = bc.value
        kk = min(k, len(c_ids))
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.vstack([np.asarray(v, dtype=np.float32) for v in pdf["embedding"]])
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sim = q @ c_mat.T  # (B, M)
            # top-k with (desc cosine, asc c_id) tie order: c_ids sorted
            # ascending + stable argsort on -sim gives exactly that
            idx = np.argsort(-sim, axis=1, kind="stable")[:, :kk]
            rows = {
                "q_id": np.repeat(pdf["q_id"].to_numpy(), kk),
                "c_id": c_ids[idx].ravel(),
                "cosine": np.take_along_axis(sim, idx, 1).ravel().astype(np.float32),
                "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32), len(pdf)),
            }
            yield pd.DataFrame(rows)

    return queries.select(F.col(q_id).alias("q_id"), "embedding").mapInPandas(
        fn, schema=out_schema
    )


def ann_lsh_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    bands: int = 16, rows_per_band: int = 4, dim: int = 64,
    q_id: str = "q_id", c_id: str = "c_id",
) -> DataFrame:
    """Approximate top-k: hyperplane band buckets on both sides,
    equi-join, exact cosine rerank within candidates.  Recall grows
    with `bands`; shuffle stays O(N*bands)."""
    from .linking import lsh_signature_udf

    sig = lsh_signature_udf(bands, rows_per_band, dim=dim)
    q = queries.select(
        F.col(q_id).alias("q_id"), F.col("embedding").alias("qv"),
        F.explode(sig("embedding")).alias("bucket"),
    )
    c = corpus.select(
        F.col(c_id).alias("c_id"), F.col("embedding").alias("cv"),
        F.explode(sig("embedding")).alias("bucket"),
    )
    cand = (
        q.join(c, "bucket")
        .dropDuplicates(["q_id", "c_id"])
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv"))
                    / (_norm(F.col("qv")) * _norm(F.col("cv"))))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    n_cells: int = 16, n_probe: int = 4,
    q_id: str = "q_id", c_id: str = "c_id",
) -> DataFrame:
    """IVF-flat: coarse-quantize the corpus into n_cells Voronoi cells
    (centroids = deterministic corpus sample — k-means-free but stable;
    swap in KMeans offline for production), search the n_probe nearest
    cells per query.  Cell assignment is a broadcast argmax; the search
    is an equi-join on cell id."""
    cent_pdf = (
        corpus.select(F.col(c_id).alias("id"), "embedding")
        .orderBy(F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(997)), "id")
        .limit(n_cells)
        .toPandas()
    )
    cents = np.vstack([np.asarray(v, np.float32) for v in cent_pdf["embedding"]])
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast(cents)

    def assign_udf(n_out: int):
        @F.pandas_udf(ArrayType(IntegerType()))
        def assign(emb: pd.Series) -> pd.Series:
            cm = bc.value
            m = np.vstack([np.asarray(v, np.float32) for v in emb])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sim = m @ cm.T
            top = np.argsort(-sim, axis=1, kind="stable")[:, :n_out]
            return pd.Series(list(top.astype(np.int32)))
        return assign

    c = corpus.select(
        F.col(c_id).alias("c_id"), F.col("embedding").alias("cv"),
        assign_udf(1)("embedding")[0].alias("cell"),
    )
    q = queries.select(
        F.col(q_id).alias("q_id"), F.col("embedding").alias("qv"),
        F.explode(assign_udf(n_probe)("embedding")).alias("cell"),
    )
    cand = q.join(c, "cell").withColumn(
        "cosine",
        _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )
