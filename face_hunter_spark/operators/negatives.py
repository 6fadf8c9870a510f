"""Negative sampling for KG-embedding training — TransE-style
corrupt-tail generation (Bordes et al., NeurIPS'13, the "filtered"
protocol): for each positive (subj, pred, obj) triple, k corrupted
tails drawn deterministically from the entity vocabulary, with
corruptions that happen to be true triples filtered out.

A KG-construction pipeline's output (this repo's triple table) is the
input to embedding training; this operator turns it into labeled
training pairs without randomness — every decision is CONTENT-KEYED
(md5 of a salted key, the same convention as operators/corpus.py), so
the sample is bit-reproducible at any parallelism and on any engine
(the driver oracle replays it in DuckDB).

Scale shape (10^12 triples, 10^8-entity vocabulary):
* ``indexed_vocabulary`` assigns dense ranks with ONE vocab-sized
  range shuffle + per-partition local positions offset by a P-row
  cumulative-count collect — identical output to
  ``row_number() OVER (ORDER BY value) - 1`` without the
  single-partition window that global row_number would force.
* candidate generation is a broadcast crossJoin with range(k) — the
  corpus never shuffles for it.
* the rank -> entity lookup is an equi-join on ``idx`` (broadcast when
  the vocabulary is small; AQE decides otherwise).
* the filtered-protocol check is one anti-join on (subj, pred, obj).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["indexed_vocabulary", "negative_samples"]

# 15 hex chars = 60 bits: always positive in a signed 64-bit int, and
# ('0x' || substr(md5, 1, 15))::BIGINT replays it exactly in DuckDB
_HEX_CHARS = 15
_SEP = "\x1f"  # unit separator: cannot appear in URI/label content


def indexed_vocabulary(
    pool: DataFrame, col: str, n_partitions: int | None = None
) -> DataFrame:
    """Distinct values of ``pool[col]`` -> (idx, value) with ``idx`` the
    dense 0-based rank in global ORDER BY value.

    Equivalent to ``row_number() OVER (ORDER BY value) - 1`` but
    scale-safe: range-repartition on the value (the only vocab-sized
    shuffle), sort within partitions, then per-partition local
    positions shifted by cumulative partition counts (a P-row collect).
    Global order holds regardless of where the sampled range bounds
    land, so the result is deterministic even though
    ``repartitionByRange`` samples its bounds."""
    import pandas as pd

    d = pool.select(F.col(col).cast("string").alias("value")).where(
        F.col("value").isNotNull()
    ).distinct()
    spark = d.sparkSession
    p = n_partitions or spark.sparkContext.defaultParallelism
    d = (
        d.repartitionByRange(p, "value")
        .sortWithinPartitions("value")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()  # freeze: the count pass and the index pass
        # below must see the SAME partitioning
    )
    counts = {
        r["pid"]: r["n"]
        for r in d.groupBy("pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def add_idx(batches):
        pos: dict[int, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["pid"].iloc[0])
            start = pos.get(pid, offsets[pid])
            yield pd.DataFrame(
                {
                    "idx": range(start, start + len(pdf)),
                    "value": pdf["value"].to_numpy(),
                }
            )
            pos[pid] = start + len(pdf)

    return d.mapInPandas(add_idx, "idx long, value string")


def negative_samples(
    triples: DataFrame,
    k: int = 5,
    pool: DataFrame | None = None,
    pool_col: str = "obj",
    salt: str = "neg",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(subj, pred, obj) positives -> (subj, pred, obj_neg, neg_idx)
    corrupted-tail negatives, ``k`` per positive before filtering.

    The i-th corruption of (s, p, o) replaces o with
    ``vocab[md5(salt␟s␟p␟o␟i) % |vocab|]``; corruptions that are
    themselves true triples are dropped (filtered protocol), so some
    positives yield fewer than k rows — by design, not data loss.
    ``pool`` defaults to the distinct objects of ``triples``; pass the
    canonical entity vocabulary for type-consistent negatives."""
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = triples.sparkSession
    base = triples.select("subj", "pred", "obj").distinct()
    vocab = indexed_vocabulary(
        pool if pool is not None else base, pool_col
    ).localCheckpoint()
    n = vocab.count()
    if n == 0:
        raise ValueError("empty vocabulary")
    cand = base.crossJoin(
        F.broadcast(spark.range(k).select(F.col("id").alias("neg_idx")))
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    _SEP,
                    F.lit(salt),
                    "subj",
                    "pred",
                    "obj",
                    F.col("neg_idx").cast("string"),
                )
            ),
            1,
            _HEX_CHARS,
        ),
        16,
        10,
    ).cast("long")
    cand = cand.withColumn("idx", F.pmod(h, F.lit(n)))
    v = F.broadcast(vocab) if broadcast_vocab else vocab
    out = cand.join(v, "idx").select(
        "subj", "pred", F.col("value").alias("obj_neg"), "neg_idx"
    )
    truth = base.select(
        "subj", "pred", F.col("obj").alias("obj_neg")
    ).distinct()
    return out.join(truth, ["subj", "pred", "obj_neg"], "left_anti")
