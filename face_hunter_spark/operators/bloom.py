"""Explicit bloom-filter semi-join: prune a huge fact table against a
dimension that is too large to broadcast raw but whose BITS fit.

At 100 TB the shape that hurts is `fact LEFT SEMI JOIN dim` where dim
has 10^7-10^9 keys: too big for a broadcast hash join (Spark serializes
the whole hashed relation per executor), so the planner sort-merge
joins and the fact table pays a full shuffle just to be filtered.  A
bloom filter of the dim keys at ~10 bits/key is 100-1000x smaller than
the keys themselves; probing it is a scan-stage expression, so the
fact shuffle disappears and only candidate rows (true matches + the
bounded false-positive residue) reach the real join.

Spark's AQE can inject its own runtime bloom filter
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) for plain equi-
joins; this operator is the EXPLICIT, deterministic, cross-engine-
replayable form for when the optimizer can't — pruning before a
Python/Arrow stage, before a non-equi operator, against a dim computed
in another job, or when the filter must be persisted and reused.

Representation: the filter is a DataFrame of (word long, bits long) —
m/62 rows, 62 usable bits per word (bit 62+ is never set: DuckDB's
BIGINT `<<` raises on overflow at 63, so 62 keeps every mask a
positive, engine-portable literal).  Probing is k broadcast left
joins on `word` plus a bitwise AND — zero shuffle of the probed side
(plan-audited in tests).  Hashes are the package's 60-bit md5-prefix
(`operators/sketch._h60`) with a per-probe salt, so a SQL oracle
replays build + probe bit-for-bit (driver query
`bloom_prefilter_orders`).

False positives only (never false negatives): a bloom pass is a
SUPERSET of the true semi-join — callers re-verify with the real join
on the survivors.  fp rate ~ (1 - e^(-k*n/m))^k.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .sketch import _h60

__all__ = ["bloom_filter_table", "bloom_prefilter"]

WORD_BITS = 62


def _pos(col: str, j: int, m: int) -> F.Column:
    """j-th bloom bit position of ``col`` in [0, m)."""
    return F.pmod(
        _h60(F.concat(F.lit(f"{j}:"), F.col(col).cast("string"))),
        F.lit(m),
    )


def bloom_filter_table(
    df: DataFrame, key_col: str, m: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Build the (word, bits, m, k) bloom table of ``df[key_col]``.

    One pass: each key contributes k bit positions via an inline
    explode; the groupBy map-side-combines `bit_or` into at most
    ceil(m/62) rows regardless of input size.  The m/k literals ride
    along so `bloom_prefilter` can refuse a prebuilt table whose
    parameters don't match the probe's (a silent mismatch would drop
    true matches — the one failure mode the operator promises away).
    """
    if m < WORD_BITS or k < 1:
        raise ValueError(f"need m >= {WORD_BITS} and k >= 1")
    pos = df.select(
        F.explode(
            F.array(*[_pos(key_col, j, m) for j in range(k)])
        ).alias("pos")
    )
    return (
        pos.select(
            F.expr(f"pos DIV {WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .select("word", "bits", F.lit(m).alias("m"), F.lit(k).alias("k"))
    )


def bloom_prefilter(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m: int = 1 << 20,
    k: int = 5,
    bf: DataFrame | None = None,
) -> DataFrame:
    """Rows of ``fact`` whose ``fact_key`` MAY appear in
    ``dim[dim_key]`` — a superset of the true semi-join with bloom
    false-positive rate, computed without shuffling ``fact``.

    The filter table broadcasts; each of the k probes is a broadcast
    left join on its word plus a scan-stage bit test.  NULL keys never
    pass (NULL hashes to NULL -> probe fails), matching semi-join
    semantics.

    The filter is built ONCE and localCheckpoint-ed eagerly: the k
    probe joins each reference it, and Catalyst does not reuse the
    build exchange across differently-aliased projections — without
    the checkpoint the dim would be scanned k times (plan-audited in
    tests).  Pass a prebuilt ``bf`` (from `bloom_filter_table`) to
    amortize the build across multiple prefilter calls.
    """
    if bf is None:
        bf = bloom_filter_table(dim, dim_key, m=m, k=k).localCheckpoint()
    elif {"m", "k"} <= set(bf.columns):
        stamp = bf.select("m", "k").first()
        if stamp is not None and (stamp["m"], stamp["k"]) != (m, k):
            raise ValueError(
                f"prebuilt bloom filter was built with m={stamp['m']}, "
                f"k={stamp['k']} but the probe uses m={m}, k={k} — a "
                "mismatch would silently drop true matches"
            )
    bf = bf.select("word", "bits")
    out = fact
    conds = []
    for j in range(k):
        p, w, b, c = f"__bf_p{j}", f"__bf_w{j}", f"__bf_b{j}", f"__bf_c{j}"
        out = (
            out.withColumn(p, _pos(fact_key, j, m))
            .withColumn(w, F.expr(f"{p} DIV {WORD_BITS}"))
            .withColumn(
                b,
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), "
                    f"CAST({p} % {WORD_BITS} AS INT))"
                ),
            )
        )
        side = F.broadcast(
            bf.select(F.col("word").alias(w), F.col("bits").alias(c))
        )
        out = out.join(side, w, "left")
        conds.append(
            F.coalesce(F.col(c), F.lit(0).cast("long"))
            .bitwiseAND(F.col(b))
            != 0
        )
    keep = conds[0]
    for cnd in conds[1:]:
        keep = keep & cnd
    drop = [f"__bf_{x}{j}" for j in range(k) for x in ("p", "w", "b", "c")]
    return out.filter(keep).drop(*drop)
