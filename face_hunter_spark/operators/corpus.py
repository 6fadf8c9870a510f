"""Corpus-construction operators: deterministic splits, mixture
sampling, quality filtering, and sequence packing — the assembly steps
between a deduplicated document pool and a training run.

All decisions are CONTENT-KEYED (md5 of a salted key), never random:

* re-running on the same corpus reproduces the same split/sample
  bit-for-bit on any engine (md5 hex is lexicographically comparable
  everywhere — no engine-specific hash needed in the oracle);
* adding or removing documents never reassigns the others (a
  ``randomSplit`` reshuffles everything when the partition count
  changes); this is what makes held-out sets stable across corpus
  versions — the property training pipelines actually need.

Scale shapes:

* ``hash_split`` / ``mixture_sample`` are scan-stage expressions —
  zero shuffle, pushdown-friendly, codegen'd.
* ``quality_filter`` composes the text.py heuristics into one
  scan-stage predicate; one shared tokenization per row (see
  text._bind).
* ``pack_sequences`` is inherently sequential WITHIN a packing unit
  (greedy fill), so the unit — the ``bucket_col`` — is the
  parallelism knob: one hash shuffle groups each bucket, a pandas
  kernel packs it in order, and buckets stream through executors
  independently.  Use enough buckets that one bucket's docs fit in
  executor memory (e.g. a hash prefix of doc_id at 10^12 docs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "hash_split", "mixture_sample", "quality_filter", "pack_sequences",
    "weighted_sample", "hex_cutoff",
]

_HEX_SPAN = 16 ** 8  # uniform u in [0,1) from the first 8 md5 hex chars


def hex_cutoff(fraction: float) -> str:
    """8-hex-char cutoff c such that P[md5_prefix < c] == fraction (to
    1/2^32).  String comparison on lowercase hex == numeric comparison,
    identically in Spark, DuckDB, and Python.

    fraction >= 1.0 returns "g": every hex prefix (chars 0-9a-f)
    compares strictly below it, so a rate-1.0 source keeps ALL rows —
    clamping to 'ffffffff' under a strict ``<`` would silently drop
    keys whose 32-bit prefix is all ones (~2^-32 per row; hundreds of
    documents at 10^12-doc scale — ADVICE r3)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction out of [0,1]: {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(min(int(fraction * _HEX_SPAN), _HEX_SPAN - 1), "08x")


def _hash_prefix(key_col: Column, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"), key_col.cast("string"))), 1, 8
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a split name with probability ~ weights
    (normalized), keyed on md5(salt:key).  Later splits in dict order
    take the tail; the assignment of a given key never changes when
    OTHER rows come or go."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum > 0")
    h = _hash_prefix(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = h < F.lit(hex_cutoff(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return df.withColumn(
        out_col, last if expr is None else expr.otherwise(last)
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-source downsampling to a target mixture: keep
    a row iff md5(salt:key) < cutoff(rate[source]).  Unlisted sources
    keep ``default_rate``.  This is the 'sample each corpus at its
    mixture weight' step of training-data assembly, as a pure
    scan-stage filter."""
    h = _hash_prefix(F.col(key_col), salt)
    rate = None
    for name, r in rates.items():
        cond = F.col(source_col) == name
        cut = F.lit(hex_cutoff(r))
        rate = F.when(cond, cut) if rate is None else rate.when(cond, cut)
    rate = (
        F.lit(hex_cutoff(default_rate)) if rate is None
        else rate.otherwise(F.lit(hex_cutoff(default_rate)))
    )
    return df.where(h < rate)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    min_quality: float = 0.5,
    langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Keep documents passing the text.py heuristics: a token-count
    floor, the composite quality score, and (optionally) a language
    allowlist.  One scan-stage predicate; the tokenization is shared
    across all three terms per row."""
    from .text import lang_id, quality_score, token_count

    c = F.col(text_col)
    keep = (token_count(c) >= min_tokens) & (quality_score(c) >= min_quality)
    if langs:
        keep = keep & lang_id(c).isin(*langs)
    return df.where(keep)


PACKED = "bucket string, doc_id string, n_tokens int, seq_id int, seq_fill int"


def pack_sequences(
    df: DataFrame,
    budget: int,
    bucket_col: str = "bucket",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy sequential sequence packing (sample packing): within each
    bucket, docs in id order fill a sequence until the next doc would
    exceed ``budget``, which starts a new sequence.  A doc longer than
    the budget occupies its own sequence (callers truncate downstream).

    Returns (bucket, doc_id, n_tokens, seq_id, seq_fill) where
    seq_fill is the running fill AFTER placing the doc — the offset
    bookkeeping a packed-batch writer needs.
    """
    import pandas as pd

    if budget < 1:
        raise ValueError("budget must be >= 1")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        seq, fill, seqs, fills = 0, 0, [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > budget:
                seq, fill = seq + 1, 0
            fill += n
            seqs.append(seq)
            fills.append(fill)
        return pd.DataFrame({
            "bucket": pdf["bucket"], "doc_id": pdf["doc_id"],
            "n_tokens": pdf["n_tokens"].astype("int32"),
            "seq_id": seqs, "seq_fill": fills,
        })

    prepared = df.select(
        F.col(bucket_col).cast("string").alias("bucket"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(tokens_col).cast("int").alias("n_tokens"),
    )
    return prepared.groupBy("bucket").applyInPandas(pack, schema=PACKED)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_col: str = "doc_id",
    salt: str = "wsample",
    max_weight: int = 10_000,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the n rows
    with the largest race keys, where P[row selected] follows its
    integer weight (Efraimidis-Spirakis A-ES).

    A-ES orders rows by u^(1/w) with u uniform — a float pow() that no
    two engines round identically.  For INTEGER weights there is an
    exact equivalent: max of w iid uniforms has CDF u^w, i.e. the same
    distribution as u^(1/w), so the race key here is the MAX of w
    salted 60-bit md5 hashes — pure integer logic, bit-reproducible,
    SQL-replayable (driver query `weighted_sample_orders`).  The w
    hashes are a per-row HOF transform over sequence(1..w): O(w)
    compute in the scan stage, NO row explosion; ``max_weight`` bounds
    the per-row work and fails loudly rather than silently degrading.

    The top-n plans as TakeOrderedAndProject (per-partition top-n, k
    rows per partition to the driver merge — no global sort).  Rows
    with weight <= 0 or NULL never qualify.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    w = F.col(weight_col).cast("long")
    key = F.col(key_col).cast("string")
    race = F.array_max(
        F.transform(
            F.sequence(F.lit(1), w),
            lambda j: F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(salt + ":"),
                            j.cast("string"),
                            F.lit(":"),
                            key,
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
        )
    )
    guarded = df.filter(w.isNotNull() & (w > 0))
    # loud bound: a corrupt weight would otherwise hang the scan
    guarded = guarded.filter(
        F.when(
            w > max_weight,
            F.raise_error(
                F.format_string(
                    "weighted_sample: weight exceeds max_weight=%d",
                    F.lit(max_weight),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )
    return (
        guarded.withColumn("__race", race)
        .orderBy(F.desc("__race"))
        .limit(n)
        .drop("__race")
    )
