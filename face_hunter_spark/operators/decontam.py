"""Train/eval decontamination: remove (or flag) training documents
that share any word n-gram with an evaluation set.

This is the standard benchmark-leakage guard for LLM training corpora
(13-gram overlap, after the GPT-3 appendix-C / "Deduplicating Training
Data" methodology): a training document that contains any n-gram that
also appears in an eval benchmark is contaminated and must not be
trained on.

Shape at 100 TB:

* The EVAL side is small by construction (benchmark suites are a few
  MB), so its distinct n-gram fingerprints are a broadcast table.
  The train side's fingerprint pass is one scan: shingle -> 60-bit
  md5-prefix fingerprint (8 bytes, never the shingle string) ->
  explode -> broadcast hash semi-join.  (The flag/remove join rereads
  train as its output base — two scans total, zero shuffles.)
* The per-doc overlap count aggregates ONLY the matching rows
  (contaminated docs are rare), and the result — a (doc_id, count)
  table of just the contaminated ids — is broadcast BACK onto the
  train table, so flagging/removing is a second broadcast join, not a
  repartition of the corpus.  Total exchanges over train data: zero.
* Fingerprints are deterministic (md5-prefix, the cross-engine hash
  used by operators/corpus.py and operators/sketch.py), so a SQL
  oracle replays the whole operator bit-for-bit (driver query
  `decontaminate_documents`).

False positives: two different n-grams colliding in 60 bits is
~2^-60 per pair — at 10^12 docs x 10^2 n-grams vs 10^7 eval n-grams
the expected collision count is ~10^-3; collisions only ever
OVER-remove (safe direction for decontamination).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .text import shingles

__all__ = ["eval_ngram_fingerprints", "decontaminate"]


def _fp(col) -> F.Column:
    """60-bit md5-prefix fingerprint of a shingle string (DuckDB:
    ('0x'||substr(md5(s),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def eval_ngram_fingerprints(
    eval_df: DataFrame, text_col: str = "text", n: int = 13
) -> DataFrame:
    """Distinct n-gram fingerprints of the eval set: one `fp:long`
    column, deduplicated — the broadcast side of `decontaminate`.

    Documents shorter than n tokens contribute their full token
    sequence as a single shingle (the `shingles` short-doc rule), so
    short eval items still decontaminate their exact text.
    """
    return (
        eval_df.select(
            F.explode(shingles(F.col(text_col), n=n)).alias("s")
        )
        .select(_fp(F.col("s")).alias("fp"))
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    mode: str = "remove",
) -> DataFrame:
    """Decontaminate ``train`` against ``eval_df`` by word n-gram
    overlap.

    mode='remove' (default): return the clean subset of ``train``
    (original columns, contaminated docs dropped).
    mode='flag': return all of ``train`` plus
    ``n_contaminated_ngrams:long`` (distinct overlapping n-grams, 0 if
    clean) and ``contaminated:boolean`` — the audit form.

    Both forms execute as two broadcast joins over a single train
    scan; nothing repartitions the corpus (see module docstring).
    """
    if mode not in ("remove", "flag"):
        raise ValueError("mode must be 'remove' or 'flag'")
    eval_fp = eval_ngram_fingerprints(eval_df, text_col=text_col, n=n)
    train_fp = train.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n=n)).alias("s"),
    ).select(id_col, _fp(F.col("s")).alias("fp"))
    hits = (
        train_fp.join(F.broadcast(eval_fp), "fp", "inner")
        .groupBy(id_col)
        .agg(F.count_distinct("fp").alias("n_contaminated_ngrams"))
    )
    if mode == "remove":
        # hits holds only contaminated ids — broadcast the anti side.
        return train.join(F.broadcast(hits), id_col, "left_anti")
    flagged = train.join(F.broadcast(hits), id_col, "left").withColumn(
        "n_contaminated_ngrams",
        F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0).cast("long")),
    )
    return flagged.withColumn(
        "contaminated", F.col("n_contaminated_ngrams") > 0
    )
