"""Document relevance scoring: TF-IDF / Okapi BM25 over a token
column — the retrieval-quality signal a training-data pipeline uses to
rank or filter a corpus against a topic description.

Shape at scale: one scan computes per-doc term frequencies and length
(pure built-in expressions, whole-stage codegen, zero Python); one
1-row global aggregate (corpus size, total length, per-term document
frequencies) broadcasts back via crossJoin; the final score is again a
scan-stage expression.  Total cost = two passes over the corpus and a
1-row exchange — no per-term shuffle, no inverted index materialized.
For a handful of query terms this beats the classic
explode-join-on-term plan (which shuffles every token) by the token
count; use the explode plan only when scoring thousands of terms at
once.

Determinism: tf, dl, N, df are integers; the per-document score is
pure per-row double arithmetic in a fixed left-to-right term order, so
results are partitioning-independent.  ``ln`` may differ by 1 ulp
across math libraries — callers comparing across engines should round
(the driver query rounds to 6 dp).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .text import tokens

__all__ = ["bm25"]


def bm25(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against ``query_terms`` with Okapi BM25
    (Robertson's idf with the +1 smoothing Lucene uses, so idf is
    always positive):

      idf(t)  = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
      s(d)    = sum_t idf(t) * tf(t,d)*(k1+1)
                        / (tf(t,d) + k1*(1 - b + b*dl(d)/avgdl))

    Returns (id_col, dl, tf_0..tf_{m-1}, score); terms are scored in
    list order.  Empty ``query_terms`` raises.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    def _eq(term: str):
        # closure factory, NOT a default-arg lambda: a two-parameter
        # lambda makes Spark's HOF pass the element *index* as the
        # second argument, silently clobbering the default.
        return lambda x: x == F.lit(term)

    base = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        F.size("__toks").alias("dl"),
        *[
            F.size(F.filter("__toks", _eq(t))).alias(f"tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = base.agg(
        F.count("*").alias("__n"),
        F.sum("dl").alias("__sumdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("__sumdl").cast("double") / F.col("__n").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (
                F.col("__n").cast("double") - F.col(f"__df_{i}").cast("double")
                + F.lit(0.5)
            )
            / (F.col(f"__df_{i}").cast("double") + F.lit(0.5))
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / (tf + norm)
    return scored.select(
        id_col,
        "dl",
        *[f"tf_{i}" for i in range(len(query_terms))],
        score.alias("score"),
    )
