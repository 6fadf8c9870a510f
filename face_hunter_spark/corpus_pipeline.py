"""End-to-end training-corpus assembly: the batch job that turns a raw
document drop into training-ready, packed, split shards.

Stage order (each optional stage is a no-op when unconfigured):

  raw -> exact dedup -> near-dup removal (MinHash+LSH -> CC clusters)
      -> eval decontamination (13-gram overlap) -> quality filter
      -> mixture sampling -> train/val/test hash split
      -> token counts + greedy sequence packing (per split)

Every stage is one of the package's tested operators
(`operators/dedup.py`, `operators/decontam.py`, `operators/corpus.py`,
`operators/text.py`); this module only sequences them and accounts for
what each stage dropped.  All stages are deterministic (content-keyed
hashes), so re-running the job on the same drop reproduces the same
corpus bit-for-bit — the property that makes ablation re-builds and
incremental drops auditable.

Scale notes: the stage list is intentionally ordered cheapest-
per-survivor first at the scan side (exact dedup's 16-byte
fingerprint groupBy before MinHash banding; decontamination's
broadcast semi-join before the quality UDF-free expressions run on
survivors only via lazy plan fusion).  Stage counts are the only
actions; each is a count() over a cached stage boundary, and only the
boundaries that feed two consumers are persisted.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .operators.corpus import hash_split, mixture_sample, quality_filter, pack_sequences
from .operators.decontam import decontaminate
from .operators.dedup import dedup_corpus, dedup_exact
from .operators.text import token_count

__all__ = ["assemble_corpus", "write_corpus"]


def assemble_corpus(
    spark: SparkSession,
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    near_dup_threshold: float | None = 0.9,
    decontam_n: int = 13,
    min_tokens: int = 5,
    min_quality: float = 0.5,
    langs: tuple[str, ...] | None = None,
    mixture_rates: dict[str, float] | None = None,
    split_weights: dict[str, float] | None = None,
    pack_budget: int = 2048,
    collect_stats: bool = True,
) -> tuple[DataFrame, DataFrame, dict]:
    """Run the assembly pipeline over ``docs``.

    Returns (corpus, packed, stats): ``corpus`` is the surviving
    documents plus ``split`` and ``n_tokens`` columns; ``packed`` is
    the per-split greedy packing map (split, doc_id, n_tokens, seq_id,
    seq_fill); ``stats`` counts what every stage admitted.

    With ``collect_stats`` each counted stage boundary is persisted and
    the previous boundary unpersisted once its successor materializes —
    a count() is a second consumer, and without the persist every
    stage's count would re-execute the whole upstream cascade (the
    near-dup count would rerun exact dedup, the decontam count would
    rerun both, ...).  ``collect_stats=False`` skips the counts and the
    stage-boundary persists; the FINAL corpus is persisted in both
    modes because packing and the caller's write each consume it
    (write_corpus unpersists it after the writes).
    """
    split_weights = split_weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    stats: dict = {}
    prev: DataFrame | None = None

    def checkpoint(df: DataFrame, key: str) -> DataFrame:
        nonlocal prev
        if not collect_stats:
            return df
        df = df.persist()
        stats[key] = df.count()
        if prev is not None:
            prev.unpersist()
        prev = df
        return df

    if collect_stats:
        stats["n_input"] = docs.count()

    cur = checkpoint(
        dedup_exact(docs, text_col=text_col, id_col=id_col),
        "n_after_exact_dedup",
    )

    if near_dup_threshold is not None:
        cur = checkpoint(
            dedup_corpus(
                cur, threshold=near_dup_threshold,
                id_col=id_col, text_col=text_col,
            ),
            "n_after_near_dedup",
        )

    if eval_df is not None:
        cur = checkpoint(
            decontaminate(
                cur, eval_df, text_col=text_col, id_col=id_col, n=decontam_n
            ),
            "n_after_decontam",
        )

    cur = checkpoint(
        quality_filter(
            cur,
            text_col=text_col,
            min_tokens=min_tokens,
            min_quality=min_quality,
            langs=langs,
        ),
        "n_after_quality",
    )

    if mixture_rates:
        cur = checkpoint(
            mixture_sample(cur, mixture_rates, key_col=id_col),
            "n_after_mixture",
        )

    corpus = hash_split(cur, split_weights, key_col=id_col).withColumn(
        "n_tokens", token_count(F.col(text_col)).cast("int")
    )
    # always persisted: corpus feeds the split census (stats mode),
    # the packing stage, and the caller's write
    corpus = corpus.persist()
    if collect_stats:
        stats["splits"] = {
            r["split"]: r["n"]
            for r in corpus.groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        if prev is not None:
            prev.unpersist()

    packed = pack_sequences(
        corpus.select(
            F.col("split").alias("bucket"),
            F.col(id_col).cast("string").alias("doc_id"),
            "n_tokens",
        ),
        budget=pack_budget,
    ).withColumnRenamed("bucket", "split")
    if collect_stats:
        stats["n_sequences"] = (
            packed.groupBy("split")
            .agg(F.count_distinct("seq_id").alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )
    stats["pack_budget"] = pack_budget
    return corpus, packed, stats


def write_corpus(
    corpus: DataFrame, packed: DataFrame, out_root: str
) -> None:
    """Materialize: split-partitioned document shards + the packing
    map.  partitionBy('split') keeps each split prunable by directory;
    downstream trainers read only their partition."""
    corpus.write.mode("overwrite").partitionBy("split").parquet(
        f"{out_root}/documents"
    )
    packed.write.mode("overwrite").partitionBy("split").parquet(
        f"{out_root}/packing"
    )
    corpus.unpersist()  # assemble_corpus persisted it for its consumers
