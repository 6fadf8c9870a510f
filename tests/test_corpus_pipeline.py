"""End-to-end corpus assembly (corpus_pipeline.py + jobs/corpus_job.py).

Strategy: a crafted drop exercising every stage (exact dups, near-dup
chain, eval contamination, junk quality, language mix), stage-count
accounting, determinism across re-runs and partitionings, the
write/read round-trip with split partition pruning, and the CLI
entrypoint invoked in-process (same SparkSession via getOrCreate).
"""

import json

import pyspark.sql.functions as F

from face_hunter_spark.corpus_pipeline import assemble_corpus, write_corpus

GOOD = " ".join(
    f"word{i} the quick brown fox jumps over the lazy dog" for i in range(10)
)  # 100 tokens; a one-word edit gives distinct-shingle Jaccard ~0.84


def _drop(spark, parts=4):
    rows = [
        (0, GOOD, "web"),
        (1, GOOD, "web"),  # exact dup of 0
        (2, GOOD.replace("word9", "changed"), "web"),  # near-dup of 0
        (3, "completely different words about spark engines and shuffles "
            "and partitions and columnar scans that pass every filter", "web"),
        (4, "held out benchmark sentence that must never reach training "
            "data because it is the eval set verbatim copy", "books"),
        (5, "!!! ??? ... ,,, ###", "web"),  # junk: quality filter
        (6, "ok", "web"),  # too short: token floor
        (7, "yet another long and perfectly reasonable document with many "
            "plain english words that passes the quality threshold easily", "books"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).repartition(parts)


def _eval(spark):
    return spark.createDataFrame(
        [(100, "held out benchmark sentence that must never reach training "
               "data because it is the eval set verbatim copy")],
        "doc_id long, text string",
    )


def test_assemble_stage_accounting(spark):
    corpus, packed, stats = assemble_corpus(
        spark, _drop(spark), eval_df=_eval(spark), pack_budget=64,
        near_dup_threshold=0.8,
    )
    assert stats["n_input"] == 8
    assert stats["n_after_exact_dedup"] == 7  # doc 1 gone
    assert stats["n_after_near_dedup"] == 6  # doc 2 gone
    assert stats["n_after_decontam"] == 5  # doc 4 gone
    assert stats["n_after_quality"] == 3  # docs 5, 6 gone
    kept = sorted(r["doc_id"] for r in corpus.collect())
    assert kept == [0, 3, 7]
    assert sum(stats["splits"].values()) == 3
    assert stats["n_sequences"] >= 1
    assert set(corpus.columns) >= {"doc_id", "text", "split", "n_tokens"}


def test_assemble_deterministic(spark):
    def run(parts):
        corpus, packed, stats = assemble_corpus(
            spark, _drop(spark, parts), eval_df=_eval(spark), pack_budget=64,
            near_dup_threshold=0.8,
        )
        return (
            sorted(map(tuple, corpus.select("doc_id", "split").collect())),
            sorted(map(tuple, packed.collect())),
            stats,
        )

    assert run(1) == run(7)


def test_packing_respects_budget_and_split(spark):
    corpus, packed, _ = assemble_corpus(
        spark, _drop(spark), eval_df=_eval(spark), pack_budget=30,
        near_dup_threshold=0.8,
    )
    rows = packed.collect()
    for r in rows:
        assert r["seq_fill"] <= max(30, r["n_tokens"])
    # packing never mixes splits within a sequence (bucket == split)
    assert set(r["split"] for r in rows) == set(
        r["split"] for r in corpus.collect()
    )


def test_write_corpus_partition_pruning(spark, tmp_path):
    corpus, packed, _ = assemble_corpus(
        spark, _drop(spark), eval_df=_eval(spark),
        split_weights={"train": 1.0}, near_dup_threshold=0.8,
    )
    out = str(tmp_path / "corpus")
    write_corpus(corpus, packed, out)
    back = spark.read.parquet(f"{out}/documents")
    assert back.filter(F.col("split") == "train").count() == 3
    plan = (
        back.filter(F.col("split") == "train")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(split" in plan  # directory pruning


def test_cli_entrypoint(spark, tmp_path, monkeypatch):
    import jobs.corpus_job as cj

    docs_path = str(tmp_path / "drop.parquet")
    eval_path = str(tmp_path / "eval.parquet")
    _drop(spark).write.parquet(docs_path)
    _eval(spark).write.parquet(eval_path)
    out_root = str(tmp_path / "out")
    argv = [
        "corpus_job.py",
        "--documents", docs_path,
        "--eval", eval_path,
        "--out-root", out_root,
        "--pack-budget", "64",
        "--near-dup-threshold", "0.8",
        "--split-weights", json.dumps({"train": 0.9, "val": 0.1}),
    ]
    monkeypatch.setattr("sys.argv", argv)
    printed = []
    monkeypatch.setattr("builtins.print", lambda s: printed.append(s))
    assert cj.main() == 0
    stats = json.loads(printed[-1])
    assert stats["n_after_quality"] == 3
    assert spark.read.parquet(f"{out_root}/documents").count() == 3
    assert spark.read.parquet(f"{out_root}/packing").count() == 3


def test_assemble_no_stats_mode(spark):
    corpus, packed, stats = assemble_corpus(
        spark, _drop(spark), eval_df=_eval(spark), pack_budget=64,
        near_dup_threshold=0.8, collect_stats=False,
    )
    # no stage counts collected, pipeline output identical
    assert set(stats) == {"pack_budget"}
    assert sorted(r["doc_id"] for r in corpus.collect()) == [0, 3, 7]
    assert packed.count() == 3
