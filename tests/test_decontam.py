"""Train/eval decontamination (operators/decontam.py).

Strategy: a crafted corpus with known overlap classes (verbatim eval
copy, partial n-gram share, short-doc exact match, clean), both modes,
empty/degenerate inputs, and a plan audit asserting the zero-train-
shuffle claim (broadcast joins only, no sort-merge join over the
corpus).  The driver query `decontaminate_documents` adds a bit-exact
DuckDB replay at sf0.01.
"""

import pyspark.sql.functions as F

from face_hunter_spark.operators.decontam import (
    decontaminate,
    eval_ngram_fingerprints,
)

EVAL_SENT = "the quick brown fox jumps over the lazy dog near the old river bank"  # 14 tokens


def _dfs(spark):
    train = spark.createDataFrame(
        [
            # verbatim copy of the eval sentence inside a longer doc
            (0, "intro words here " + EVAL_SENT + " and some trailing text"),
            # clean: same vocabulary, different order everywhere
            (1, "dog lazy the over jumps fox brown quick the bank river old the near"),
            # shares exactly one 13-gram window (first 13 tokens of EVAL_SENT)
            (2, "the quick brown fox jumps over the lazy dog near the old river meadow"),
            # short doc (4 tokens < n): equals a short eval item verbatim
            (3, "tiny exact eval snippet"),
            # short doc, different text
            (4, "another tiny clean snippet"),
            (5, ""),  # empty text: never contaminated
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, EVAL_SENT), (101, "tiny exact eval snippet")],
        "doc_id long, text string",
    )
    return train, eval_df


def test_remove_mode_drops_overlapping_docs(spark):
    train, eval_df = _dfs(spark)
    clean = decontaminate(train, eval_df, n=13)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 4, 5]
    assert clean.columns == train.columns  # original schema preserved


def test_flag_mode_counts_distinct_overlaps(spark):
    train, eval_df = _dfs(spark)
    rows = {
        r["doc_id"]: r
        for r in decontaminate(train, eval_df, n=13, mode="flag").collect()
    }
    assert rows[0]["contaminated"] and rows[0]["n_contaminated_ngrams"] == 2
    # doc 2 shares exactly the first 13-gram window
    assert rows[2]["contaminated"] and rows[2]["n_contaminated_ngrams"] == 1
    # short eval item matches via the short-doc single-shingle rule
    assert rows[3]["contaminated"] and rows[3]["n_contaminated_ngrams"] == 1
    for clean_id in (1, 4, 5):
        assert not rows[clean_id]["contaminated"]
        assert rows[clean_id]["n_contaminated_ngrams"] == 0
    assert len(rows) == 6  # flag mode keeps every train row


def test_disjoint_eval_removes_nothing(spark):
    train, _ = _dfs(spark)
    eval_df = spark.createDataFrame(
        [(200, "completely unrelated benchmark prompt about quantum chess")],
        "doc_id long, text string",
    )
    assert decontaminate(train, eval_df, n=13).count() == train.count()


def test_eval_fingerprints_distinct_and_long(spark):
    _, eval_df = _dfs(spark)
    fp = eval_ngram_fingerprints(eval_df, n=13)
    assert fp.schema["fp"].dataType.simpleString() == "bigint"
    vals = [r["fp"] for r in fp.collect()]
    assert len(vals) == len(set(vals))
    assert len(vals) == 3  # 2 windows from the 14-token sentence + 1 short


def test_plan_no_sort_merge_join_over_train(spark):
    train, eval_df = _dfs(spark)
    for mode in ("remove", "flag"):
        plan = (
            decontaminate(train, eval_df, n=13, mode=mode)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
        assert plan.count("BroadcastHashJoin") >= 2  # semi + flag/anti side


def test_invalid_mode_raises(spark):
    train, eval_df = _dfs(spark)
    import pytest

    with pytest.raises(ValueError):
        decontaminate(train, eval_df, mode="audit")
