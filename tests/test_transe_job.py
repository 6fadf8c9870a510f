"""training.run_transe_job: the job shape around operators/transe.py —
literal exclusion, content-keyed split, chained epochs, committed
embedding artifacts, integer eval metrics, CLI entry."""

import json

import pyspark.sql.functions as F
import pytest

from face_hunter_spark.catalog import ParquetCatalog
from face_hunter_spark.training import (
    ENT_TABLE,
    REL_TABLE,
    load_embeddings,
    run_transe_job,
)


def _seed(spark, tmp_path, n=40):
    """A small entity graph + a literal-tailed slice that training
    must exclude."""
    cat = ParquetCatalog(str(tmp_path / "cat"))
    rows = []
    for i in range(n):
        rows.append(
            (f"e{i}", f"e{i}", "http://e/knows", f"e{(i * 7 + 1) % n}",
             False, None)
        )
        rows.append(
            (f"e{i}", f"e{i}", "http://e/likes", f"e{(i * 3 + 2) % n}",
             False, None)
        )
        rows.append(
            (f"e{i}", f"e{i}", "http://e/label", f"name {i}", True, None)
        )
    df = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "obj_is_literal boolean, obj_datatype string",
    )
    cat.append("triples", df, "seed")
    return cat


def test_job_trains_commits_and_evaluates(spark, tmp_path):
    cat = _seed(spark, tmp_path)
    stats = run_transe_job(
        spark, cat, epochs=2, dim=6, k_neg=2, eval_pct=15, run_id="t1"
    )
    # literal rows excluded: 80 entity-tailed triples total
    assert stats["n_train"] + stats["eval"]["n"] == 80
    assert stats["n_relations"] == 2  # knows, likes (label is literal)
    assert cat.exists(ENT_TABLE) and cat.exists(REL_TABLE)
    ent, rel = load_embeddings(spark, cat)
    assert ent.count() == stats["n_entities"]
    r0 = ent.limit(1).collect()[0]
    assert len(r0.emb) == 6
    ev = stats["eval"]
    assert ev["n"] > 0 and ev["sum_rank"] >= ev["n"]
    assert ev["mean_rank"] == ev["sum_rank"] / ev["n"]
    assert 0 < ev["mrr"] <= 1


def test_job_rerun_replaces_artifact_deterministically(spark, tmp_path):
    cat = _seed(spark, tmp_path)
    s1 = run_transe_job(spark, cat, epochs=1, dim=4, eval_pct=0,
                        run_id="a")
    ent1 = {
        r.id: list(r.emb)
        for r in load_embeddings(spark, cat)[0].collect()
    }
    s2 = run_transe_job(spark, cat, epochs=1, dim=4, eval_pct=0,
                        run_id="b")
    # copy-on-write replace: ONE snapshot, not an append union
    assert len(cat.snapshots(ENT_TABLE)) == 1
    ent2 = {
        r.id: list(r.emb)
        for r in load_embeddings(spark, cat)[0].collect()
    }
    # content-keyed init/corruptions: identical run -> identical arrays
    assert ent1 == ent2
    assert s1["n_train"] == s2["n_train"] == 80
    assert s1["eval"] is None


def test_job_validation_and_all_literal_guard(spark, tmp_path):
    cat = _seed(spark, tmp_path)
    with pytest.raises(ValueError, match="epochs"):
        run_transe_job(spark, cat, epochs=0)
    with pytest.raises(ValueError, match="eval_pct"):
        run_transe_job(spark, cat, eval_pct=100)
    lit_only = ParquetCatalog(str(tmp_path / "lit"))
    lit_only.append(
        "triples",
        spark.createDataFrame(
            [("d", "s", "p", "o", True, None)],
            "doc_id string, subj string, pred string, obj string, "
            "obj_is_literal boolean, obj_datatype string",
        ),
        "seed",
    )
    with pytest.raises(ValueError, match="include_literals"):
        run_transe_job(spark, lit_only)


def test_facade_train_and_score(spark, tmp_path):
    from face_hunter_spark import synth
    from face_hunter_spark.hunter import SparkHunter

    h = SparkHunter(spark, str(tmp_path / "hcat"), n_entities=6)
    assert h.train_embeddings() is None and h.score([]) is None
    h.link(synth.documents_df(spark, 12, 6))
    stats = h.train_embeddings(epochs=1, dim=4, eval_pct=0)
    assert stats["n_train"] > 0
    scored = h.score(
        [("http://face-hunter.org/resource/vid_00000",
          "https://schema.org/mentions", "x")]
    )
    # unknown entity 'x' has no embedding row -> inner join drops it
    assert scored.count() in (0, 1)
    known = h.score(
        h.catalog.read(spark, "triples")
        .where(~F.col("obj_is_literal"))
        .select("subj", "pred", "obj")
        .limit(5)
    ).collect()
    assert known and all(r.score >= 0 for r in known)


def test_eval_reports_split_size_and_unseen_skips(spark, tmp_path):
    cat = _seed(spark, tmp_path)
    stats = run_transe_job(spark, cat, epochs=1, dim=4, eval_pct=25,
                           run_id="e")
    ev = stats["eval"]
    assert ev["n_test_split"] == 80 - stats["n_train"]
    assert ev["n_skipped_unseen"] == ev["n_test_split"] - ev["n"]
    assert ev["n_skipped_unseen"] >= 0


def test_score_refuses_torn_artifact(spark, tmp_path):
    from face_hunter_spark import synth
    from face_hunter_spark.hunter import SparkHunter

    h = SparkHunter(spark, str(tmp_path / "hcat"), n_entities=6)
    h.link(synth.documents_df(spark, 8, 6))
    h.train_embeddings(epochs=1, dim=4, eval_pct=0, run_id="good")
    # simulate a torn artifact: rel table replaced by a different run
    rel = h.catalog.read(spark, REL_TABLE).drop("snap")
    h.catalog.overwrite(REL_TABLE, rel, "other-run")
    with pytest.raises(RuntimeError, match="torn"):
        h.score([("a", "b", "c")])


def test_cli_entrypoint(spark, tmp_path, monkeypatch):
    import jobs.transe_job as tj

    cat = _seed(spark, tmp_path)
    argv = [
        "transe_job.py",
        "--catalog-root", str(tmp_path / "cat"),
        "--epochs", "1",
        "--dim", "4",
        "--eval-pct", "20",
        "--run-id", "cli",
    ]
    monkeypatch.setattr("sys.argv", argv)
    printed = []
    monkeypatch.setattr(
        "builtins.print", lambda s, **kw: printed.append(s)
    )
    assert tj.main() == 0
    stats = json.loads(printed[-1])
    assert stats["run_id"] == "cli" and stats["eval"]["n"] > 0
    assert cat.exists(ENT_TABLE)
    # missing table -> exit 2
    monkeypatch.setattr(
        "sys.argv",
        ["transe_job.py", "--catalog-root", str(tmp_path / "nope")],
    )
    assert tj.main() == 2
