"""snapshot_diff (catalog.py): content-level diff between committed
states — added/removed sets, empty-diff identity, and direction."""

import pytest

from face_hunter_spark.catalog import ParquetCatalog, snapshot_diff


@pytest.fixture()
def cat(tmp_path):
    return ParquetCatalog(str(tmp_path / "kg"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_added_between_snapshots(spark, cat):
    a = spark.createDataFrame([("s1", "p", "o1")], "subj string, pred string, obj string")
    b = spark.createDataFrame([("s2", "p", "o2"), ("s3", "p", "o3")],
                              "subj string, pred string, obj string")
    s1 = cat.append("triples", a, run_id="r1")
    cat.append("triples", b, run_id="r2")
    got = _rows(snapshot_diff(spark, cat, "triples", from_snapshot=s1))
    assert got == [("s2", "p", "o2", "added"), ("s3", "p", "o3", "added")]


def test_from_none_is_full_add_and_self_diff_empty(spark, cat):
    a = spark.createDataFrame([("s1", "p", "o1"), ("s2", "p", "o2")],
                              "subj string, pred string, obj string")
    s1 = cat.append("triples", a, run_id="r1")
    assert len(_rows(snapshot_diff(spark, cat, "triples", None))) == 2
    assert _rows(snapshot_diff(spark, cat, "triples", s1, s1)) == []


def test_reverse_direction_reports_removed(spark, cat):
    a = spark.createDataFrame([("s1", "p", "o1")], "subj string, pred string, obj string")
    b = spark.createDataFrame([("s2", "p", "o2")], "subj string, pred string, obj string")
    s1 = cat.append("triples", a, run_id="r1")
    s2 = cat.append("triples", b, run_id="r2")
    got = _rows(
        snapshot_diff(spark, cat, "triples", from_snapshot=s2, to_snapshot=s1)
    )
    assert got == [("s2", "p", "o2", "removed")]


def test_duplicate_rows_diff_as_sets(spark, cat):
    a = spark.createDataFrame([("s1", "p", "o1")], "subj string, pred string, obj string")
    dup = spark.createDataFrame([("s1", "p", "o1"), ("s1", "p", "o1")],
                                "subj string, pred string, obj string")
    s1 = cat.append("triples", a, run_id="r1")
    cat.append("triples", dup, run_id="r2")
    # content-wise nothing new: the re-appended row already existed
    assert _rows(snapshot_diff(spark, cat, "triples", s1)) == []


def test_diff_validates_compaction_preserves_content(spark, cat):
    a = spark.createDataFrame([(f"s{i}", "p", f"o{i}") for i in range(20)],
                              "subj string, pred string, obj string")
    b = spark.createDataFrame([(f"t{i}", "p", f"o{i}") for i in range(20)],
                              "subj string, pred string, obj string")
    cat.append("triples", a, run_id="r1")
    cat.append("triples", b, run_id="r2")
    before = cat.read(spark, "triples").drop("snap").persist()
    before.count()
    cat.compact(spark, "triples")
    snaps = cat.snapshots("triples")
    assert len(snaps) == 1
    got = snapshot_diff(spark, cat, "triples", from_snapshot=None)
    # post-compaction content == pre-compaction content (all 'added'
    # vs empty, and the added set equals the old full read)
    assert _rows(got.where("op = 'added'").drop("op")) == _rows(before)
    assert got.where("op = 'removed'").count() == 0
    before.unpersist()
