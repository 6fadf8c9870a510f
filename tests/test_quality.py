"""KG quality gate (quality.py): conformant pipeline output, planted
violations, incremental gating, and the committed report/stats
artifacts."""

import pytest

from face_hunter_spark import synth
from face_hunter_spark.catalog import ParquetCatalog
from face_hunter_spark.pipeline import run_link_job
from face_hunter_spark.quality import run_validate_job
from face_hunter_spark.schemas import ENTITY_CATALOG, NS

N_ENT = 8


@pytest.fixture()
def linked_cat(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path / "kg"))
    docs = synth.documents_df(spark, 12, N_ENT)
    gal = synth.make_gallery_pdf(n_entities=N_ENT, thumbs_per_entity=4)
    ecat = spark.createDataFrame(
        synth.make_entity_catalog_pdf(n_entities=N_ENT), ENTITY_CATALOG
    )
    stats = run_link_job(spark, cat, docs, gal, ecat, n_entities=N_ENT)
    return cat, stats


def test_pipeline_output_is_conformant(spark, linked_cat):
    cat, _ = linked_cat
    out = run_validate_job(spark, cat)
    assert out["conformant"] and out["n_violations"] == 0
    assert out["void"]["n_triples"] > 0
    # the gate leaves an auditable (empty) report + stats tables
    assert cat.exists("triples_quality_report")
    assert cat.read(spark, "triples_quality_report").count() == 0
    stats_tbl = cat.read(spark, "triples_void_stats")
    preds = stats_tbl.where("pred IS NOT NULL")
    assert preds.count() == out["void"]["n_predicates"]
    classes = stats_tbl.where("cls IS NOT NULL")
    assert classes.count() >= 2  # Video + Scene


def test_planted_violation_is_reported(spark, linked_cat):
    cat, _ = linked_cat
    bad = spark.createDataFrame(
        [("docX", "sX", NS["video_scene_from"], "vGhost", False, None,
          "manual", None, 0)],
        cat.read(spark, "triples").drop("snap").schema,
    )
    cat.append("triples", bad, run_id="manual", partition_by=["doc_bucket"])
    out = run_validate_job(spark, cat)
    assert not out["conformant"]
    # the untyped object trips range; the untyped-scene subject has a
    # sceneFrom (min_count checks typed scenes only, sX isn't typed)
    assert out["violations_by_shape"].get("scenefrom-video") == 1
    rep = cat.read(spark, "triples_quality_report")
    assert rep.where("focus = 'vGhost'").count() == 1


def test_incremental_gate_reads_only_delta(spark, linked_cat):
    cat, stats = linked_cat
    snap = stats["snapshot"]
    bad = spark.createDataFrame(
        [("docY", "sY", NS["sdo_depicts"], "not a uri", False, None,
          "manual", None, 0)],
        cat.read(spark, "triples").drop("snap").schema,
    )
    cat.append("triples", bad, run_id="manual", partition_by=["doc_bucket"])
    out = run_validate_job(spark, cat, after=snap, commit=False)
    # delta = 1 bad row; the conformant bulk is not rescanned
    assert out["void"]["n_triples"] == 1
    assert out["violations_by_shape"] == {"depicts-uri": 1}
