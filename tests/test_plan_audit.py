"""Physical-plan audits: the properties that matter at 100 TB are
visible in the plan, so assert them — filters reach the parquet scan,
column pruning holds, dimension joins broadcast, the relational glue
stays in whole-stage codegen, and the hot pipeline never collapses to
single-partition exchanges."""

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR

from tests.conftest import requires_testdata

pytestmark = requires_testdata


def plan_of(df, execute: bool = False) -> str:
    if execute:
        # AQE prints WholeStageCodegen spans only in the final plan
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .where(F.col("l_quantity") > 10)
        .select("l_returnflag", "l_quantity")
    )
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThan(l_quantity" in plan


def test_column_pruning_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_returnflag")
        .count()
    )
    plan = plan_of(df)
    # ReadSchema must contain ONLY the grouped column
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" in read_schema
    assert "l_extendedprice" not in read_schema and "l_quantity" not in read_schema


def test_dim_joins_broadcast(spark):
    import face_hunter_spark.driver_queries as DQ

    plan = plan_of(DQ.q_star_join_revenue(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2  # nation, region
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_relational_glue_in_codegen(spark):
    import face_hunter_spark.driver_queries as DQ

    plan = plan_of(DQ.q_pricing_summary(spark, SF_DIR), execute=True)
    # '*(n)' prefixes mark WholeStageCodegen spans in the compact form
    assert "*(1)" in plan and "*(2)" in plan
    assert "BatchScan" in plan or "FileScan" in plan


def test_pipeline_plan_shape(spark):
    """The flagship pipeline: exactly one grouped-Python stage, no
    duplicated scene subtree, a broadcast join for the entity catalog,
    and no non-broadcast exchange with partitioning=1."""
    import __spark_entry__ as em

    plan = plan_of(em._kg_pipeline(spark, "/root/testdata/sf0.001"))
    assert plan.count("FlatMapGroupsInPandas") <= 1
    assert plan.count("MapInPandas") <= 2
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "Exchange SinglePartition" in line:
            pytest.fail(f"single-partition exchange in hot path: {line}")


def test_triples_write_partitioning(spark, tmp_path):
    """Committed triple snapshots are physically partitioned by
    doc_bucket (partition pruning on the read path)."""
    import os

    from face_hunter_spark import synth
    from face_hunter_spark.catalog import ParquetCatalog
    from face_hunter_spark.pipeline import run_link_job
    from face_hunter_spark.schemas import ENTITY_CATALOG

    cat = ParquetCatalog(str(tmp_path / "kg"))
    run_link_job(
        spark, cat,
        synth.documents_df(spark, 20, 8),
        synth.make_gallery_pdf(n_entities=8, thumbs_per_entity=4, distractors=1),
        spark.createDataFrame(
            synth.make_entity_catalog_pdf(n_entities=8, distractors=1),
            ENTITY_CATALOG,
        ),
        n_entities=8,
    )
    snap_dirs = os.listdir(str(tmp_path / "kg/triples/data"))
    assert len(snap_dirs) == 1
    inner = os.listdir(str(tmp_path / "kg/triples/data") + "/" + snap_dirs[0])
    assert any(d.startswith("doc_bucket=") for d in inner)
    # and partition pruning: a doc_bucket filter prunes the scan
    df = cat.read(spark, "triples").where(F.col("doc_bucket") == 3)
    plan = plan_of(df)
    assert "PartitionFilters" in plan and "doc_bucket" in plan

def test_minhash_candidate_join_is_equijoin(spark):
    """The LSH candidate join must be an equi-join on the band bucket —
    never a cartesian/nested-loop pair enumeration."""
    from face_hunter_spark.operators import dedup

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(dedup.minhash_lsh_pairs(df, threshold=0.9))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def formatted_plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_minhash_candidate_exchange_carries_no_arrays(spark):
    """The widest stage of minhash LSH is the band-bucket exchange; the
    shingle-hash arrays must NOT ride through it (they are fetched per
    surviving candidate pair afterwards).  Assert every exchange that
    hash-partitions on the bucket key inputs only scalar columns."""
    from face_hunter_spark.operators import dedup

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = formatted_plan(dedup.minhash_lsh_pairs(df, threshold=0.9))
    checked = 0
    for block in plan.split("\n("):
        if "Exchange" not in block.splitlines()[0]:
            continue
        if "hashpartitioning(bucket" not in block:
            continue
        checked += 1
        input_lines = [ln for ln in block.splitlines()
                       if ln.startswith("Input")]
        for ln in input_lines:
            assert "sh#" not in ln and "sh_a#" not in ln and "sh_b#" not in ln, (
                f"array column crosses the bucket exchange: {ln}"
            )
    assert checked >= 1, "expected at least one bucket exchange in the plan"


def test_islands_scene_variant_is_pure_jvm(spark):
    """The Spark-native scene variant must compile to window+agg only —
    zero Python workers in the plan."""
    import face_hunter_spark.driver_queries as DQ

    plan = plan_of(DQ.q_scene_islands(spark, SF_DIR))
    assert "InPandas" not in plan and "PythonUDF" not in plan


def test_packed_scene_stage_fans_out(spark):
    """extract_scenes_packed repartitions the packed rows so the Python
    kernel never runs on an AQE-coalesced 1-2 partition exchange."""
    import pandas as pd

    from face_hunter_spark.operators.scenes import extract_scenes_packed

    pdf = pd.DataFrame(
        [("d", f, f * 1000.0, ["A"]) for f in range(4)],
        columns=["doc_id", "frame_no", "ts_ms", "labels"],
    )
    preds = spark.createDataFrame(
        pdf, "doc_id string, frame_no int, ts_ms double, labels array<string>"
    )
    plan = plan_of(extract_scenes_packed(preds))
    # explicit-count round-robin repartition feeds the Python stage
    assert "MapInPandas" in plan
    assert "RoundRobinPartitioning" in plan or "REPARTITION_BY_NUM" in plan


def test_ensure_parallelism_skips_already_wide_input(spark):
    """Partitioning-aware fan-out: an input already hash-partitioned
    at or above the target width (on the requested key) passes through
    with NO new Exchange; a narrow file scan still fans out."""
    from face_hunter_spark.operators.util import ensure_parallelism

    target = spark.sparkContext.defaultParallelism * 2
    wide = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .repartition(target, "doc_id")
    )
    same = ensure_parallelism(wide, by="doc_id")
    assert same is wide  # no plan change at all
    assert plan_of(same).count("Exchange") == plan_of(wide).count("Exchange")

    # wide but keyed differently than requested -> must still reshuffle
    other = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .repartition(target, "text")
    )
    rekeyed = ensure_parallelism(other, by="doc_id")
    assert rekeyed is not other

    # narrow scan (UnknownPartitioning) -> fans out as before
    narrow = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fanned = ensure_parallelism(narrow, by="doc_id")
    assert fanned is not narrow
    assert "Exchange hashpartitioning" in plan_of(fanned)


def test_shacl_pred_filters_push_to_scan(spark, tmp_path):
    """Each SHACL shape touches only its predicate's slice: the pred
    equality must reach the parquet scan as a pushed filter, and the
    class-membership checks must be hash joins (never nested-loop)."""
    from face_hunter_spark.operators.shacl import validate

    path = str(tmp_path / "triples.parquet")
    spark.createDataFrame(
        [(f"s{i}", "ex:p" if i % 2 else "rdf:type", f"o{i}")
         for i in range(64)],
        "subj string, pred string, obj string",
    ).write.parquet(path)
    tri = spark.read.parquet(path)
    rep = validate(
        tri,
        [{"id": "d", "kind": "domain", "pred": "ex:p", "cls": "ex:T"},
         {"id": "m", "kind": "max_count", "pred": "ex:p", "n": 1}],
        rdf_type="rdf:type",
    )
    plan = plan_of(rep)
    assert "PushedFilters: [" in plan and "EqualTo(pred,ex:p)" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_transe_epoch_plan_shape(spark, tmp_path):
    """The TransE epoch's scale contract: the corruption fan-out joins
    the broadcast vocabulary and the gradient exchange is hash
    aggregation (map-side partial sums on the COO rows) — never a
    nested-loop join against the parameter tables, and no
    single-partition exchange anywhere in the update path."""
    from face_hunter_spark.operators.transe import transe_epoch

    path = str(tmp_path / "kg.parquet")
    spark.createDataFrame(
        [(f"c{i}", "in", f"n{i % 5}") for i in range(64)],
        "subj string, pred string, obj string",
    ).write.parquet(path)
    ent, _rel = transe_epoch(spark.read.parquet(path), dim=4, k_neg=2)
    plan = plan_of(ent)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # COO gradient sums arrive pre-combined: partial then merge
    assert "partial_sum" in plan or "HashAggregate" in plan
    assert "SinglePartition" not in plan


def test_lpa_and_common_neighbors_plan_shape(spark):
    """The new graph ops' scale contracts: every LPA round is hash
    joins + hash aggregation (no nested loops, no single-partition
    exchange); the common-neighbor wedge join is an equi-join on the
    shared-neighbor key with map-side-combined counts."""
    from face_hunter_spark.operators.graph import (
        common_neighbors,
        label_propagation,
    )

    e = spark.createDataFrame(
        [(f"a{i}", f"b{i % 7}") for i in range(64)],
        "src string, dst string",
    )
    plan = plan_of(label_propagation(e, n_iter=1))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan

    plan2 = plan_of(common_neighbors(e))
    assert "BroadcastNestedLoopJoin" not in plan2
    assert "CartesianProduct" not in plan2
    assert "SinglePartition" not in plan2
    assert "HashAggregate" in plan2  # counted wedges, partial+final


def test_beyond_broadcast_gallery_join_never_replicates(spark):
    """The over-budget gallery path (VERDICT r4 #2): with the
    broadcast hint off and auto-broadcast disabled, the LSH candidate
    join compiles to a SHUFFLED join on the band bucket — no
    BroadcastExchange anywhere, both sides stream — and returns the
    same labels as the broadcast form."""
    import numpy as np

    from face_hunter_spark import synth
    from face_hunter_spark.operators.linking import link_lsh
    from face_hunter_spark.operators.vision import detect_embed_faces
    from face_hunter_spark.operators.spans import media_frames
    from face_hunter_spark.schemas import DOCUMENTS, GALLERY

    docs = spark.createDataFrame(
        synth.make_documents_pdf(8, 6), DOCUMENTS
    )
    gal = spark.createDataFrame(
        synth.make_gallery_pdf(n_entities=6, thumbs_per_entity=4,
                               distractors=1),
        GALLERY,
    )
    faces = detect_embed_faces(media_frames(docs), n_entities=6)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        shuffled = link_lsh(faces, gal, broadcast_gallery=False)
        plan = plan_of(shuffled)
        assert "BroadcastExchange" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        got = sorted(
            map(tuple, shuffled.select(
                "doc_id", "frame_no", "face_idx", "label").collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    want = sorted(
        map(tuple, link_lsh(faces, gal, broadcast_gallery=True).select(
            "doc_id", "frame_no", "face_idx", "label").collect())
    )
    assert got == want and len(got) > 0
