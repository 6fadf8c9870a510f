import pyspark.sql.functions as F
import pytest

from face_hunter_spark import query, synth
from face_hunter_spark.operators.canonical import canonical_map
from face_hunter_spark.pipeline import link_documents
from face_hunter_spark.schemas import DOCUMENTS, ENTITY_CATALOG, HOME_URI, NS

N_DOCS = 30
N_ENT = 10


@pytest.fixture(scope="module")
def kg(spark):
    docs_pdf = synth.make_documents_pdf(N_DOCS, N_ENT)
    gallery_pdf = synth.make_gallery_pdf(n_entities=N_ENT, thumbs_per_entity=6,
                                         distractors=2)
    cat = spark.createDataFrame(
        synth.make_entity_catalog_pdf(n_entities=N_ENT, distractors=2),
        ENTITY_CATALOG,
    )
    docs = spark.createDataFrame(docs_pdf, DOCUMENTS)
    triples = link_documents(docs, gallery_pdf, cat, n_entities=N_ENT).cache()
    canon = canonical_map(cat).cache()
    query.register_views(spark, triples, canon)
    return {"triples": triples, "canon": canon, "catalog": cat}


def test_scenes_from_video(spark, kg):
    video = HOME_URI + "vid_00000"
    rows = query.get_scenes_from_video(spark, video).collect()
    assert rows, "vid_00000 should have at least one scene"
    for r in rows:
        assert r.scene.startswith(video + "#t=")
        assert ":" in r.start and ":" in r.finish


def test_scenes_with_entity_by_label_and_uris(spark, kg):
    label = "Entity 003"
    by_label = query.get_scenes_with_entity(
        spark, label, entity_catalog=kg["catalog"], canon=kg["canon"]
    )
    n_label = by_label.count()
    assert n_label > 0
    # dbpedia URI gives the same scene set
    n_db = query.get_scenes_with_entity(
        spark, synth.dbpedia_uri(label), entity_catalog=kg["catalog"],
        canon=kg["canon"],
    ).count()
    # wikidata URI resolves through the canonical map to the same set
    n_wd = query.get_scenes_with_entity(
        spark, synth.wikidata_uri(label), entity_catalog=kg["catalog"],
        canon=kg["canon"],
    ).count()
    assert n_label == n_db == n_wd


def test_unknown_label_returns_none(spark, kg):
    assert (
        query.get_scenes_with_entity(
            spark, "Nobody Here", entity_catalog=kg["catalog"],
            canon=kg["canon"],
        )
        is None
    )


def test_videos_with_filters(spark, kg):
    uri = synth.dbpedia_uri("Entity 001")
    df = query.get_videos_with_filters(
        spark, f"entity = '{uri}' AND start < '0:00:30'"
    )
    rows = df.collect()
    for r in rows:
        assert r.entity == uri and r.start < "0:00:30"
    # sanity: matches a direct triple count
    direct = (
        kg["triples"]
        .where((F.col("pred") == NS["foaf_depicts"]) & (F.col("obj") == uri))
        .select("subj").distinct().count()
    )
    assert direct >= len({r.start for r in rows})


def test_videos_with_attribute_filters(spark, kg):
    """The reference's get_videos_with_filters docstring example
    (graph.py:199-217): filter scenes on entity attributes fetched via
    service{} federation — male, born before 1970, wikidata-linked —
    over the offline attribute dim table."""
    attrs_pdf = synth.make_entity_attributes_pdf(n_entities=N_ENT,
                                                 distractors=2)
    attrs = spark.createDataFrame(attrs_pdf)
    df = query.get_videos_with_filters(
        spark,
        "wikidata_entity LIKE '%www.wikidata.org%' "
        "AND gender = 'male' AND birth_date < '1970-01-01'",
        attributes=attrs,
    )
    rows = df.collect()
    assert rows, "some depicted entity should pass the example filter"
    allowed = set(
        attrs_pdf[(attrs_pdf.gender == "male")
                  & (attrs_pdf.birth_date < "1970-01-01")]["entity"]
    )
    assert {r.entity for r in rows} <= allowed
    # cross-check one entity against the unfiltered per-entity view
    ent = rows[0].entity
    plain = query.get_videos_with_filters(spark, f"entity = '{ent}'")
    assert {(r.title, r.link, r.start, r.finish) for r in rows
            if r.entity == ent} == {
        (r.title, r.link, r.start, r.finish) for r in plain.collect()
    }
