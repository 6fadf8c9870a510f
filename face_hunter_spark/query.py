"""Read path: the reference's SPARQL query surface (graph.py:130-244)
as Spark SQL over the ``triples`` table.

Each SPARQL star pattern on a shared subject becomes a self-join on
``subj``; because triples are bucketed by doc (all of a scene's rows
share its doc_bucket), these self-joins co-partition and AQE keeps the
small filtered sides broadcast.  A ``scene_view`` pivot is registered
once so ad-hoc queries (get_videos_with_filters) are plain SQL over a
wide view instead of N-way self-joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .schemas import NS


def register_views(spark: SparkSession, triples: DataFrame,
                   canon: DataFrame | None = None,
                   suffix: str = "") -> None:
    """Register ``triples``/``scene_view`` temp views.  ``suffix``
    scopes the names so two handles sharing one SparkSession don't
    clobber each other's views between a refresh and a later read
    (SparkHunter passes a per-instance suffix)."""
    triples.createOrReplaceTempView(f"triples{suffix}")
    scene_wide(triples, canon).createOrReplaceTempView(f"scene_view{suffix}")


def scene_wide(triples: DataFrame, canon: DataFrame | None = None) -> DataFrame:
    """One row per (scene, depicted entity): scene, video, title, link,
    start, finish, entity[, canonical_entity].  A single groupBy-pivot
    over pred replaces repeated self-joins (one shuffle on subj)."""
    per_scene = (
        triples.where(
            F.col("pred").isin(
                NS["video_scene_from"], NS["temporal_has_start"],
                NS["temporal_has_finish"], NS["temporal_duration"],
            )
        )
        .groupBy("subj")
        .agg(
            F.max(F.when(F.col("pred") == NS["video_scene_from"], F.col("obj"))).alias("video"),
            F.max(F.when(F.col("pred") == NS["temporal_has_start"], F.col("obj"))).alias("start"),
            F.max(F.when(F.col("pred") == NS["temporal_has_finish"], F.col("obj"))).alias("finish"),
            F.max(F.when(F.col("pred") == NS["temporal_duration"], F.col("obj"))).alias("duration"),
        )
        .where(F.col("video").isNotNull())
        .withColumnRenamed("subj", "scene")
    )
    per_video = (
        triples.where(
            F.col("pred").isin(NS["dc_identifier"], NS["dc_title"])
        )
        .groupBy("subj")
        .agg(
            F.max(F.when(F.col("pred") == NS["dc_identifier"], F.col("obj"))).alias("link"),
            F.max(F.when(F.col("pred") == NS["dc_title"], F.col("obj"))).alias("title"),
        )
        .withColumnRenamed("subj", "video")
    )
    depicts = triples.where(F.col("pred") == NS["foaf_depicts"]).select(
        F.col("subj").alias("scene"), F.col("obj").alias("entity")
    )
    wide = per_scene.join(per_video, "video").join(depicts, "scene", "left")
    if canon is not None:
        wide = wide.join(
            F.broadcast(canon.withColumnRenamed("uri", "entity")),
            "entity",
            "left",
        ).withColumn(
            "canonical_entity", F.coalesce("canonical", "entity")
        ).drop("canonical")
    return wide


def get_scenes_from_video(
    spark: SparkSession, identifier_uri: str, view: str = "scene_view"
) -> DataFrame:
    """graph.py:130-151: (scene, entity, start, end) for one video."""
    return spark.sql(
        f"""
        SELECT DISTINCT scene, entity, start, finish
        FROM {view} WHERE video = :v AND entity IS NOT NULL
        """,
        args={"v": identifier_uri},
    )


def label_uri_map(entity_catalog: DataFrame) -> DataFrame:
    """(name, uri) with the reference's DBpedia-preferred resolution
    (get_uri_from_csv, knowledge_graphs.py:387-408; preference at
    graph.py:111-114).  Cache this once per catalog (SparkHunter does)
    so repeated label lookups probe a tiny cached map instead of
    re-scanning + collecting the catalog per search."""
    return entity_catalog.groupBy("name").agg(
        F.coalesce(
            F.min(F.when(F.col("source_kg") == "dbpedia", F.col("entity"))),
            F.min(F.when(F.col("source_kg") == "wikidata", F.col("entity"))),
        ).alias("uri")
    )


def get_scenes_with_entity(
    spark: SparkSession,
    identifier: str,
    entity_catalog: DataFrame | None = None,
    canon: DataFrame | None = None,
    view: str = "scene_view",
    label_map: DataFrame | None = None,
) -> DataFrame | None:
    """graph.py:153-192: distinct (title, link, co-occurring entity,
    start, finish) for all scenes depicting the given entity.

    identifier may be a DBpedia URI, a Wikidata URI (resolved through
    the canonical map — the batch analogue of the live owl:sameAs
    lookup at knowledge_graphs.py:306-336), or a plain label (resolved
    through ``label_map`` / the catalog like get_uri_from_csv; the
    None-for-unknown-label contract mirrors hunter.py:153-187)."""
    uri = identifier
    if not identifier.startswith("http://"):
        if label_map is None:
            if entity_catalog is None:
                return None
            label_map = label_uri_map(entity_catalog)
        row = label_map.where(F.col("name") == identifier).first()
        if row is None or row.uri is None:
            return None
        uri = row.uri
    sv = spark.table(view)
    if "canonical_entity" in sv.columns and canon is not None:
        target = canon.where(F.col("uri") == uri).select("canonical")
        match = sv.join(
            F.broadcast(target),
            sv["canonical_entity"] == F.col("canonical"),
            "inner",
        )
    else:
        match = sv.where(F.col("entity") == uri)
    co = sv.select(
        F.col("scene").alias("s2"), F.col("entity").alias("co_entity")
    )
    return (
        match.join(co, match["scene"] == co["s2"])
        .select("title", "link", "co_entity", "start", "finish")
        .where(F.col("co_entity").isNotNull())
        .distinct()
    )


def get_videos_with_filters(
    spark: SparkSession,
    where_sql: str,
    view: str = "scene_view",
    attributes: DataFrame | None = None,
) -> DataFrame:
    """graph.py:194-244: user-supplied constraints over the scene view.

    The reference splices SPARQL fragments + FILTER(...) into a
    template, with entity attributes (birthDate, gender, the
    wikidata sameAs URI) fetched live via federated ``service{}``
    blocks (graph.py:205-215).  The batch analogue: ``attributes`` is
    an offline entity-attribute dim table (one row per depicts URI —
    see synth.make_entity_attributes_pdf for the shape) broadcast-
    joined into the scene view, so the reference's documented example

        filter(regex(str(?wikidata_entity), 'www.wikidata.org')
               && ?sex_label = 'male' && ?date < '1970-01-01')

    becomes the WHERE fragment

        wikidata_entity LIKE '%www.wikidata.org%'
        AND gender = 'male' AND birth_date < DATE '1970-01-01'

    Live federation stays out of scope (SURVEY.md §2.8); the dim table
    is built offline exactly like the thumbnail catalog."""
    sv = spark.table(view)
    if attributes is not None:
        sv = sv.join(
            F.broadcast(attributes.withColumnRenamed("uri", "entity")),
            "entity",
            "left",
        )
    return (
        sv.where(where_sql)
        .select("title", "link", "entity", "start", "finish")
        .distinct()
    )
