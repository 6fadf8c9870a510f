"""The end-to-end link job (the reference's ``cli.py link`` write path,
hunter.py:91-151) as one declarative Spark plan + a committed append.

    documents ──explode/sample──► media frames
        │                             │ mapInPandas (decode+detect+embed)
        │                             ▼
        │                        faces ──link (broadcast kNN)──► labels
        │                             │ groupBy frame (ordered collect)
        │                             ▼
        │                    frame predictions
        │                             │ applyInPandas per doc
        │                             ▼
        ├──video triples         scenes ──⋈ entity catalog──► triples
        ▼                                                        │
    anti-join vs existing triples (idempotent re-link) ──────────┤
                                                                 ▼
                             bucketed append + per-partition lineage rows

Checkpoint/resume: every append also writes one lineage row per
doc_bucket.  A rerun anti-joins incoming doc_ids against the committed
triples table (the reference's ``video_exists`` guard, hunter.py:141,
turned into a set-at-a-time operator) and processes only new docs.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .catalog import ParquetCatalog
from .operators import linking, scenes, spans, triples as T
from .schemas import NS


#: Default gallery broadcast budget, in ROWS.  A 512-d float32
#: embedding row is ~2.2 KB driver/executor-side, so 500k rows is a
#: ~1 GB broadcast — comfortably inside one executor, far under
#: Spark's 8 GB broadcast hard cap, and already 5-50x the reference's
#: whole-gallery scale.  Above it the driver .toPandas() collect and
#: the per-executor replica both stop being sane, so linking routes to
#: the bucketed shuffle join instead (strategy='lsh_shuffle',
#: broadcast_gallery=False) without any driver materialization.
GALLERY_BROADCAST_BUDGET_ROWS = 500_000


def _route_gallery(gallery, strategy: str, budget_rows: int):
    """Gallery input normalization + size-based strategy routing.

    ``gallery`` may be the classic pandas frame (the reference's
    labels/embeddings pickles fit trivially) or a Spark DataFrame
    (catalog-backed galleries of any size).  A Spark gallery is
    COUNTED (one cheap dim-scan job) before anything is collected:
    at or under ``budget_rows`` it collects to the ordered pandas
    frame the broadcast strategies consume; over budget the strategy
    is overridden to the shuffle join and the gallery never touches
    the driver.  Returns (strategy, gallery_pdf, gallery_df,
    broadcast_gallery)."""
    if not isinstance(gallery, DataFrame):
        if strategy == "lsh_shuffle":
            # pandas gallery + explicit shuffle strategy (facade/CLI):
            # lift it to a DataFrame; small by definition, so the
            # broadcast hint stays on
            from pyspark.sql import SparkSession

            from .schemas import GALLERY

            spark = SparkSession.getActiveSession()
            cols = [f.name for f in GALLERY.fields]
            return strategy, None, spark.createDataFrame(
                gallery[cols], GALLERY
            ), True
        return strategy, gallery, None, True
    if strategy == "lsh_shuffle":
        return strategy, None, gallery, True
    n = gallery.count()
    if n > budget_rows:
        return "lsh_shuffle", None, gallery, False
    pdf = (
        gallery.select("gallery_id", "label", "entity_uri", "embedding")
        .orderBy("gallery_id")
        .toPandas()
    )
    return strategy, pdf, None, True


def link_documents(
    documents: DataFrame,
    gallery_pdf,
    entity_catalog: DataFrame,
    distance_threshold: float = 0.6,
    frame_threshold: int = 3,
    sample_every: int = 1,
    n_entities: int = 54,
    strategy: str = "bruteforce",
    gallery_df: DataFrame | None = None,
    one_face: bool = False,
    encoder: str = "hash",
    hnsw_prebuilt: bool = False,
    hnsw_shards: int | None = None,
    mention_labels: DataFrame | None = None,
    index_catalog=None,
    index_table: str = "ann_index",
    broadcast_budget_rows: int = GALLERY_BROADCAST_BUDGET_ROWS,
) -> DataFrame:
    """documents -> un-partitioned triples DataFrame (pure transform).

    ``one_face`` links only the largest detected face per frame (the
    reference's one_face mode, face_recognition.py:367-371); ``encoder``
    names a registered production encoder (vision.register_encoder),
    default the deterministic test encoder; ``mention_labels`` (a
    (label, uri) dim table) additionally links entity labels in the
    TEXT spans and unions (doc, sdo:mentions, entity) triples into the
    output (operators/mentions.py) — the interleaved corpus's text
    side, off by default for reference parity.

    ``gallery_pdf`` also accepts a Spark DataFrame: galleries at or
    under ``broadcast_budget_rows`` collect to the ordered pandas
    frame the broadcast strategies need; larger ones auto-route to the
    bucketed shuffle join (``strategy='lsh_shuffle'`` with no broadcast
    hint) so the gallery NEVER materializes on the driver or inside an
    executor replica — the 10^8-face-gallery path."""
    from .operators import vision
    from .operators.util import ensure_parallelism

    if strategy == "lsh_shuffle" and gallery_df is not None:
        # explicit classic API: caller supplied the shuffle-side frame
        bc_gal = True
    else:
        strategy, gallery_pdf, routed_df, bc_gal = _route_gallery(
            gallery_pdf, strategy, broadcast_budget_rows
        )
        if routed_df is not None:
            gallery_df = routed_df

    # fan the frame rows out BEFORE the Python stage: a narrow parquet
    # scan otherwise pins the decode/embed UDF to 1-2 tasks
    media = ensure_parallelism(
        spans.media_frames(documents, sample_every=sample_every), by="doc_id"
    )
    if strategy == "bruteforce":
        # fused decode+embed+link stage: embeddings never cross Arrow
        from pyspark.sql import SparkSession

        bc = SparkSession.getActiveSession().sparkContext.broadcast(
            linking._gallery_arrays(gallery_pdf)
        )
        linked = vision.detect_embed_link(
            media, bc, distance_threshold, n_entities=n_entities,
            one_face=one_face, encoder=encoder,
        )
    elif strategy == "lsh":
        # fully-fused broadcast-gallery LSH: decode+embed+bucket+score
        # in ONE Python stage (embeddings never cross Arrow, same as
        # the bruteforce path)
        from pyspark.sql import SparkSession

        if index_catalog is not None:
            from . import index_store
            from .operators.hnsw import _gallery_fingerprint

            arrays = linking._gallery_arrays(gallery_pdf)
            key = index_store.payload_key(
                _gallery_fingerprint(arrays[0], arrays[1]),
                bands=8, rows_per_band=6,
            )
            payload, _ = index_store.load_or_build(
                SparkSession.getActiveSession(), index_catalog, key,
                "lsh", lambda: linking.lsh_payload_from_arrays(*arrays),
                table=index_table,
            )
        else:
            payload = linking.lsh_gallery_payload(gallery_pdf)
        bc = SparkSession.getActiveSession().sparkContext.broadcast(payload)
        linked = vision.detect_embed_link(
            media, bc, distance_threshold, n_entities=n_entities,
            matcher="lsh", one_face=one_face, encoder=encoder,
        )
    elif strategy == "hnsw":
        # per-executor graph index over the broadcast gallery — the
        # reference's default ANN algorithm ('appr'), built once per
        # Python worker like the reference builds nmslib per process.
        # hnsw_prebuilt builds ONCE on the driver and broadcasts the
        # finished graph (the reference's saveIndex/loadIndex cache,
        # approximate_k_nearest_neighbors.py:51-62) — the right shape
        # for 100k+ galleries where a per-worker build would dominate.
        # With an ``index_catalog`` the built payload additionally
        # PERSISTS across jobs keyed by the gallery content hash
        # (index_store), so the build is paid once per distinct
        # gallery, not once per run — and a gallery edit changes the
        # key, fixing the reference's reload-stale-index-if-file-
        # exists quirk at the artifact level.
        from pyspark.sql import SparkSession

        if hnsw_prebuilt or hnsw_shards:
            from .operators import hnsw as _hnsw

            spark_ = SparkSession.getActiveSession()
            arrays = linking._gallery_arrays(gallery_pdf)
            # hnsw_shards parallelizes the one superlinear single-
            # threaded step (the graph build) across executors — the
            # >10^5-gallery path; the monolithic driver build remains
            # for small galleries / parity
            if hnsw_shards:
                build = lambda: _hnsw.sharded_payload_spark(  # noqa: E731
                    spark_, arrays, n_shards=hnsw_shards
                )
                params = dict(M=15, ef_construction=100,
                              shards=int(hnsw_shards))
            else:
                build = lambda: _hnsw.prebuilt_gallery_payload(arrays)  # noqa: E731
                params = dict(M=15, ef_construction=100)
            if index_catalog is not None:
                from . import index_store

                key = index_store.payload_key(
                    _hnsw._gallery_fingerprint(arrays[0], arrays[1]),
                    **params,
                )
                payload, _ = index_store.load_or_build(
                    spark_, index_catalog, key, "hnsw", build,
                    table=index_table,
                )
            else:
                payload = build()
        else:
            payload = linking._gallery_arrays(gallery_pdf)
        bc = SparkSession.getActiveSession().sparkContext.broadcast(payload)
        linked = vision.detect_embed_link(
            media, bc, distance_threshold, n_entities=n_entities,
            matcher="hnsw", one_face=one_face, encoder=encoder,
        )
    elif strategy == "lsh_shuffle":
        # relational candidate join — the beyond-broadcast-gallery form
        assert gallery_df is not None
        faces = vision.detect_embed_faces(
            media, n_entities=n_entities, one_face=one_face,
            encoder=encoder,
        )
        linked = linking.link_lsh(
            faces, gallery_df, distance_threshold,
            broadcast_gallery=bc_gal,
        )
    else:
        raise ValueError(strategy)
    # fused path: frame assembly + scene smoothing in ONE doc_id
    # shuffle (equivalent to assemble_frame_predictions |>
    # extract_scenes — parity-tested)
    scn = scenes.extract_scenes_from_faces(linked, frame_threshold=frame_threshold)
    out = T.video_triples(documents).unionByName(
        T.scene_triples(scn, entity_catalog)
    )
    if mention_labels is not None:
        from .operators.mentions import link_text_mentions, mention_triples

        out = out.unionByName(
            mention_triples(link_text_mentions(documents, mention_labels))
        )
    return out


def canonicalized_triples(
    new_triples: DataFrame,
    entity_catalog: DataFrame,
    canon: DataFrame | None = None,
) -> DataFrame:
    """north_rule materialization shape, shared by the link and relink
    jobs: depicts rows gain obj_canonical (QID via connected components
    over catalog same-as edges) and the doc-level
    (doc, sdo:depicts, QID) rows are unioned in, distinct per
    (doc, entity)."""
    from .operators.canonical import canonical_map, canonicalize_depicts

    new_triples = canonicalize_depicts(
        new_triples,
        canon if canon is not None else canonical_map(entity_catalog),
    )
    doc_depicts = (
        new_triples.where(F.col("pred") == NS["foaf_depicts"])
        .select(
            F.split(F.col("subj"), "#t=").getItem(0).alias("subj"),
            F.lit(NS["sdo_depicts"]).alias("pred"),
            F.col("obj_canonical").alias("obj"),
            *[c for c in new_triples.columns
              if c not in ("subj", "pred", "obj")],
        )
        .withColumn("obj_canonical", F.col("obj"))
        .dropDuplicates(["subj", "obj"])
    )
    return new_triples.unionByName(doc_depicts)


def run_link_job(
    spark: SparkSession,
    catalog: ParquetCatalog,
    documents: DataFrame,
    gallery_pdf,
    entity_catalog: DataFrame,
    run_id: str | None = None,
    canon: DataFrame | None = None,
    **kwargs,
) -> dict:
    """Idempotent link job: skips docs already in the triple table,
    appends one committed snapshot + per-bucket lineage rows + one
    run-level metrics row.  Returns stats."""
    import time

    t_start = time.monotonic()
    run_id = run_id or uuid.uuid4().hex[:12]

    # cache_index=True persists/reuses ANN payloads (hnsw prebuilt,
    # lsh) through THIS catalog, keyed by gallery content hash
    if kwargs.pop("cache_index", False):
        kwargs.setdefault("index_catalog", catalog)

    if catalog.exists("triples"):
        existing = (
            catalog.read(spark, "triples")
            .where(F.col("pred") == NS["rdf_type"])
            .where(F.col("obj") == NS["mpeg7_video"])
            .select("doc_id")
            .distinct()
        )
        documents = documents.join(existing, "doc_id", "left_anti")

    # north_rule: mentions canonicalize to QIDs IN the materialized
    # table (obj_canonical next to the DBpedia-preferred obj) + the
    # doc-level (doc, sdo:depicts, QID) rows.  canon is recomputable
    # from the catalog but involves an iterative CC loop; repeated
    # callers (facade, streaming foreachBatch) pass their cached map.
    new_triples = canonicalized_triples(
        T.with_partitioning(
            link_documents(documents, gallery_pdf, entity_catalog, **kwargs),
            run_id,
        ),
        entity_catalog,
        canon,
    )

    # One pass: cache the job's output so triples + lineage + metrics
    # come from the same computation (per-partition lineage is derived
    # by aggregation, not a second pipeline run).
    new_triples = new_triples.persist()
    n_rows = new_triples.count()
    if n_rows == 0:
        new_triples.unpersist()
        return {"run_id": run_id, "n_triples": 0, "n_docs": 0, "snapshot": None}

    snap = catalog.append(
        "triples", new_triples, run_id, partition_by=["doc_bucket"]
    )
    lineage = new_triples.groupBy("doc_bucket").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_triples"),
    ).select(
        F.lit(run_id).alias("run_id"),
        "doc_bucket",
        "n_docs",
        "n_triples",
        F.lit("committed").alias("status"),
    )
    catalog.append("lineage", lineage, run_id)

    n_docs = new_triples.select("doc_id").distinct().count()
    # run-level metrics (north_rule: lineage + metrics per append):
    # scene/link volume and wall time, queryable next to the triples
    counts = new_triples.agg(
        F.countDistinct(
            F.when(F.col("pred") == NS["video_scene_from"], F.col("subj"))
        ).alias("n_scenes"),
        F.countDistinct(
            F.when(F.col("pred") == NS["foaf_depicts"], F.col("obj"))
        ).alias("n_entities_linked"),
    ).collect()[0]
    metrics = spark.createDataFrame(
        [(
            run_id, n_docs, n_rows, int(counts["n_scenes"] or 0),
            int(counts["n_entities_linked"] or 0),
            int((time.monotonic() - t_start) * 1000),
        )],
        "run_id string, n_docs long, n_triples long, n_scenes long, "
        "n_entities_linked long, wall_ms long",
    )
    catalog.append("metrics", metrics, run_id)
    # hot-key rollup (north_rule: skewed celebrity entities): per-run
    # depicted-entity counts via salted two-stage aggregation, so one
    # Zipf-hot celebrity never funnels into a single reducer
    from .operators.skew import entity_mention_counts

    catalog.append(
        "entity_counts",
        entity_mention_counts(new_triples).withColumn(
            "run_id", F.lit(run_id)
        ),
        run_id,
    )
    new_triples.unpersist()
    return {
        "run_id": run_id,
        "n_triples": n_rows,
        "n_docs": n_docs,
        "snapshot": snap,
    }
