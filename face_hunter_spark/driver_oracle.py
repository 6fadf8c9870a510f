"""Independent expected-output computation for the driver KG queries.

The driver's flagship pipeline (__spark_entry__._kg_pipeline) is fully
deterministic in the document ids of the sf tables: doc 'vid_%05d'
gets ``pmod(xxhash64(str(orig_id)), 12) + 4`` media frames, the fake
vision model is keyed by (doc_id, frame_no) alone, and the gallery /
entity catalog are fixed synthetic tables.  So the expected triples per
document can be regenerated WITHOUT Spark — sequential pure
Python/numpy, sharing no code with the distributed operators (the
recognize/scene/triple math comes from reference_oracle, the
independently-derived reference-semantics model) — and shipped to
DuckDB as a VALUES literal keyed by orig_id.  The oracle SQL joins
those rows against the ``documents`` view, which makes the check
sf-agnostic for any sf whose ids fall below MAX_ORIG_ID (a guard CTE
errors loudly beyond that instead of silently passing).

``xxh64`` is the reference XXH64 algorithm (public domain) with
Spark's seed=42 string semantics, validated bit-exact against
``F.xxhash64`` in tests/test_driver_oracle.py.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from . import fakevision as fv
from . import reference_oracle as ro
from . import synth
from .schemas import HOME_URI, NS

MAX_ORIG_ID = 500  # covers sf0.001 and sf0.01 (ids 0..499)

_MASK = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 (unsigned); Spark's xxhash64 default seed is 42."""
    n = len(data)
    i = 0
    if n >= 32:
        v = [
            (seed + _P1 + _P2) & _MASK, (seed + _P2) & _MASK,
            seed & _MASK, (seed - _P1) & _MASK,
        ]
        while i <= n - 32:
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                x = (v[j] + lane * _P2) & _MASK
                v[j] = (_rotl(x, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7)
             + _rotl(v[2], 12) + _rotl(v[3], 18)) & _MASK
        for x in v:
            h ^= (_rotl((x * _P2) & _MASK, 31) * _P1) & _MASK
            h = (h * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _MASK, 31) * _P1) & _MASK
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Signed 64-bit value matching F.xxhash64(string col)."""
    h = xxh64(s.encode(), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def n_frames_for(orig_id: int) -> int:
    """__spark_entry__._interleaved_documents frame count."""
    return spark_xxhash64_str(str(orig_id)) % 12 + 4


N_ENTITIES = 20  # __spark_entry__.N_ENTITIES
_THUMBS, _DISTRACTORS = 8, 3


@lru_cache(maxsize=1)
def _gallery():
    g = synth.make_gallery_pdf(
        n_entities=N_ENTITIES, thumbs_per_entity=_THUMBS,
        distractors=_DISTRACTORS,
    ).sort_values("gallery_id")
    labels = g["label"].to_numpy()
    mat = np.vstack([np.asarray(e, dtype=np.float32) for e in g["embedding"]])
    return labels, mat


@lru_cache(maxsize=1)
def uri_by_name() -> dict[str, str]:
    cat = synth.make_entity_catalog_pdf(
        n_entities=N_ENTITIES, distractors=_DISTRACTORS
    )
    out: dict[str, str] = {}
    for name, grp in cat.groupby("name"):
        db = grp[grp["source_kg"] == "dbpedia"]["entity"]
        wd = grp[grp["source_kg"] == "wikidata"]["entity"]
        if len(db):
            out[name] = db.iloc[0]
        elif len(wd):
            out[name] = wd.iloc[0]
    return out


def doc_scenes(orig_id: int) -> list[tuple[list[str], float, float]]:
    """Expected scenes for driver doc orig_id: fake-vision recognize
    (1-NN vs the 20-entity gallery at threshold 0.6) + the reference
    scene smoothing, both from reference_oracle."""
    doc_id = f"vid_{orig_id:05d}"
    labels, mat = _gallery()
    spans = [
        {"kind": "media", "media_ref": f"frame://{doc_id}/{i}"}
        for i in range(n_frames_for(orig_id))
    ]
    preds, ts = ro.recognize_doc(spans, doc_id, N_ENTITIES, labels, mat, 0.6)
    return ro.scenes_reference_style(preds, ts, frame_threshold=3)


@lru_cache(maxsize=1)
def expected_scene_rows() -> list[tuple]:
    """One row per (doc, scene, resolved entity URI) — plus a NULL-URI
    row for scenes none of whose entities resolve (so scene counts stay
    derivable).  Row: (orig_id, scene_idx, start_str, dur_str,
    finish_str, entity_uri | None)."""
    uris = uri_by_name()
    rows: list[tuple] = []
    for oid in range(MAX_ORIG_ID):
        for idx, (names, s_ms, e_ms) in enumerate(doc_scenes(oid)):
            resolved = sorted(
                {uris[n] for n in names if n in uris}
            )
            fmt = ro._fmt
            base = (oid, idx, fmt(s_ms), fmt(e_ms - s_ms), fmt(e_ms))
            if resolved:
                rows.extend(base + (u,) for u in resolved)
            else:
                rows.append(base + (None,))
    return rows


@lru_cache(maxsize=1)
def expected_pred_counts() -> dict[int, dict[str, int]]:
    """orig_id -> {pred: n distinct triples} for the full pipeline
    output (core vocabulary + the additive alias predicates)."""
    out: dict[int, dict[str, int]] = {}
    by_doc: dict[int, list[tuple]] = {}
    for row in expected_scene_rows():
        by_doc.setdefault(row[0], []).append(row)
    for oid in range(MAX_ORIG_ID):
        counts = {
            NS["rdf_type"]: 1,  # video
            NS["dc_identifier"]: 1,
            NS["dc_title"]: 1,
        }
        scenes = {}
        n_depicts = 0
        for (_, idx, s, d, e, uri) in by_doc.get(oid, []):
            scenes[idx] = True
            if uri is not None:
                n_depicts += 1
        n_scenes = len(scenes)
        if n_scenes:
            counts[NS["rdf_type"]] += n_scenes
            for p in ("video_scene_from", "video_temporal_segment_of",
                      "temporal_has_start", "temporal_duration",
                      "temporal_has_finish", "hunter_has_scene"):
                counts[NS[p]] = n_scenes
        if n_depicts:
            counts[NS["foaf_depicts"]] = n_depicts
            counts[NS["sdo_depicts"]] = n_depicts
        out[oid] = counts
    return out


# scalar guard: errors loudly if the sf's doc ids exceed the
# precomputed range instead of silently under-counting
_GUARD = (
    f"(SELECT CASE WHEN max(doc_id) >= {MAX_ORIG_ID} THEN error("
    f"'driver_oracle only precomputes doc ids < {MAX_ORIG_ID}') "
    "ELSE 1 END FROM documents) = 1"
)


def _values_pred_counts() -> str:
    return ",\n  ".join(
        f"({oid}, '{pred}', {n})"
        for oid, preds in sorted(expected_pred_counts().items())
        for pred, n in sorted(preds.items())
    )


def _values_scenes() -> str:
    def fmt(row):
        oid, idx, s, d, e, uri = row
        u = "NULL" if uri is None else f"'{uri}'"
        return f"({oid}, {idx}, '{s}', '{e}', {u})"

    return ",\n  ".join(fmt(r) for r in expected_scene_rows())


def sql_kg_triples_by_pred() -> str:
    return f"""
WITH per_doc(orig_id, pred, n) AS (VALUES
  {_values_pred_counts()})
SELECT pred, sum(n)::BIGINT AS n
FROM per_doc
JOIN documents ON per_doc.orig_id = documents.doc_id
WHERE {_GUARD}
GROUP BY pred ORDER BY pred
"""


def sql_kg_videos_by_attribute() -> str:
    """Expected result of the reference's docstring example filter
    (male, born before 1970, wikidata-linked) over the expected scenes,
    with the attribute dim regenerated from synth."""
    attr_rows = ",\n  ".join(
        f"('{r.entity}', '{r.wikidata_entity}', '{r.birth_date}', "
        f"'{r.gender}')"
        for r in synth.make_entity_attributes_pdf(
            n_entities=N_ENTITIES, distractors=_DISTRACTORS
        ).itertuples()
    )
    return f"""
WITH scenes(orig_id, scene_idx, start_str, finish_str, entity) AS (VALUES
  {_values_scenes()}),
attrs(entity, wikidata_entity, birth_date, gender) AS (VALUES
  {attr_rows}),
present AS (
  SELECT s.*, printf('vid_%05d', d.doc_id::INT) AS vid
  FROM scenes s JOIN documents d ON s.orig_id = d.doc_id
  WHERE s.entity IS NOT NULL AND {_GUARD})
SELECT DISTINCT p.vid AS title,
       'http://www.youtube.com/watch?v=' || p.vid AS link,
       p.entity AS entity,
       p.start_str AS start, p.finish_str AS finish
FROM present p JOIN attrs a ON p.entity = a.entity
WHERE a.wikidata_entity LIKE '%www.wikidata.org%'
  AND a.gender = 'male' AND a.birth_date < '1970-01-01'
ORDER BY link, start, p.entity
"""


def sql_kg_entity_mentions() -> str:
    """Per-entity distinct-scene depicts counts — the salted rollup's
    expected output."""
    return f"""
WITH scenes(orig_id, scene_idx, start_str, finish_str, entity) AS (VALUES
  {_values_scenes()}),
present AS (
  SELECT DISTINCT s.orig_id, s.scene_idx, s.entity
  FROM scenes s JOIN documents d ON s.orig_id = d.doc_id
  WHERE s.entity IS NOT NULL AND {_GUARD})
SELECT entity AS entity_uri, count(*)::BIGINT AS n_scenes
FROM present GROUP BY entity
ORDER BY n_scenes DESC, entity_uri
"""


def sql_bgp_scene_depicts() -> str:
    """{?v hasScene ?s . ?s sdo:depicts ?e} over the expected KG —
    scene URI reconstructed exactly as triples.scene_uri formats it."""
    return f"""
WITH scenes(orig_id, scene_idx, start_str, finish_str, entity) AS (VALUES
  {_values_scenes()})
SELECT DISTINCT
  '{HOME_URI}' || printf('vid_%05d', doc.doc_id::INT) AS v,
  '{HOME_URI}' || printf('vid_%05d', doc.doc_id::INT)
    || '#t=' || sc.start_str || ',' || sc.finish_str AS s,
  sc.entity AS e
FROM scenes sc JOIN documents doc ON sc.orig_id = doc.doc_id
WHERE sc.entity IS NOT NULL AND {_GUARD}
ORDER BY v, s, e
"""


def sql_bgp_entity_titles(name: str = "Entity 001") -> str:
    """{?s sdo:depicts <anchor> . ?s video:sceneFrom ?v . ?v dc:title ?t}
    with the anchor resolved through the same dbpedia-preferred map the
    pipeline uses; titles fall back to the doc_id (the interleaved
    corpus carries no title column)."""
    anchor = uri_by_name()[name]
    return f"""
WITH scenes(orig_id, scene_idx, start_str, finish_str, entity) AS (VALUES
  {_values_scenes()})
SELECT DISTINCT
  '{HOME_URI}' || printf('vid_%05d', doc.doc_id::INT)
    || '#t=' || sc.start_str || ',' || sc.finish_str AS s,
  '{HOME_URI}' || printf('vid_%05d', doc.doc_id::INT) AS v,
  printf('vid_%05d', doc.doc_id::INT) AS t
FROM scenes sc JOIN documents doc ON sc.orig_id = doc.doc_id
WHERE sc.entity = '{anchor}' AND {_GUARD}
ORDER BY s, v, t
"""


def sql_bgp_optional_filter() -> str:
    """{?v hasScene ?s OPTIONAL{?s sdo:depicts ?e}
    FILTER(e IS NULL OR dbpedia)} — OPTIONAL preserves entity-less
    scenes with a NULL ?e; the FILTER then keeps NULLs and dbpedia URIs
    (dropping the wikidata-only entities), exactly the reference's
    OPTIONAL-name + FILTER-lang shape (knowledge_graphs.py:103-104)."""
    return f"""
WITH scenes(orig_id, scene_idx, start_str, finish_str, entity) AS (VALUES
  {_values_scenes()}),
nodes AS (
  SELECT DISTINCT
    '{HOME_URI}' || printf('vid_%05d', doc.doc_id::INT) AS v,
    '{HOME_URI}' || printf('vid_%05d', doc.doc_id::INT)
      || '#t=' || sc.start_str || ',' || sc.finish_str AS s
  FROM scenes sc JOIN documents doc ON sc.orig_id = doc.doc_id
  WHERE {_GUARD}),
dep AS (
  SELECT DISTINCT
    '{HOME_URI}' || printf('vid_%05d', doc.doc_id::INT)
      || '#t=' || sc.start_str || ',' || sc.finish_str AS s,
    sc.entity AS e
  FROM scenes sc JOIN documents doc ON sc.orig_id = doc.doc_id
  WHERE sc.entity IS NOT NULL AND {_GUARD})
SELECT DISTINCT n.v, n.s, d.e
FROM nodes n LEFT JOIN dep d USING (s)
WHERE d.e IS NULL OR d.e LIKE 'http://dbpedia.org/%'
ORDER BY v, s, e
"""


def sql_sparql_construct() -> str:
    """CONSTRUCT {?e appearsIn ?v . ?v schema:about ?e} over the
    expected KG: both template projections of the (v, e) bindings,
    deduped by UNION (SPARQL's graph-set semantics)."""
    return f"""
WITH scenes(orig_id, scene_idx, start_str, finish_str, entity) AS (VALUES
  {_values_scenes()}),
b AS (
  SELECT DISTINCT
    '{HOME_URI}' || printf('vid_%05d', doc.doc_id::INT) AS v,
    sc.entity AS e
  FROM scenes sc JOIN documents doc ON sc.orig_id = doc.doc_id
  WHERE sc.entity IS NOT NULL AND {_GUARD})
SELECT e AS subj, 'http://face-hunter.org/ontology/appearsIn' AS pred,
       v AS obj
FROM b
UNION
SELECT v, 'https://schema.org/about', e FROM b
ORDER BY subj, pred, obj
"""


def sql_kg_scene_search() -> str:
    return f"""
WITH scenes(orig_id, scene_idx, start_str, finish_str, entity) AS (VALUES
  {_values_scenes()}),
present AS (
  SELECT s.*, printf('vid_%05d', d.doc_id::INT) AS vid
  FROM scenes s JOIN documents d ON s.orig_id = d.doc_id
  WHERE s.entity IS NOT NULL AND {_GUARD}),
counts AS (
  SELECT entity, count(*) AS n
  FROM (SELECT DISTINCT vid, scene_idx, entity FROM present)
  GROUP BY entity),
target AS (SELECT entity FROM counts ORDER BY n DESC, entity LIMIT 1),
hits AS (
  SELECT DISTINCT vid, scene_idx, start_str, finish_str
  FROM present JOIN target USING (entity)),
out AS (
  SELECT DISTINCT p.vid AS title,
         'http://www.youtube.com/watch?v=' || p.vid AS link,
         p.entity AS co_entity,
         h.start_str AS start, h.finish_str AS finish
  FROM hits h
  JOIN present p ON p.vid = h.vid AND p.scene_idx = h.scene_idx)
SELECT title, link, co_entity, start, finish
FROM out ORDER BY link, start, co_entity
"""


@lru_cache(maxsize=1)
def expected_face_geometry_rows() -> list[tuple]:
    """one_face largest-face selection + detection geometry, expected
    per frame-with-faces: (orig_id, frame_no, kept face_idx,
    floor(box_height*1000), floor(confidence*100000),
    floor((right_eye.x - left_eye.x)*1000) from the MTCNN-style
    keypoints).  Regenerated sequentially from fakevision (same math
    the Spark stage runs, independent of partitioning/batching)."""
    import math

    rows: list[tuple] = []
    for oid in range(MAX_ORIG_ID):
        doc_id = f"vid_{oid:05d}"
        for f in range(n_frames_for(oid)):
            faces = fv.frame_faces(doc_id, f, N_ENTITIES)
            if not faces:
                continue
            geoms = [fv.face_geometry(doc_id, f, j)
                     for j in range(len(faces))]
            j = int(np.argmax([g[0][3] for g in geoms]))
            box, conf = geoms[j]
            kp = fv.face_keypoints(doc_id, f, j)
            # float32 landmark values widened to float64 exactly, then
            # subtracted — mirrors the Spark cast("double") - cast
            rows.append((
                oid, f, j,
                math.floor(float(box[3]) * 1000.0),
                math.floor(float(conf) * 100000.0),
                math.floor((float(kp[1, 0]) - float(kp[0, 0])) * 1000.0),
            ))
    return rows


def sql_largest_face_geometry() -> str:
    vals = ",\n  ".join(
        f"({o}, {f}, {j}, {h}, {c}, {e})"
        for o, f, j, h, c, e in expected_face_geometry_rows()
    )
    return f"""
WITH geo(orig_id, frame_no, face_idx, height_milli, conf_micro,
         eye_dx_milli) AS (VALUES
  {vals})
SELECT printf('vid_%05d', g.orig_id::INT) AS doc_id,
       g.frame_no::INT AS frame_no, g.face_idx::INT AS face_idx,
       g.height_milli::BIGINT AS height_milli,
       g.conf_micro::BIGINT AS conf_micro,
       g.eye_dx_milli::BIGINT AS eye_dx_milli
FROM geo g JOIN documents d ON g.orig_id = d.doc_id
WHERE {_GUARD}
ORDER BY doc_id, frame_no
"""


def sql_jsonl_interleaved_spans(n_docs: int = 64) -> str:
    """VALUES oracle for the JSONL ingestion query: the deterministic
    corpus regenerated by the same pure-Python generator the Spark side
    writes to disk, so the JSON parse + explicit-schema read +
    posexplode path is value-checked end to end (including the
    escaping-hostile text rows)."""
    rows = []
    for r in synth.make_interleaved_jsonl_rows(n_docs):
        for idx, s in enumerate(r["spans"]):
            rows.append((r["doc_id"], idx, s["kind"], s["text"],
                         s["media_ref"], s["offset"]))

    def q(v):
        return "NULL" if v is None else "'" + v.replace("'", "''") + "'"

    vals = ",\n  ".join(
        f"({q(d)}, {i}, {q(k)}, {q(t)}, {q(m)}, {o})"
        for d, i, k, t, m, o in rows
    )
    return f"""
WITH spans(doc_id, span_idx, kind, text, media_ref, span_offset) AS (VALUES
  {vals})
SELECT doc_id::VARCHAR AS doc_id, span_idx::INT AS span_idx,
       kind::VARCHAR AS kind, text::VARCHAR AS text,
       media_ref::VARCHAR AS media_ref, span_offset::INT AS span_offset
FROM spans ORDER BY doc_id, span_idx
"""
