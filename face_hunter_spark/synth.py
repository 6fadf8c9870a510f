"""Deterministic synthetic corpus (seed folded into md5 keys — stable
across runs, partitionings, and machines).

Produces the three input tables from FIXTURES.md:

* ``documents(doc_id, spans)``  — interleaved text + media spans
  (BASELINE.json input_hint shape).
* ``gallery(gallery_id, label, entity_uri, embedding)`` — broadcast
  side of the kNN join; 54 entities × ~20 thumbnails + 10% distractor
  entities never present in documents (evaluation.py:44-51 pattern).
* ``entity_catalog(entity, name, norm_name, source_kg)`` — one DBpedia
  and one Wikidata row per entity sharing norm_name (same_as edges for
  canonicalization, SURVEY.md §2.9).

Text spans draw from a small vocabulary and embed entity surface forms
so the text-analysis operators (language id, quality, fingerprints)
have signal to chew on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import fakevision as fv

N_ENTITIES = 54
THUMBS_PER_ENTITY = 20
DISTRACTOR_ENTITIES = 6  # never appear in documents

_VOCAB = (
    "the a of and to in video scene shows interview with talks about "
    "press premiere festival red carpet award ceremony stage crowd "
    "morning news clip footage camera close up wide shot outro intro"
).split()


def _words(key: str, n: int) -> str:
    rng = fv._rng("text/" + key)
    return " ".join(rng.choice(_VOCAB, size=n))


def make_documents_pdf(n_docs: int, n_entities: int = N_ENTITIES) -> pd.DataFrame:
    """Pandas frame with rows (doc_id, spans:list[dict]).

    Per doc: 2-8 media runs interleaved with text spans; media_ref
    'frame://{doc_id}/{k}' with frame_no monotone; offset strictly
    increasing; by-second timestamps => ts = frame_no * 1000 ms
    (reference timestamp synthesis, face_recognition.py:113-126).
    """
    rows = []
    for i in range(n_docs):
        doc_id = f"vid_{i:05d}"
        h = fv._h("doc/" + doc_id)
        n_frames = 8 + h % 25  # 8..32 sampled frames
        spans = []
        offset = 0
        frame_no = 0
        # leading text span (title-ish, mentions an entity sometimes)
        ent = fv.entity_names(n_entities)[h % n_entities]
        spans.append(
            {
                "kind": "text",
                "text": f"{ent} {_words(doc_id + '/t0', 6)}",
                "media_ref": None,
                "offset": offset,
            }
        )
        offset += 1
        while frame_no < n_frames:
            # a run of media spans
            run = 2 + fv._h(f"mr/{doc_id}/{frame_no}") % 5
            for _ in range(min(run, n_frames - frame_no)):
                spans.append(
                    {
                        "kind": "media",
                        "text": None,
                        "media_ref": f"frame://{doc_id}/{frame_no}",
                        "offset": offset,
                    }
                )
                offset += 1
                frame_no += 1
            # interleaved text span
            spans.append(
                {
                    "kind": "text",
                    "text": _words(f"{doc_id}/t{offset}", 4 + offset % 9),
                    "media_ref": None,
                    "offset": offset,
                }
            )
            offset += 1
        rows.append({"doc_id": doc_id, "spans": spans})
    return pd.DataFrame(rows)


def make_gallery_pdf(
    n_entities: int = N_ENTITIES,
    thumbs_per_entity: int = THUMBS_PER_ENTITY,
    distractors: int = DISTRACTOR_ENTITIES,
) -> pd.DataFrame:
    labels = fv.entity_names(n_entities + distractors)
    rows = []
    gid = 0
    for label in labels:
        uri = dbpedia_uri(label)
        for t in range(thumbs_per_entity):
            rows.append(
                {
                    "gallery_id": gid,
                    "label": label,
                    "entity_uri": uri,
                    "embedding": fv.gallery_embedding(label, t).tolist(),
                }
            )
            gid += 1
    return pd.DataFrame(rows)


def norm_name(label: str) -> str:
    return label.lower().replace(" ", "_")


def dbpedia_uri(label: str) -> str:
    return "http://dbpedia.org/resource/" + label.replace(" ", "_")


def wikidata_uri(label: str) -> str:
    # deterministic fake QID
    return f"http://www.wikidata.org/entity/Q{100000 + fv._h('qid/' + label) % 900000}"


def make_entity_catalog_pdf(
    n_entities: int = N_ENTITIES, distractors: int = DISTRACTOR_ENTITIES
) -> pd.DataFrame:
    """One dbpedia + one wikidata row per entity, same name/norm_name —
    the Thumbnails_links.csv analogue (graph.py:62-68).  A small slice
    of entities is wikidata-only so the DBpedia-preferred URI choice
    (graph.py:111-114) is exercised on both branches."""
    rows = []
    for i, label in enumerate(fv.entity_names(n_entities + distractors)):
        nn = norm_name(label)
        if i % 9 != 8:  # ~1/9 of entities are wikidata-only
            rows.append(
                {"entity": dbpedia_uri(label), "name": label, "norm_name": nn,
                 "source_kg": "dbpedia"}
            )
        rows.append(
            {"entity": wikidata_uri(label), "name": label, "norm_name": nn,
             "source_kg": "wikidata"}
        )
    return pd.DataFrame(rows)


def make_entity_attributes_pdf(
    n_entities: int = N_ENTITIES, distractors: int = DISTRACTOR_ENTITIES
) -> pd.DataFrame:
    """Offline entity-attribute dim table — the batch analogue of the
    reference's live ``service{}`` federation blocks (graph.py:205-215:
    dbo:birthDate from DBpedia, P21 gender label from Wikidata,
    owl:sameAs linking the two).  Keyed by the SAME preferred URI the
    depicts triples carry (DBpedia when present, else Wikidata —
    mirroring make_entity_catalog_pdf's 1-in-9 wikidata-only slice), so
    it broadcast-joins straight onto scene_view.entity.  Dates/genders
    are deterministic hash draws; dates stay ISO strings so lexical
    comparison == date comparison."""
    rows = []
    for i, label in enumerate(fv.entity_names(n_entities + distractors)):
        preferred = wikidata_uri(label) if i % 9 == 8 else dbpedia_uri(label)
        h = fv._h("attr/" + label)
        rows.append(
            {
                "entity": preferred,
                "wikidata_entity": wikidata_uri(label),
                "name": label,
                "birth_date": f"{1940 + h % 55:04d}-"
                              f"{1 + (h >> 8) % 12:02d}-"
                              f"{1 + (h >> 16) % 28:02d}",
                "gender": "male" if h % 2 == 0 else "female",
            }
        )
    return pd.DataFrame(rows)


def documents_df(spark, n_docs: int, n_entities: int = N_ENTITIES):
    from .schemas import DOCUMENTS

    pdf = make_documents_pdf(n_docs, n_entities)
    return spark.createDataFrame(pdf, schema=DOCUMENTS)


def gallery_df(spark, **kw):
    from .schemas import GALLERY

    return spark.createDataFrame(make_gallery_pdf(**kw), schema=GALLERY)


def entity_catalog_df(spark, **kw):
    from .schemas import ENTITY_CATALOG

    return spark.createDataFrame(make_entity_catalog_pdf(**kw), schema=ENTITY_CATALOG)


# ------------------------------------------------------------- jsonl

def make_enrich_candidates_pdf(
    labels: list[str], per_label: int = 8
) -> pd.DataFrame:
    """Scraped-thumbnail candidate batch for the enrichment job: rows
    (label, entity_uri, media_ref='thumb://{label}/{idx}').  The fake
    decode (fv.thumb_face_count) rejects ~1/3 of them (0- or 2-face
    photos), mirroring the reference's single-face filter
    (enrich_with_photos.py:118-151)."""
    rows = []
    for label in labels:
        uri = dbpedia_uri(label)
        for t in range(per_label):
            rows.append({
                "label": label,
                "entity_uri": uri,
                "media_ref": fv.thumb_ref(label, t),
            })
    return pd.DataFrame(rows)


def make_interleaved_jsonl_rows(n_docs: int) -> list[dict]:
    """Deterministic interleaved docs for the JSONL ingestion path
    (sources.read_interleaved_jsonl): same (doc_id, spans) shape as
    ``DOCUMENTS`` but with escaping-hostile text — quotes, backslash,
    unicode, tab — so the JSON round-trip (and the DuckDB VALUES
    oracle's SQL quoting) is exercised, not just happy-path ASCII.
    Pure arithmetic (no RNG) so the oracle regenerates it exactly."""
    hostile = [
        'says "hello" twice',
        "it's o'clock somewhere",
        "back\\slash and\ttab",
        "café naïve — unicode",
        "plain ascii text",
    ]
    rows: list[dict] = []
    for i in range(n_docs):
        doc_id = f"jd_{i:04d}"
        spans = [{
            "kind": "text",
            "text": f"{hostile[i % len(hostile)]} #{i}",
            "media_ref": None,
            "offset": 0,
        }]
        for k in range(1 + i % 4):  # 1..4 media spans
            spans.append({
                "kind": "media",
                "text": None,
                "media_ref": f"frame://{doc_id}/{k}",
                "offset": 1 + k,
            })
        rows.append({"doc_id": doc_id, "spans": spans})
    return rows


def write_interleaved_jsonl(path: str, n_docs: int) -> str:
    """Write the deterministic corpus as one JSON document per line
    (atomic rename so concurrent writers of the same corpus are safe);
    returns ``path``."""
    import json
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".")
    with os.fdopen(fd, "w") as f:
        for row in make_interleaved_jsonl_rows(n_docs):
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    os.replace(tmp, path)
    return path
