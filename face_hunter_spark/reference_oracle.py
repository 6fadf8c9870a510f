"""Sequential pure-Python oracle implementing the REFERENCE semantics
end-to-end (recognize -> extract_scenes -> triples), used only by the
parity tests (BASELINE.json: triple P/R >= 0.95 vs reference output).

This is an independent, single-threaded re-derivation of the behavior
documented in SURVEY.md §2/§3 — brute-force 1-NN cosine linking
(face_recognition.py:300-314), the quirky scene smoothing
(graph_postprocessing.py:8-59), and the triple shapes of
graph.py:70-117 — sharing no code with the Spark operators except the
deterministic fake-vision input model.  Timedelta formatting uses
python's datetime.timedelta so the Spark SQL formatter is checked
against the reference's actual str(timedelta) behavior.
"""

from __future__ import annotations

from datetime import timedelta

import numpy as np

from . import fakevision as fv
from .schemas import HOME_URI, NS


def _fmt(ms: float) -> str:
    return str(timedelta(milliseconds=ms)).split(".", 2)[0]


def recognize_doc(
    doc_spans: list[dict], doc_id: str, n_entities: int,
    gallery_labels: np.ndarray, gallery_mat: np.ndarray,
    distance_threshold: float = 0.6,
    one_face: bool = False,
) -> tuple[list[list[str]], list[float]]:
    """Frame-wise predictions + timestamps for one document, in span
    order — the reference's recognize_video output IR.  ``one_face``
    keeps only the largest-box-height face per frame before linking
    (face_recognition.py:367-371; ties -> first occurrence)."""
    gnorm = np.linalg.norm(gallery_mat, axis=1)
    frame_preds: list[list[str]] = []
    timestamps: list[float] = []
    for span in doc_spans:
        if span["kind"] != "media":
            continue
        _, frame_no = fv.parse_media_ref(span["media_ref"])
        faces = list(enumerate(fv.frame_faces(doc_id, frame_no, n_entities)))
        if one_face and len(faces) > 1:
            heights = [
                fv.face_geometry(doc_id, frame_no, j)[0][3]
                for j, _ in faces
            ]
            faces = [faces[int(np.argmax(heights))]]
        labels = []
        for j, (kind, ent) in faces:
            q = fv.face_embedding(doc_id, frame_no, j, kind, ent, n_entities)
            cos = (gallery_mat @ q) / (gnorm * np.linalg.norm(q))
            dist = 1.0 - cos
            i = int(np.argmin(dist))
            labels.append(
                gallery_labels[i] if dist[i] < distance_threshold else "unknown"
            )
        frame_preds.append(labels)
        timestamps.append(frame_no * 1000.0)
    return frame_preds, timestamps


def scenes_reference_style(preds, timestamps, frame_threshold=3):
    """Reference scene smoothing, re-derived as a direct state machine
    (independent from operators/scenes.extract_scenes_kernel)."""
    cleaned = []
    for i, p in enumerate(preds):
        kept = [e for e in p if e != "unknown"]
        cleaned.append(kept or [str(i)])

    result = []
    open_names, open_start = None, None
    last = len(cleaned) - 1
    for f, cur in enumerate(cleaned):
        w0 = f - frame_threshold + 1
        if w0 < 0:
            continue
        if open_names is not None:
            window_lens = {len(cleaned[i]) for i in range(w0, f + 1)}
            if len(open_names) not in window_lens:
                result.append((open_names, open_start, timestamps[w0]))
                open_names = None
            elif f == last:
                result.append((open_names, open_start, timestamps[f]))
                continue  # stays "open"; nothing more can happen
        if any(len(cleaned[i]) != len(cur) for i in range(w0, f)):
            continue
        cur_sorted = sorted(cur)
        if open_names is None and all(
            sorted(cleaned[i]) == cur_sorted for i in range(w0, f)
        ):
            open_names, open_start = cur_sorted, timestamps[w0]
    return result


def triples_for_doc(
    doc_id: str,
    scenes: list[tuple[list[str], float, float]],
    uri_by_name: dict[str, str],
) -> set[tuple[str, str, str]]:
    """Reference triple emission (graph.py:70-117), core vocabulary
    only (the alias vocabulary is additive, excluded from parity)."""
    v = HOME_URI + doc_id
    out = {
        (v, NS["rdf_type"], NS["mpeg7_video"]),
        (v, NS["dc_identifier"], f"http://www.youtube.com/watch?v={doc_id}"),
        (v, NS["dc_title"], doc_id),
    }
    for names, start_ms, end_ms in scenes:
        s = f"{v}#t={_fmt(start_ms)},{_fmt(end_ms)}"
        out |= {
            (s, NS["rdf_type"], NS["video_scene"]),
            (s, NS["video_scene_from"], v),
            (s, NS["video_temporal_segment_of"], v),
            (s, NS["temporal_has_start"], _fmt(start_ms)),
            (s, NS["temporal_duration"], _fmt(end_ms - start_ms)),
            (s, NS["temporal_has_finish"], _fmt(end_ms)),
        }
        for name in names:
            uri = uri_by_name.get(name)
            if uri is not None:
                out.add((s, NS["foaf_depicts"], uri))
    return out


def oracle_triples(
    documents_pdf,
    gallery_pdf,
    catalog_pdf,
    n_entities: int,
    distance_threshold: float = 0.6,
    frame_threshold: int = 3,
    one_face: bool = False,
) -> set[tuple[str, str, str]]:
    """Full sequential reference-semantics run over a pandas corpus."""
    g = gallery_pdf.sort_values("gallery_id")
    glabels = g["label"].to_numpy()
    gmat = np.vstack([np.asarray(e, dtype=np.float32) for e in g["embedding"]])

    uri_by_name: dict[str, str] = {}
    for name, grp in catalog_pdf.groupby("name"):
        db = grp[grp["source_kg"] == "dbpedia"]["entity"]
        wd = grp[grp["source_kg"] == "wikidata"]["entity"]
        uri = db.iloc[0] if len(db) else (wd.iloc[0] if len(wd) else None)
        if uri is not None:
            uri_by_name[name] = uri

    all_triples: set[tuple[str, str, str]] = set()
    for _, row in documents_pdf.iterrows():
        doc_id = row["doc_id"]
        preds, ts = recognize_doc(
            list(row["spans"]), doc_id, n_entities, glabels, gmat,
            distance_threshold, one_face=one_face,
        )
        scn = scenes_reference_style(preds, ts, frame_threshold)
        all_triples |= triples_for_doc(doc_id, scn, uri_by_name)
    return all_triples


def precision_recall(
    got: set[tuple], expected: set[tuple]
) -> tuple[float, float]:
    if not got or not expected:
        return 0.0, 0.0
    inter = len(got & expected)
    return inter / len(got), inter / len(expected)
