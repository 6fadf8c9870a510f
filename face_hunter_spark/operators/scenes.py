"""Scene extraction — the reference's signature sequence operator
(src/postprocessing/graph_postprocessing.py:8-59) re-expressed for
Spark.

Two implementations:

1. ``extract_scenes_kernel`` — a faithful re-implementation of the
   reference semantics *including its quirks* (SURVEY.md §2.12.1-2),
   because they change scene boundaries and therefore emitted triples
   (the P/R >= 0.95 parity gate).  Verified bit-exact against the
   reference's golden tests (tests/test_scene_extraction.py:4-40).
   Quirks kept:
     * scene-continuation match is CARDINALITY-ONLY: the reference's
       ``len(pred) == len(names) or all(sort(pred) == names)`` short-
       circuits on equal length, and the numpy compare of unequal-
       length arrays is scalar False — so only length matters
       (graph_postprocessing.py:40-43).
     * the start skip-guard's ``(pred) == 0`` compares a list to 0 and
       is always False; only the length-mismatch arm is live
       (graph_postprocessing.py:49-51).
     * scene end is backdated to ``ts[frame - threshold + 1]``; an
       open scene at the last frame closes at ``ts[last]``; a scene
       that closes AND restarts on the last frame is dropped.
   Scales out via ``applyInPandas(groupBy(doc_id))``: the algorithm is
   inherently sequential per video (loop-carried scene state), but
   videos are independent — at 10^12 docs the parallelism unit is the
   document, and each group is tiny (frames per doc), so this is a
   single shuffle by doc_id and embarrassingly parallel after that.

2. ``scenes_gaps_and_islands`` — the idiomatic Spark-native variant
   (lag + change-flag + running-sum island id).  Pure built-in
   expressions (whole-stage codegen, no Python), but it implements the
   *intended* semantics (strict sorted-equality runs, no threshold
   smoothing), NOT the reference quirks — kept as the documented
   scalable alternative and used for SQL-oracle checks.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..schemas import SCENES


def clean_recognitions(labels_seq: Iterable[list[str]]) -> list[list[str]]:
    """Drop 'unknown'; an empty frame gets a unique positional sentinel
    [str(i)] (graph_postprocessing.py:24-33)."""
    out = []
    for i, labels in enumerate(labels_seq):
        kept = [x for x in labels if x != "unknown"]
        out.append(kept if kept else [str(i)])
    return out


def extract_scenes_kernel(
    labels_seq: list[list[str]],
    timestamps: list[float],
    frame_threshold: int = 3,
) -> list[tuple[list[str], float, float]]:
    """Faithful reference semantics.  Returns [(sorted_names, start, end)]."""
    if len(labels_seq) != len(timestamps):
        raise ValueError("recognitions do not fit timestamps")
    recs = clean_recognitions(labels_seq)
    n = len(recs)
    t = frame_threshold
    lens = [len(r) for r in recs]
    sorted_recs = [sorted(r) for r in recs]

    scenes: list[tuple[list[str], float, float]] = []
    active: list[str] | None = None  # sorted names of the open scene
    start_ts: float = 0.0

    for f in range(n):
        if f - (t - 1) < 0:
            continue
        lo = f - (t - 1)

        # close: none of the last t frames (lo..f) has the active
        # scene's cardinality  (quirk: length-only match)
        if active is not None and not any(
            lens[i] == len(active) for i in range(lo, f + 1)
        ):
            scenes.append((active, start_ts, timestamps[lo]))
            active = None

        # open scene reaching the final frame closes there
        if active is not None and f == n - 1:
            scenes.append((active, start_ts, timestamps[f]))
            # reference leaves the scene "active" but the loop ends;
            # a restart below on this frame would be dropped anyway,
            # and the start-guard below can't re-append it.

        # start skip-guard: any of the t-1 frames BEFORE f with a
        # different cardinality than the current frame blocks a start
        # (quirk: the ==0 arm is dead)
        if any(lens[i] != lens[f] for i in range(lo, f)):
            continue

        if active is None and all(
            sorted_recs[i] == sorted_recs[f] for i in range(lo, f)
        ):
            # NB: opening on the very last frame is a no-op (nothing is
            # emitted after the loop) — same as the reference, where a
            # scene (re)started on the final iteration is dropped.
            active = sorted_recs[f]
            start_ts = timestamps[lo]

    return scenes


def _scenes_one_doc(pdf: pd.DataFrame, frame_threshold: int) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts_ms", "frame_no"], kind="mergesort")
    doc_id = pdf["doc_id"].iloc[0]
    labels_seq = [list(x) for x in pdf["labels"]]
    ts = pdf["ts_ms"].tolist()
    found = extract_scenes_kernel(labels_seq, ts, frame_threshold)
    # explicit dtypes: an empty group would otherwise default entities
    # to float64, which pyarrow can't cast to list<string>
    return pd.DataFrame(
        {
            "doc_id": pd.Series([doc_id] * len(found), dtype=object),
            "scene_idx": np.arange(len(found), dtype=np.int32),
            "entities": pd.Series([names for names, _, _ in found], dtype=object),
            "start_ms": np.array([s for _, s, _ in found], dtype=np.float64),
            "end_ms": np.array([e for _, _, e in found], dtype=np.float64),
        }
    )


def extract_scenes(
    frame_predictions: DataFrame, frame_threshold: int = 3
) -> DataFrame:
    """Distributed scene extraction: one sequential pass per doc_id via
    applyInPandas.  Input: FRAME_PREDICTIONS; output: SCENES.

    Scale note: this is the only per-doc sequential stage; it induces
    exactly one hash shuffle on doc_id (and Catalyst reuses that
    partitioning if mentions were already grouped by doc).  Per-group
    state is O(frames_per_doc) — no skew risk since docs are bounded.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _scenes_one_doc(pdf, frame_threshold)

    return frame_predictions.groupBy("doc_id").applyInPandas(fn, schema=SCENES)


def _scenes_out_pdf(out_doc, out_idx, out_ents, out_s, out_e) -> pd.DataFrame:
    """Shared SCENES-schema batch assembly for the packed mapInPandas
    stages (explicit dtypes: empty batches must not infer float64 for
    the list<string> column)."""
    return pd.DataFrame(
        {
            "doc_id": pd.Series(out_doc, dtype=object),
            "scene_idx": pd.array(out_idx, dtype="int32"),
            "entities": pd.Series(out_ents, dtype=object),
            "start_ms": pd.array(out_s, dtype="float64"),
            "end_ms": pd.array(out_e, dtype="float64"),
        }
    )


def extract_scenes_from_faces(
    linked_faces: DataFrame, frame_threshold: int = 3
) -> DataFrame:
    """Fused frame-assembly + scene extraction: one shuffle on doc_id
    instead of two (groupBy frame THEN groupBy doc).  Input: linked
    face rows (doc_id, frame_no, ts_ms, face_idx, label) with NULL
    face_idx marking empty frames.  At 10^12 docs this halves the
    shuffle bytes of the post-linking path; same output as
    assemble_frame_predictions |> extract_scenes (tested equal)."""

    from typing import Iterator

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_ents, out_s, out_e = [], [], [], [], []
            for doc_id, rows in zip(pdf["doc_id"], pdf["rows"]):
                frames: dict[tuple, list] = {}
                for r in rows:  # struct(ts_ms, frame_no, face_idx, label)
                    key = (r["ts_ms"], r["frame_no"])
                    bucket = frames.setdefault(key, [])
                    if r["face_idx"] is not None:
                        bucket.append((r["face_idx"], r["label"]))
                keys = sorted(frames)
                labels_seq = [
                    [lab for _, lab in sorted(frames[k])] for k in keys
                ]
                ts_seq = [k[0] for k in keys]
                found = extract_scenes_kernel(
                    labels_seq, ts_seq, frame_threshold
                )
                for i, (names, s, e) in enumerate(found):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_ents.append(names)
                    out_s.append(s)
                    out_e.append(e)
            yield _scenes_out_pdf(out_doc, out_idx, out_ents, out_s, out_e)

    import pyspark.sql.functions as F2

    from .util import ensure_parallelism

    # one JVM-side shuffle packs each doc into a single row; the Python
    # stage then streams Arrow batches of docs — no per-group pandas
    # machinery (applyInPandas pays ~ms per group; docs are tiny).
    # Explicit-count repartition after the agg: AQE would otherwise
    # coalesce the packed shuffle by bytes and serialize the Python
    # kernel onto a handful of cores at replica scale
    packed = (
        linked_faces.groupBy("doc_id")
        .agg(
            F2.collect_list(
                F2.struct("ts_ms", "frame_no", "face_idx", "label")
            ).alias("rows")
        )
    )
    return ensure_parallelism(packed, factor=1).mapInPandas(fn, schema=SCENES)


def scenes_gaps_and_islands(frame_predictions: DataFrame) -> DataFrame:
    """Spark-native run-length variant: island = maximal run of frames
    with identical sorted entity sets (after 'unknown' removal; empty
    frames break runs).  100% built-in expressions — whole-stage
    codegen, no Python workers.  Intended semantics, not the quirky
    reference smoothing; see module docstring.
    """
    w = Window.partitionBy("doc_id").orderBy("ts_ms", "frame_no")
    cleaned = frame_predictions.withColumn(
        "ents", F.array_sort(F.filter("labels", lambda x: x != F.lit("unknown")))
    )
    flagged = cleaned.withColumn(
        "chg",
        F.when(
            F.lag("ents").over(w).isNull()
            | (F.lag("ents").over(w) != F.col("ents")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn("island", F.sum("chg").over(w))
    return (
        islands.where(F.size("ents") > 0)
        .groupBy("doc_id", "island", "ents")
        .agg(
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
            F.count(F.lit(1)).alias("n_frames"),
        )
        .select(
            "doc_id",
            F.col("island").cast("int").alias("scene_idx"),
            F.col("ents").alias("entities"),
            "start_ms",
            "end_ms",
            "n_frames",
        )
    )

def extract_scenes_packed(
    frame_predictions: DataFrame, frame_threshold: int = 3
) -> DataFrame:
    """Same semantics as ``extract_scenes`` (quirk-faithful kernel),
    different physical shape: ONE JVM collect_list shuffle packs each
    doc into a row, then a single ``mapInPandas`` stage streams Arrow
    batches of whole docs.  applyInPandas pays per-group pandas setup
    (~ms/group — dominant when docs are small and numerous); the packed
    form amortizes it across a batch.  Tested equal to extract_scenes.
    """
    from typing import Iterator

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_ents, out_s, out_e = [], [], [], [], []
            for doc_id, rows in zip(pdf["doc_id"], pdf["rows"]):
                seq = sorted(rows, key=lambda r: (r["ts_ms"], r["frame_no"]))
                labels_seq = [list(r["labels"]) for r in seq]
                ts_seq = [r["ts_ms"] for r in seq]
                found = extract_scenes_kernel(
                    labels_seq, ts_seq, frame_threshold
                )
                for i, (names, s, e) in enumerate(found):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_ents.append(names)
                    out_s.append(s)
                    out_e.append(e)
            yield _scenes_out_pdf(out_doc, out_idx, out_ents, out_s, out_e)

    from .util import ensure_parallelism

    packed = frame_predictions.groupBy("doc_id").agg(
        F.collect_list(F.struct("ts_ms", "frame_no", "labels")).alias("rows")
    )
    # the packed rows are few and small, so AQE coalesces the shuffle
    # to 1-2 partitions — which would serialize the Python kernel onto
    # 1-2 cores; an explicit-count repartition is exempt from AQE
    # coalescing and spreads the per-doc work across the cluster
    return ensure_parallelism(packed, factor=1).mapInPandas(fn, schema=SCENES)
