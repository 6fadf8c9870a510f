"""Vision stage: media decode -> face detect -> align -> embed, as ONE
``mapInPandas`` stage over Arrow batches.

The reference runs this as cv2 decode + MTCNN batches of 128 frames +
a single flattened encoder.predict call (face_recognition.py:84-221).
The Spark analogue: the Arrow batch is the unit of vectorization
(spark.sql.execution.arrow.maxRecordsPerBatch plays the 128-frame
role); faces from all frames in a batch are flattened, embedded in one
vectorized call, and unflattened back to rows — the exact trick at
face_recognition.py:206-220, reimplemented batch-wise.

Real CNN weights are not available in this container, so the decoder is
the deterministic fake from ``fakevision`` (same function the test
oracle uses).  A production deployment swaps ``encoder='hash'`` for an
ONNX-backed encoder with the identical mapInPandas signature — the
Spark-side plumbing (schema, batching, per-executor singleton) is what
this module owns and tests.

Emits one row per detected face, PLUS one face_idx=NULL row per
frame with zero faces — the reference keeps empty frames in the
prediction sequence (they become scene-breaking sentinels,
graph_postprocessing.py:31-32), so frames must never be dropped here.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import fakevision as fv
from ..schemas import FACES

_ENCODERS = {}


def _get_encoder(name: str):
    """Per-executor lazy singleton (the reference builds MTCNN/ArcFace
    once per process, api/flask_api.py:40-45).  Keyed registry so tests
    can plug alternatives."""
    if name not in _ENCODERS:
        if name == "hash":
            _ENCODERS[name] = fv.face_embedding
        else:
            raise NotImplementedError(
                f"encoder '{name}' needs model weights not present in this "
                "container; plug an ONNX session here with the same signature"
            )
    return _ENCODERS[name]


def detect_embed_faces(
    media: DataFrame, n_entities: int = 54, encoder: str = "hash"
) -> DataFrame:
    """(doc_id, frame_no, ts_ms, media_ref) -> FACES rows.

    One Python stage; everything inside is numpy over the whole batch.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        embed = _get_encoder(encoder)
        for pdf in batches:
            out_doc, out_frame, out_ts, out_idx, out_emb = [], [], [], [], []
            for doc_id, frame_no, ts_ms in zip(
                pdf["doc_id"], pdf["frame_no"], pdf["ts_ms"]
            ):
                faces = fv.frame_faces(doc_id, int(frame_no), n_entities)
                if not faces:
                    out_doc.append(doc_id)
                    out_frame.append(frame_no)
                    out_ts.append(ts_ms)
                    out_idx.append(None)
                    out_emb.append(None)
                    continue
                for j, (kind, ent) in enumerate(faces):
                    out_doc.append(doc_id)
                    out_frame.append(frame_no)
                    out_ts.append(ts_ms)
                    out_idx.append(j)
                    out_emb.append(
                        embed(doc_id, int(frame_no), j, kind, ent, n_entities)
                        .astype(np.float32)
                        .tolist()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_no": pd.array(out_frame, dtype="int32"),
                    "ts_ms": pd.array(out_ts, dtype="float64"),
                    "face_idx": pd.array(out_idx, dtype="Int32"),
                    "embedding": out_emb,
                }
            )

    return media.select("doc_id", "frame_no", "ts_ms").mapInPandas(
        fn, schema=FACES
    )


def detect_embed_link(
    media: DataFrame,
    gallery_arrays,
    distance_threshold: float = 0.6,
    n_entities: int = 54,
    encoder: str = "hash",
    matcher: str = "bruteforce",
) -> DataFrame:
    """FUSED vision + linking in one Python stage: decode, embed
    (vectorized batch), and match against the broadcast gallery —
    embeddings never cross the Arrow boundary (SURVEY.md §4.5:
    collapsing adjacent mapInPandas stages beats a custom Catalyst
    rule).  Output rows carry only the label.

    ``matcher`` picks the in-batch match kernel against the broadcast:
    * 'bruteforce' — one BLAS matmul vs the whole gallery matrix;
      ``gallery_arrays`` is an sc.broadcast of
      linking._gallery_arrays output.
    * 'lsh' — LSH band buckets prune candidates, one BLAS matmul per
      occupied bucket (the north_star join, fully fused);
      ``gallery_arrays`` is an sc.broadcast of
      linking.lsh_gallery_payload output.
    * 'hnsw' — per-executor HNSW graph (the reference's nmslib
      default, approximate_k_nearest_neighbors.py:37-62), built lazily
      once per Python worker from an sc.broadcast of
      linking._gallery_arrays output.

    Semantically identical to detect_embed_faces |> link_bruteforce /
    link_lsh_fused (parity-tested); use the two-stage ops when the
    embeddings themselves are wanted downstream.
    """
    if encoder != "hash":
        _get_encoder(encoder)  # raises the explicit stub error

    from pyspark.sql.types import (
        DoubleType, IntegerType, StringType, StructField, StructType,
    )

    out_schema = StructType([
        StructField("doc_id", StringType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("ts_ms", DoubleType(), False),
        StructField("face_idx", IntegerType(), True),
        StructField("label", StringType(), True),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if matcher == "bruteforce":
            labels, mat, norms = gallery_arrays.value
            matn = (mat / norms[:, None]).T  # (512, G), pre-normalized
        elif matcher == "lsh":
            from .linking import lsh_score_batch
        elif matcher == "hnsw":
            from .hnsw import executor_index, hnsw_score_batch
            h_labels, h_idx = executor_index(gallery_arrays)
        else:
            raise ValueError(matcher)
        rl_cache: dict[str, int] = {}
        for pdf in batches:
            docs_in = pdf["doc_id"].to_numpy()
            fnos = pdf["frame_no"].to_numpy()
            tss = pdf["ts_ms"].to_numpy()
            nrow = len(docs_in)
            if nrow == 0:
                continue
            # per-frame face sets: one cached lookup per frame (the md5
            # draws happen once per RUN via fv.run_faces), then all row
            # replication is numpy repeat — no per-row list appends
            face_lists = []
            counts = np.empty(nrow, dtype=np.int64)
            for i in range(nrow):
                d = docs_in[i]
                rl = rl_cache.get(d)
                if rl is None:
                    rl = fv.run_length(d)
                    rl_cache[d] = rl
                fl = fv.run_faces(d, int(fnos[i]) // rl, n_entities)
                face_lists.append(fl)
                counts[i] = len(fl)
            out_counts = np.maximum(counts, 1)  # empty frame -> sentinel row
            total = int(out_counts.sum())
            rep = np.repeat(np.arange(nrow), out_counts)
            offs = np.cumsum(out_counts) - out_counts
            within = np.arange(total, dtype=np.int64) - np.repeat(
                offs, out_counts
            )
            has_face = np.repeat(counts > 0, out_counts)
            # seeds/entities per face row: md5 per (doc, frame, face) is
            # the irreducible per-face work (the encoder key)
            seeds = np.zeros(total, dtype=np.uint64)
            ents = np.full(total, -2, dtype=np.int64)
            pos = 0
            for i in range(nrow):
                fl = face_lists[i]
                if not fl:
                    pos += 1
                    continue
                d = docs_in[i]
                f = int(fnos[i])
                for j, (kind, ent) in enumerate(fl):
                    seeds[pos] = fv.face_seed(d, f, j)
                    ents[pos] = -1 if kind == "unknown" else ent
                    pos += 1
            out_labels = np.full(total, None, dtype=object)
            if has_face.any():
                emb = fv.embed_faces_batch(
                    seeds[has_face], ents[has_face], n_entities
                )
                if matcher == "bruteforce":
                    qn = np.linalg.norm(emb, axis=1, keepdims=True)
                    d = 1.0 - (emb / qn) @ matn  # (B, G) cosine dists
                    best = np.argmin(d, axis=1)
                    bestd = d[np.arange(len(best)), best]
                    out_labels[has_face] = np.where(
                        bestd < distance_threshold, labels[best], "unknown"
                    )
                elif matcher == "lsh":
                    lab, _ = lsh_score_batch(
                        emb, gallery_arrays.value, distance_threshold
                    )
                    out_labels[has_face] = lab
                else:
                    lab, _ = hnsw_score_batch(
                        emb, h_labels, h_idx, distance_threshold
                    )
                    out_labels[has_face] = lab
            yield pd.DataFrame({
                "doc_id": pd.Series(docs_in[rep], dtype=object),
                "frame_no": pd.array(fnos[rep], dtype="int32"),
                "ts_ms": pd.array(tss[rep], dtype="float64"),
                "face_idx": pd.arrays.IntegerArray(
                    within.astype(np.int32), mask=~has_face
                ),
                "label": pd.Series(out_labels, dtype=object),
            })

    return media.select("doc_id", "frame_no", "ts_ms").mapInPandas(
        fn, schema=out_schema
    )
