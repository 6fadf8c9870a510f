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
