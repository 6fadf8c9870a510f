"""Quirk-faithful scene kernel as a stateful STREAMING operator
(VERDICT r3 'Next round' #8): side-by-side with the batch kernel on a
shared input, emissions must match exactly — including the reference's
cardinality-only close check, backdated ends, positional empty-frame
sentinels, and the final-frame drop quirk (mapped to the stale-doc
event-time timeout)."""

import numpy as np
import pandas as pd
import pytest

from face_hunter_spark import fakevision as fv, streaming
from face_hunter_spark.operators.scenes import extract_scenes_kernel

B = 1_000_000.0  # base event time, ms (rows at watermark 0 drop as late)


def _label_seq(doc: str, n: int) -> list[list[str]]:
    """Deterministic quirk-hostile sequence: multi-entity frames,
    empties, 'unknown' noise, cardinality flips."""
    alphabet = ["A", "B", "C"]
    seq = []
    for f in range(n):
        h = fv._h(f"sk/{doc}/{f}")
        kind = h % 8
        if kind == 0:
            seq.append([])                       # empty frame sentinel
        elif kind == 1:
            seq.append(["unknown"])              # cleans to sentinel
        elif kind in (2, 3):
            a = alphabet[(h >> 4) % 3]
            seq.append([a, "unknown"])           # cleans to 1 entity
        elif kind in (4, 5, 6):
            a = alphabet[(h >> 4) % 3]
            seq.append([a])
        else:
            a = alphabet[(h >> 4) % 3]
            b = alphabet[((h >> 8) % 2 + 1 + (h >> 4) % 3) % 3]
            seq.append(sorted({a, b}))           # 1-2 entities
    return seq


@pytest.mark.slow
def test_streaming_kernel_matches_batch(spark, tmp_path):
    docs = {f"d{i}": _label_seq(f"d{i}", 24) for i in range(4)}

    # batch truth: the quirk-faithful kernel over each full sequence
    expected = set()
    for doc_id, seq in docs.items():
        ts = [B + 1000.0 * f for f in range(len(seq))]
        for idx, (names, s, e) in enumerate(
            extract_scenes_kernel(seq, ts, frame_threshold=3)
        ):
            expected.add((doc_id, idx, ",".join(names), s, e))
    assert expected  # the corpus really produces scenes

    # stream the SAME frames in three arbitrary micro-batch splits
    src = str(tmp_path / "frames")
    schema = "doc_id string, frame_no int, ts_ms double, labels array<string>"

    def write(rows):
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "frame_no", "ts_ms", "labels"]
        )
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def rows_for(span):
        out = []
        for doc_id, seq in docs.items():
            for f in span:
                if f < len(seq):
                    out.append((doc_id, f, B + 1000.0 * f, seq[f]))
        return out

    write(rows_for(range(0, 7)))
    q = (
        streaming.streaming_scene_kernel(
            spark.readStream.schema(schema).parquet(src),
            frame_threshold=3,
        )
        .writeStream.format("memory").queryName("scene_kernel")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        write(rows_for(range(7, 15)))
        q.processAllAvailable()
        # last frames + a far-future doc that advances the watermark
        write(rows_for(range(15, 24))
              + [("wm", 0, B + 10_000_000.0, ["Z"])])
        q.processAllAvailable()
        # one more batch runs the event-time timeouts -> every test
        # doc flushes its final-frame close
        write([("wm", 1, B + 10_001_000.0, ["Z"])])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.doc_id, r.scene_idx, r.entities, r.start_ms, r.end_ms)
        for r in spark.sql("select * from scene_kernel").collect()
        if r.doc_id != "wm"
    }
    assert got == expected


@pytest.mark.slow
def test_streaming_kernel_final_frame_drop_quirk(spark, tmp_path):
    """A scene (re)opened ON a doc's final frame is dropped — the batch
    kernel's end-of-loop quirk, reproduced by the timeout path.
    Verified against the kernel directly:
      d0 = A,A,A,(B,C)x3   -> only the A scene (B,C opens at the final
                              frame and is dropped)
      d1 = A,A,A,(B,C)x4   -> A scene AND the B,C scene (one extra
                              frame, so it opened before the end)."""
    seqs = {
        "d0": [["A"]] * 3 + [["B", "C"]] * 3,
        "d1": [["A"]] * 3 + [["B", "C"]] * 4,
    }
    expected = set()
    for doc_id, seq in seqs.items():
        ts = [B + 1000.0 * f for f in range(len(seq))]
        for i, (n, s, e) in enumerate(
            extract_scenes_kernel(seq, ts, frame_threshold=3)
        ):
            expected.add((doc_id, i, ",".join(n), s, e))
    assert ("d0", 0, "A", B, B + 3000.0) in expected
    assert not any(r[0] == "d0" and r[2] == "B,C" for r in expected)
    assert ("d1", 1, "B,C", B + 3000.0, B + 6000.0) in expected

    src = str(tmp_path / "frames")
    schema = "doc_id string, frame_no int, ts_ms double, labels array<string>"

    def write(rows):
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "frame_no", "ts_ms", "labels"]
        )
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write([(d, f, B + 1000.0 * f, seq[f])
           for d, seq in seqs.items() for f in range(len(seq))])
    q = (
        streaming.streaming_scene_kernel(
            spark.readStream.schema(schema).parquet(src),
            frame_threshold=3,
        )
        .writeStream.format("memory").queryName("scene_kernel2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        write([("wm", 0, B + 10_000_000.0, ["Z"])])
        q.processAllAvailable()
        write([("wm", 1, B + 10_001_000.0, ["Z"])])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.doc_id, r.scene_idx, r.entities, r.start_ms, r.end_ms)
        for r in spark.sql("select * from scene_kernel2").collect()
        if r.doc_id != "wm"
    }
    assert got == expected
