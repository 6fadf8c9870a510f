"""Entity linking: face embedding -> gallery label, two physical
strategies behind one logical operator (the reference's '1nn' vs
'appr' switch, hunter.py:93).

* ``link_bruteforce`` — exact 1-NN cosine against the whole gallery
  (face_recognition.py:300-314 semantics: dist = 1 - cos, argmin,
  threshold else 'unknown', ties -> lowest gallery index).  Physical
  form: the gallery (1,220 x 512 floats ≈ 2.5 MB) is an sc.broadcast;
  a pandas UDF does ONE BLAS matmul per Arrow batch.  At 10^12 docs
  this is the *better* plan while the gallery is small: zero shuffle,
  zero candidate blow-up, embarrassingly parallel.

* ``link_lsh`` — random-hyperplane LSH bucketing (north_star's
  "LSH-bucketed approximate-kNN join"): band signatures on both sides,
  equi-join on (band, bucket) against the broadcast gallery buckets,
  exact cosine within candidates, top-k window prune, majority vote.
  This is the scale path for LARGE galleries (millions of reference
  faces) where a broadcast matmul no longer fits: the join stays a
  broadcast-hash-join while gallery buckets fit in memory, and
  degrades to a shuffled equi-join on bucket keys beyond that —
  bounded shuffle because each mention lands in exactly `bands`
  buckets.  Replaces the reference's per-process HNSW index
  (approximate_k_nearest_neighbors.py:47-62).

The majority vote implements the reference's *intended* semantics
(count votes among thresholded neighbors, ties -> nearest neighbor
first), fixing quirk §2.12.3 (the reference always votes the first
neighbor); identical behavior at the default k=1.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

UNKNOWN = "unknown"

_LINK_RESULT = StructType(
    [
        StructField("label", StringType(), False),
        StructField("distance", FloatType(), False),
    ]
)


def _gallery_arrays(gallery_pdf: pd.DataFrame):
    """(labels, matrix, row_norms) sorted by gallery_id — argmin ties
    then resolve to the lowest gallery index, like np.argmin over the
    reference's list order."""
    g = gallery_pdf.sort_values("gallery_id")
    labels = g["label"].to_numpy()
    mat = np.vstack([np.asarray(e, dtype=np.float32) for e in g["embedding"]])
    norms = np.linalg.norm(mat, axis=1)
    return labels, mat, norms


def link_bruteforce(
    faces: DataFrame,
    gallery_pdf: pd.DataFrame,
    distance_threshold: float = 0.6,
) -> DataFrame:
    """FACES -> + (label, distance).  face_idx NULL rows (empty frames)
    pass through with label NULL so frame assembly keeps the frame."""
    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast(_gallery_arrays(gallery_pdf))

    schema = StructType(
        faces.schema.fields
        + [StructField("label", StringType(), True),
           StructField("distance", FloatType(), True)]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        labels, mat, norms = bc.value
        for pdf in batches:
            lab = np.full(len(pdf), None, dtype=object)
            dist = np.full(len(pdf), np.nan, dtype=np.float32)
            mask = pdf["embedding"].notna().to_numpy()
            if mask.any():
                q = np.vstack(
                    [np.asarray(e, dtype=np.float32) for e in pdf["embedding"][mask]]
                )
                qn = np.linalg.norm(q, axis=1)
                # one BLAS call per batch: (B x 512) @ (512 x G)
                cos = (q @ mat.T) / (qn[:, None] * norms[None, :])
                d = 1.0 - cos
                best = np.argmin(d, axis=1)
                bestd = d[np.arange(len(best)), best]
                chosen = np.where(
                    bestd < distance_threshold, labels[best], UNKNOWN
                )
                lab[mask] = chosen
                dist[mask] = bestd
            out = pdf.copy()
            out["label"] = lab
            out["distance"] = dist
            yield out

    return faces.mapInPandas(fn, schema=schema)


# ---------------------------------------------------------------------------
# LSH-bucketed approximate kNN join
# ---------------------------------------------------------------------------


def _hyperplanes(n_bits: int, dim: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    return rng.standard_normal((n_bits, dim)).astype(np.float32)


def lsh_signature_udf(bands: int, rows_per_band: int, dim: int = 512):
    """pandas UDF: embedding -> array of band bucket keys.  Bucket key
    packs (band_id << 24) | band_bits so a single int column joins."""
    # the packing reserves 24 low bits for band_bits; more rows per
    # band would silently collide across bands
    assert rows_per_band <= 24, "bucket packing supports rows_per_band <= 24"
    planes = _hyperplanes(bands * rows_per_band, dim)

    @F.pandas_udf(ArrayType(IntegerType()))
    def sig(emb: pd.Series) -> pd.Series:
        out = []
        mask = emb.notna()
        mat = (
            np.vstack([np.asarray(e, dtype=np.float32) for e in emb[mask]])
            if mask.any()
            else np.zeros((0, dim), np.float32)
        )
        bits = (mat @ planes.T) > 0  # (B, bands*rows)
        keys = np.zeros((bits.shape[0], bands), dtype=np.int64)
        for b in range(bands):
            chunk = bits[:, b * rows_per_band : (b + 1) * rows_per_band]
            val = np.zeros(bits.shape[0], dtype=np.int64)
            for j in range(chunk.shape[1]):
                val = (val << 1) | chunk[:, j]
            keys[:, b] = (b << 24) | val
        it = iter(keys.astype(np.int32).tolist())
        for ok in mask:
            out.append(next(it) if ok else None)
        return pd.Series(out)

    return sig


def _pair_cosine_distance(emb_col, gemb_col):
    """1 - cos(a, b) per candidate pair, one BLAS batch per Arrow
    batch (float64 accumulation, float32 result).  The pandas_udf is
    wrapped at CALL time — decorating at module import would need an
    active SparkSession before one exists."""

    def kernel(emb: pd.Series, gemb: pd.Series) -> pd.Series:
        a = np.stack(emb.to_numpy()).astype(np.float64)
        b = np.stack(gemb.to_numpy()).astype(np.float64)
        dot = np.einsum("ij,ij->i", a, b)
        norms = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        return pd.Series((1.0 - dot / norms).astype(np.float32))

    return F.pandas_udf(kernel, "float")(emb_col, gemb_col)


_BUCKET_CAND = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("ts_ms", DoubleType(), False),
        StructField("face_idx", IntegerType(), True),
        StructField("gallery_id", LongType(), False),
        StructField("g_label", StringType(), False),
        StructField("distance", FloatType(), False),
    ]
)


def _bucket_gemm_candidates(
    mention: DataFrame, gal: DataFrame, k: int
) -> DataFrame:
    """Per-bucket candidate generation as one GEMM per bucket group
    (cogroup on the band bucket): distances for every mention x
    gallery pair sharing the bucket computed in a single numpy matmul
    (float64, float32 result — same rounding as the pairwise kernel),
    cut to each mention's in-bucket top-k by (distance, gallery_id)
    before anything ships.

    Scale sizing: a bucket's gallery slice must fit the kernel's
    matrix (rows x 512 floats).  Bucket count per band is
    2^rows_per_band, so raise ``rows_per_band`` as the gallery grows
    to keep slices at ~10^4-10^5 rows (24 bits = 16M buckets covers a
    10^9-row gallery at ~60 rows each); recall follows bands, cost
    follows slice size."""
    topk = max(int(k), 1)

    def kernel(m_pdf: pd.DataFrame, g_pdf: pd.DataFrame) -> pd.DataFrame:
        if m_pdf.empty or g_pdf.empty:
            return pd.DataFrame(
                columns=[f.name for f in _BUCKET_CAND.fields]
            )
        M = np.stack(m_pdf["embedding"].to_numpy()).astype(np.float64)
        G = np.stack(g_pdf["g_embedding"].to_numpy()).astype(np.float64)
        sims = M @ G.T
        dist = (
            1.0
            - sims
            / (
                np.linalg.norm(M, axis=1)[:, None]
                * np.linalg.norm(G, axis=1)[None, :]
            )
        ).astype(np.float32)
        gid = g_pdf["gallery_id"].to_numpy()
        n_keep = min(topk, dist.shape[1])
        # per-mention top-k by (distance, gallery_id) — the same order
        # the global rank window uses
        order = np.lexsort((gid[None, :].repeat(len(M), 0), dist), axis=1)
        keep = order[:, :n_keep]
        rows = {
            "doc_id": m_pdf["doc_id"].to_numpy().repeat(n_keep),
            "frame_no": m_pdf["frame_no"].to_numpy().repeat(n_keep),
            "ts_ms": m_pdf["ts_ms"].to_numpy().repeat(n_keep),
            "face_idx": m_pdf["face_idx"].to_numpy().repeat(n_keep),
            "gallery_id": gid[keep].ravel(),
            "g_label": g_pdf["g_label"].to_numpy()[keep].ravel(),
            "distance": np.take_along_axis(dist, keep, 1).ravel(),
        }
        return pd.DataFrame(rows)

    return (
        mention.groupBy("bucket")
        .cogroup(gal.groupBy("bucket"))
        .applyInPandas(kernel, _BUCKET_CAND)
    )


def link_lsh(
    faces: DataFrame,
    gallery: DataFrame,
    distance_threshold: float = 0.6,
    k: int = 1,
    bands: int = 8,
    rows_per_band: int = 6,
    broadcast_gallery: bool = True,
) -> DataFrame:
    """Approximate kNN entity linking as a relational plan:

    mentions --sig--> explode(band buckets) --join(bucket)--> gallery
    buckets --cosine--> window top-k --vote--> label.

    The per-pair cosine runs in an Arrow-vectorized pandas UDF (one
    BLAS batch per Arrow batch) — the earlier interpreted
    zip_with/aggregate form evaluated a 512-element fold per candidate
    pair Catalyst-side and dominated the route's wall time.  The only
    other Python stage is the signature matmul.

    ``broadcast_gallery=True`` (default) hints the exploded gallery
    side for a broadcast hash join — right while the gallery fits an
    executor.  ``False`` is the BEYOND-broadcast form: a plain bucket
    equi-join, so Catalyst/AQE picks a shuffled hash join partitioned
    on the band bucket — both sides stream, nothing is collected or
    replicated, and a 10^8-row gallery costs one bounded shuffle of
    (bucket, id, embedding) rows.  pipeline.link_documents flips this
    automatically past its broadcast budget.
    """
    sig = lsh_signature_udf(bands, rows_per_band)

    # `faces` feeds BOTH the candidate side and the final left join —
    # without a lineage cut the whole upstream decode+detect+embed
    # Python stage executes twice in one job (measured 2x wall on the
    # shuffle route).  Materializing the face rows once is strictly
    # cheaper than recomputing the vision kernel at any scale.
    faces = faces.localCheckpoint(eager=False)

    mention = faces.where(F.col("face_idx").isNotNull()).select(
        "doc_id",
        "frame_no",
        "ts_ms",
        "face_idx",
        "embedding",
        F.explode(sig("embedding")).alias("bucket"),
    )
    gal = gallery.select(
        "gallery_id",
        F.col("label").alias("g_label"),
        F.col("embedding").alias("g_embedding"),
        F.explode(sig("embedding")).alias("bucket"),
    )

    if broadcast_gallery:
        # small-gallery form: broadcast hash join on the bucket, then
        # one Arrow-vectorized per-pair distance (float64 einsum per
        # batch, float32 result) — kept as the reference shape the
        # shuffle form is equality-tested against
        cand = (
            mention.join(F.broadcast(gal), "bucket")
            .withColumn(
                "distance",
                _pair_cosine_distance("embedding", "g_embedding"),
            )
            .select(
                "doc_id", "frame_no", "ts_ms", "face_idx",
                "gallery_id", "g_label", "distance",
            )
        )
    else:
        # BEYOND-broadcast form: cogroup both sides by bucket and run
        # ONE numpy GEMM per bucket instead of materializing the
        # mention x gallery-bucket pair rows (each carrying two
        # 512-float arrays) — embeddings cross the wire once per band
        # and only (face key, gallery_id, distance) scalars leave the
        # stage.  The kernel also cuts to the per-bucket top-k by
        # (distance, gallery_id): a pair in the GLOBAL top-k of its
        # face ranks at least as high inside every bucket containing
        # it, so the union of per-bucket top-ks is a superset of the
        # global top-k — the later window prune still sees everything
        # it needs while per-bucket losers never ship.
        cand = _bucket_gemm_candidates(mention, gal, k)
    # ONE shuffle clusters the scalar candidate rows by face: hash
    # partitioning on (doc_id, frame_no, face_idx) satisfies every
    # downstream requirement — the cross-bucket pair dedup (its group
    # key is a superset), both rank windows, and the vote aggregate
    cand = (
        cand.repartition("doc_id", "frame_no", "face_idx")
        .dropDuplicates(["doc_id", "frame_no", "face_idx", "gallery_id"])
    )

    w = Window.partitionBy("doc_id", "frame_no", "face_idx").orderBy(
        "distance", "gallery_id"
    )
    topk = cand.withColumn("nn_rank", F.row_number().over(w)).where(
        F.col("nn_rank") <= k
    )

    # majority vote among thresholded neighbors; ties -> nearest first
    votes = (
        topk.where(F.col("distance") < distance_threshold)
        .groupBy("doc_id", "frame_no", "ts_ms", "face_idx", "g_label")
        .agg(F.count(F.lit(1)).alias("n_votes"), F.min("nn_rank").alias("best_rank"))
    )
    wv = Window.partitionBy("doc_id", "frame_no", "face_idx").orderBy(
        F.desc("n_votes"), "best_rank"
    )
    voted = (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select(
            "doc_id", "frame_no", "ts_ms", "face_idx",
            F.col("g_label").alias("label"),
        )
    )

    # faces with no surviving candidate -> 'unknown'; empty frames pass
    # through with NULL label (same contract as link_bruteforce)
    base = faces.select("doc_id", "frame_no", "ts_ms", "face_idx")
    return (
        base.join(voted, ["doc_id", "frame_no", "ts_ms", "face_idx"], "left")
        .withColumn(
            "label",
            F.when(F.col("face_idx").isNull(), F.lit(None)).otherwise(
                F.coalesce("label", F.lit(UNKNOWN))
            ),
        )
    )


def assemble_frame_predictions(linked: DataFrame) -> DataFrame:
    """Face rows -> per-frame ordered label lists (the reference's
    list[list[str]] IR, face_recognition.py:134-136).  Order within a
    frame = detector output order (face_idx); empty frames produce [].
    Map-side combine applies (collect_list over pre-sorted structs)."""
    return (
        linked.groupBy("doc_id", "frame_no", "ts_ms")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("face_idx").isNotNull(),
                        F.struct("face_idx", "label"),
                    )
                )
            ).alias("ordered")
        )
        .select(
            "doc_id",
            "frame_no",
            "ts_ms",
            F.transform("ordered", lambda s: s["label"]).alias("labels"),
        )
    )


def link_lsh_fused(
    faces: DataFrame,
    gallery_pdf: pd.DataFrame,
    distance_threshold: float = 0.6,
    k: int = 1,
    bands: int = 8,
    rows_per_band: int = 6,
) -> DataFrame:
    """LSH-bucketed approximate kNN against a BROADCAST gallery as one
    fused vectorized stage (the north_star's join, in the physical form
    that wins while the gallery broadcasts): the gallery's band buckets
    are built once on the driver (G x planes matmul — tiny), shipped
    with the matrix; each Arrow batch then computes mention signatures
    with one matmul, gathers each face's candidate gallery rows from
    the bucket dict, and scores ONLY candidates with one flattened
    einsum.  No candidate join, no embedding shuffle, no per-pair HOF
    arithmetic — compare ``link_lsh``, the relational form kept for
    galleries beyond broadcast, whose candidate pairs must flow through
    an exchange (measured 13x slower at bench scale precisely because
    512-d arrays crossed a shuffle and cosines ran as interpreted
    expressions).

    Semantics match ``link_lsh``: candidates = union of the face's
    band buckets; top-k by distance; majority vote among thresholded
    neighbors, ties -> nearest, then lowest gallery index; no
    surviving candidate -> 'unknown'; empty frames pass through NULL.
    """
    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast(
        lsh_gallery_payload(gallery_pdf, bands, rows_per_band)
    )

    schema = StructType(
        faces.schema.fields
        + [StructField("label", StringType(), True),
           StructField("distance", FloatType(), True)]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lab = np.full(len(pdf), None, dtype=object)
            dist = np.full(len(pdf), np.nan, dtype=np.float32)
            mask = pdf["embedding"].notna().to_numpy()
            if mask.any():
                q = np.vstack(
                    [np.asarray(e, dtype=np.float32)
                     for e in pdf["embedding"][mask]]
                )
                out_lab, out_dist = lsh_score_batch(
                    q, bc.value, distance_threshold, k
                )
                lab[mask] = out_lab
                dist[mask] = out_dist
            out = pdf.copy()
            out["label"] = lab
            out["distance"] = dist
            yield out

    return faces.mapInPandas(fn, schema=schema)


def lsh_gallery_payload(
    gallery_pdf: pd.DataFrame, bands: int = 8, rows_per_band: int = 6
):
    """Driver-side build of the broadcastable LSH gallery: (labels,
    matrix, norms, hyperplanes, bucket->gallery-indices dict, bands,
    rows_per_band).  One tiny G x planes matmul.  The bucket index is a
    CSR triple (sorted unique bucket keys, member offsets, concatenated
    gallery indices) so the executor-side lookup is one vectorized
    searchsorted over a whole Arrow batch — no per-face dict probes."""
    return lsh_payload_from_arrays(
        *_gallery_arrays(gallery_pdf), bands=bands,
        rows_per_band=rows_per_band,
    )


def lsh_payload_from_arrays(
    labels, mat, norms, bands: int = 8, rows_per_band: int = 6
):
    """lsh_gallery_payload for callers that already hold the gallery as
    (labels, matrix, norms) arrays — e.g. a gallery synthesized in bulk
    (scripts/hnsw_crossover.py) where a row-wise pandas embedding
    column would dominate the build."""
    assert rows_per_band <= 24, "bucket packing supports rows_per_band <= 24"
    planes = _hyperplanes(bands * rows_per_band, mat.shape[1])
    gbits = (mat @ planes.T) > 0
    all_keys = np.empty((gbits.shape[0], bands), dtype=np.int64)
    for b in range(bands):
        chunk = gbits[:, b * rows_per_band : (b + 1) * rows_per_band]
        val = np.zeros(gbits.shape[0], dtype=np.int64)
        for j in range(chunk.shape[1]):
            val = (val << 1) | chunk[:, j]
        all_keys[:, b] = (b << 24) | val
    # CSR: sort (key, gallery_idx) pairs, then unique keys + offsets
    flat_keys = all_keys.T.ravel()  # band-major; gallery idx repeats per band
    g_idx = np.tile(np.arange(gbits.shape[0], dtype=np.int64), bands)
    order = np.lexsort((g_idx, flat_keys))
    sorted_keys = flat_keys[order]
    members = g_idx[order]
    uniq_keys, starts = np.unique(sorted_keys, return_index=True)
    offsets = np.append(starts, len(sorted_keys)).astype(np.int64)
    return (
        labels, mat, norms, planes,
        (uniq_keys, offsets, members),
        bands, rows_per_band,
    )


def _gather_candidates(keys: np.ndarray, csr):
    """Vectorized multi-bucket gather: (n, bands) int keys + CSR bucket
    index -> (face_of_candidate, gallery_of_candidate) flat arrays.
    One searchsorted over the whole batch; the multi-slice gather is
    the standard repeat/cumsum trick — zero Python loops.  Candidates
    are NOT dedup'd across bands (duplicates cost a few extra einsum
    rows but cannot change an argmin)."""
    uniq_keys, offsets, members = csr
    n, bands_ = keys.shape
    flat = keys.ravel()
    pos = np.searchsorted(uniq_keys, flat)
    pos_c = np.minimum(pos, len(uniq_keys) - 1)
    valid = (uniq_keys[pos_c] == flat) if len(uniq_keys) else np.zeros(
        len(flat), dtype=bool
    )
    starts = offsets[pos_c[valid]]
    lens = (offsets[pos_c[valid] + 1] - starts).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    base = np.repeat(starts, lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    flat_g = members[base + within]
    face_of_band = np.repeat(np.arange(n, dtype=np.int64), bands_)[valid]
    rep = np.repeat(face_of_band, lens)
    return rep, flat_g


def lsh_score_batch(
    q: np.ndarray, payload, distance_threshold: float, k: int = 1
):
    """Score one batch of query embeddings against the broadcast LSH
    gallery payload.  Returns (labels object array, float32 distances);
    faces with no surviving candidate get 'unknown'/NaN.  Shared by
    link_lsh_fused and the fully-fused vision stage
    (vision.detect_embed_link matcher='lsh').

    k=1 (the reference default) runs as BUCKETED GEMM: per band, sort
    faces by bucket key, then ONE BLAS matmul per occupied bucket
    (queries-in-bucket x bucket-members) with a scatter-min across
    bands.  The Python loop is bounded by the bucket space
    (bands * 2^rows_per_band), NOT the face count — a flattened
    gather/einsum over the candidate union is ~100x slower at batch
    scale because clustered galleries make candidate lists long and
    fancy-indexed row gathers dominate.  Ties resolve nearest-first
    then lowest gallery index (bucket members are stored ascending, so
    argmin's first-occurrence rule gives the in-bucket tie, and the
    scatter-min compares (distance, gallery) lexicographically).
    k>1 keeps the gather path + per-face majority vote (test/tuning
    scale only)."""
    labels, mat, norms, planes, csr, bands_, rpb = payload
    uniq_keys, offsets, members = csr
    n = len(q)
    out_lab = np.full(n, UNKNOWN, dtype=object)
    out_dist = np.full(n, np.nan, dtype=np.float32)
    if n == 0 or not len(uniq_keys):
        return out_lab, out_dist
    qn = np.linalg.norm(q, axis=1)
    bits = (q @ planes.T) > 0
    # vectorized band keys: (n, bands*rpb) bits -> (n, bands) ints
    weights = (1 << np.arange(rpb - 1, -1, -1)).astype(np.int64)
    band_ids = (np.arange(bands_, dtype=np.int64) << 24).reshape(1, -1)
    keys = bits.reshape(n, bands_, rpb).astype(np.int64) @ weights
    keys = keys | band_ids
    if k == 1:
        qnorm = (q / qn[:, None]).astype(np.float32)
        matn = (mat / norms[:, None]).astype(np.float32)
        best_d = np.full(n, np.inf)
        best_g = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        for b in range(bands_):
            kb = keys[:, b]
            order = np.argsort(kb, kind="stable")
            ks = kb[order]
            pos = np.searchsorted(uniq_keys, ks)
            pos_c = np.minimum(pos, len(uniq_keys) - 1)
            valid = uniq_keys[pos_c] == ks
            runs = np.flatnonzero(np.diff(ks, prepend=ks[0] - 1))
            for ri, start in enumerate(runs):
                if not valid[start]:
                    continue
                end = runs[ri + 1] if ri + 1 < len(runs) else n
                p = pos_c[start]
                gsub = members[offsets[p]:offsets[p + 1]]
                faces = order[start:end]
                d = 1.0 - qnorm[faces] @ matn[gsub].T  # (m, g)
                loc = np.argmin(d, axis=1)  # first occurrence = lowest g
                ld = d[np.arange(len(faces)), loc]
                lg = gsub[loc]
                upd = (ld < best_d[faces]) | (
                    (ld == best_d[faces]) & (lg < best_g[faces])
                )
                bf = faces[upd]
                best_d[bf] = ld[upd]
                best_g[bf] = lg[upd]
        keep = np.isfinite(best_d) & (best_d < distance_threshold)
        out_lab[keep] = labels[best_g[keep]]
        out_dist[keep] = best_d[keep].astype(np.float32)
        return out_lab, out_dist
    rep, flat_g = _gather_candidates(keys, csr)
    if not len(rep):
        return out_lab, out_dist
    dots = np.einsum("ij,ij->i", q[rep], mat[flat_g])
    d = 1.0 - dots / (qn[rep] * norms[flat_g])
    # k > 1: per-face top-k + majority vote (duplicates across bands
    # must not double-vote -> dedup gallery ids per face first)
    order = np.lexsort((flat_g, d, rep))
    rs, gs, ds = rep[order], flat_g[order], d[order]
    boundaries = np.flatnonzero(np.diff(rs, prepend=-1))
    for bi, start in enumerate(boundaries):
        end = boundaries[bi + 1] if bi + 1 < len(boundaries) else len(rs)
        i = rs[start]
        seen: set[int] = set()
        kept = []
        for j in range(start, end):
            if gs[j] in seen:
                continue
            seen.add(gs[j])
            if ds[j] < distance_threshold:
                kept.append(j)
            if len(seen) >= k:
                break
        if not kept:
            continue
        if len(kept) == 1:
            best = kept[0]
        else:
            votes: dict[str, int] = {}
            for j in kept:
                votes[labels[gs[j]]] = votes.get(labels[gs[j]], 0) + 1
            top = max(votes.values())
            best = next(j for j in kept if votes[labels[gs[j]]] == top)
        out_lab[i] = labels[gs[best]]
        out_dist[i] = ds[best]
    return out_lab, out_dist
