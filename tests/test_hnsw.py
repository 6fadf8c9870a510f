"""Pure-numpy HNSW matcher: recall vs exact brute force, determinism,
and end-to-end linking parity through the fused vision stage (the
reference's default 'appr' algorithm path,
approximate_k_nearest_neighbors.py:37-88)."""

import numpy as np
import pytest

from face_hunter_spark import synth
from face_hunter_spark.operators import linking
from face_hunter_spark.operators.hnsw import HNSWIndex, hnsw_score_batch


@pytest.fixture(scope="module")
def gallery():
    gal = synth.make_gallery_pdf(n_entities=12, thumbs_per_entity=6,
                                 distractors=2)
    return linking._gallery_arrays(gal)


def test_hnsw_recall_vs_bruteforce(gallery):
    labels, mat, norms = gallery
    idx = HNSWIndex(mat)
    rng = np.random.default_rng(7)
    pick = rng.integers(0, len(mat), 200)
    q = (mat[pick] + rng.standard_normal((200, mat.shape[1])).astype(
        np.float32) * 0.04)
    qn = np.linalg.norm(q, axis=1)
    d = 1.0 - (q / qn[:, None]) @ (mat / norms[:, None]).T
    brute = np.argmin(d, axis=1)
    ids, _ = idx.search_batch(q, k=1)
    # HNSW top-1 must agree with exact top-1 on nearly every query
    agree = (ids[:, 0] == brute).mean()
    assert agree >= 0.95, agree


def test_hnsw_random_data_recall():
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((500, 64)).astype(np.float32)
    idx = HNSWIndex(mat)
    q = rng.standard_normal((100, 64)).astype(np.float32)
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    d = 1.0 - (q / qn) @ mn.T
    exact_top3 = np.argsort(d, axis=1, kind="stable")[:, :3]
    ids, _ = idx.search_batch(q, k=3)
    hits = sum(
        len(set(ids[i]) & set(exact_top3[i])) for i in range(len(q))
    )
    assert hits / (3 * len(q)) >= 0.85


def test_hnsw_deterministic(gallery):
    labels, mat, _ = gallery
    q = mat[:20] * 1.01
    a = HNSWIndex(mat).search_batch(q, k=3)
    b = HNSWIndex(mat).search_batch(q, k=3)
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1])


def test_hnsw_score_batch_semantics(gallery):
    labels, mat, norms = gallery
    idx = HNSWIndex(mat)
    rng = np.random.default_rng(5)
    pick = rng.integers(0, len(mat), 100)
    q_match = mat[pick] + rng.standard_normal((100, mat.shape[1])).astype(
        np.float32) * 0.04
    q_noise = rng.standard_normal((30, mat.shape[1])).astype(np.float32)
    q = np.vstack([q_match, q_noise])
    lab, dist = hnsw_score_batch(q, labels, idx, 0.6)
    assert (lab[:100] == labels[pick]).mean() >= 0.95
    assert all(x == "unknown" for x in lab[100:])
    assert np.isnan(dist[100:]).all()


def test_hnsw_pipeline_strategy_parity(spark):
    """link_documents(strategy='hnsw') emits the same triples as the
    brute-force strategy on well-separated synthetic data."""
    import pyspark.sql.functions as F

    from face_hunter_spark.pipeline import link_documents
    from face_hunter_spark.schemas import ENTITY_CATALOG

    docs = synth.documents_df(spark, 15, 10)
    gal = synth.make_gallery_pdf(n_entities=10, thumbs_per_entity=5,
                                 distractors=2)
    cat = spark.createDataFrame(
        synth.make_entity_catalog_pdf(n_entities=10, distractors=2),
        ENTITY_CATALOG,
    )

    def tset(strategy):
        df = link_documents(docs, gal, cat, n_entities=10,
                            strategy=strategy)
        return {(r.subj, r.pred, r.obj)
                for r in df.select("subj", "pred", "obj").collect()}

    hnsw = tset("hnsw")
    brute = tset("bruteforce")
    inter = len(hnsw & brute)
    # P/R >= 0.95 (the BASELINE gate) — usually exactly equal on this
    # clean corpus
    assert inter / len(hnsw) >= 0.95
    assert inter / len(brute) >= 0.95


def test_prebuilt_payload_roundtrip(gallery):
    """to_payload/from_payload (the reference's saveIndex/loadIndex
    analogue): the reconstructed index answers every query identically
    to the original — the broadcast-prebuilt path for big galleries."""
    labels, mat, _ = gallery
    idx = HNSWIndex(mat)
    idx2 = HNSWIndex.from_payload(idx.to_payload())
    rng = np.random.default_rng(9)
    q = mat[rng.integers(0, len(mat), 50)] + rng.standard_normal(
        (50, mat.shape[1])).astype(np.float32) * 0.04
    a = idx.search_batch(q, k=3)
    b = idx2.search_batch(q, k=3)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
    la, da = hnsw_score_batch(q, labels, idx2, 0.6)
    lb, db = hnsw_score_batch(q, labels, idx, 0.6)
    assert list(la) == list(lb)


def test_hnsw_prebuilt_pipeline_parity(spark):
    """strategy='hnsw' with hnsw_prebuilt=True (driver-built broadcast
    graph, the loadIndex analogue) emits exactly the worker-built
    strategy's triples."""
    from face_hunter_spark.pipeline import link_documents
    from face_hunter_spark.schemas import ENTITY_CATALOG

    docs = synth.documents_df(spark, 10, 8)
    gal = synth.make_gallery_pdf(n_entities=8, thumbs_per_entity=5,
                                 distractors=2)
    cat = spark.createDataFrame(
        synth.make_entity_catalog_pdf(n_entities=8, distractors=2),
        ENTITY_CATALOG,
    )

    def tset(**kw):
        df = link_documents(docs, gal, cat, n_entities=8,
                            strategy="hnsw", **kw)
        return {(r.subj, r.pred, r.obj)
                for r in df.select("subj", "pred", "obj").collect()}

    assert tset(hnsw_prebuilt=True) == tset()


def test_gallery_fingerprint_full_content(gallery):
    """The cache key must see EVERY row and EVERY label — a strided
    sample let a gallery differing only in unsampled rows or interior
    labels collide with the stale cached graph (ADVICE r3)."""
    from face_hunter_spark.operators.hnsw import _gallery_fingerprint

    labels, mat, _ = gallery
    labels = list(labels)
    base = _gallery_fingerprint(labels, mat)
    assert base == _gallery_fingerprint(labels, mat.copy())
    # interior embedding perturbation (a row a 64-stride sample skips)
    m2 = mat.copy()
    m2[len(m2) // 2 + 1, 0] += 1e-3
    assert _gallery_fingerprint(labels, m2) != base
    # interior label remap with unchanged embeddings
    l2 = list(labels)
    l2[len(l2) // 2 + 1] = "someone_else"
    assert _gallery_fingerprint(l2, mat.copy()) != base


def test_prebuilt_payload_ships_fingerprint(gallery):
    from face_hunter_spark.operators import hnsw

    payload = hnsw.prebuilt_gallery_payload(gallery)
    assert payload["fingerprint"] == hnsw._gallery_fingerprint(
        payload["labels"], payload["index"]["mat"])
