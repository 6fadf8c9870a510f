"""kmeans (operators/cluster.py): agreement with a sequential numpy
mirror, partitioning invariance on integer-valued input, and the
empty-cluster carry-over rule."""

import hashlib

import pytest

from face_hunter_spark.operators.cluster import kmeans


def np_kmeans(ids, X, k, n_iter):
    """Sequential mirror with the operator's exact semantics:
    md5-ordered init, left-to-right fold distances, ties -> lowest
    cluster, empty clusters keep their previous centroid."""
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )
    cents = [[float(v) for v in X[i]] for i in order[:k]]
    dim = len(cents[0])

    def dist(x, c):
        acc = 0.0
        for a, b in zip(x, c):
            acc += (float(a) - b) * (float(a) - b)
        return acc

    def assign():
        return [
            min(range(k), key=lambda j: (dist(x, cents[j]), j)) for x in X
        ]

    for _ in range(n_iter):
        a = assign()
        for j in range(k):
            members = [X[i] for i in range(len(X)) if a[i] == j]
            if members:
                n = float(len(members))
                cents[j] = [
                    sum(float(m[d]) for m in members) / n for d in range(dim)
                ]
    return assign(), cents


BLOBS = [
    # three integer blobs in 4-D
    *[(i, [0 + i % 2, 1, 0, 0]) for i in range(10)],
    *[(i + 10, [50, 50 + i % 3, 49, 50]) for i in range(10)],
    *[(i + 20, [-40, -40, -41 + i % 2, -40]) for i in range(10)],
]


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(v) for v in x]) for i, x in rows],
        "id bigint, vec array<double>",
    )


def test_kmeans_matches_numpy_mirror(spark):
    assigned, cents = kmeans(
        _df(spark, BLOBS), vec_col="vec", id_col="id", k=3, n_iter=3
    )
    got = {r.id: r.cluster for r in assigned.collect()}
    ids = [i for i, _ in BLOBS]
    X = [x for _, x in BLOBS]
    want_assign, want_cents = np_kmeans(ids, X, 3, 3)
    assert got == dict(zip(ids, want_assign))
    assert cents == want_cents  # exact: integer sums, same division
    # blob purity: each blob maps to one cluster, clusters distinct
    blobs = [set(got[i] for i in range(10)),
             set(got[i] for i in range(10, 20)),
             set(got[i] for i in range(20, 30))]
    assert all(len(b) == 1 for b in blobs)
    assert len(set().union(*blobs)) == 3


def test_kmeans_partitioning_invariant(spark):
    """Integer-valued input => exact partial sums => bit-identical
    centroids and assignments under any partitioning."""
    base = _df(spark, BLOBS)
    a1, c1 = kmeans(base.coalesce(1), vec_col="vec", id_col="id",
                    k=3, n_iter=3)
    a7, c7 = kmeans(base.repartition(7), vec_col="vec", id_col="id",
                    k=3, n_iter=3)
    assert c1 == c7
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a7.collect()))


def test_kmeans_empty_cluster_carryover(spark):
    """Two distinct points, k=3: one init centroid is a duplicate and
    (ties -> lowest index) never wins a row; it must keep its initial
    centroid instead of NaN-ing out."""
    rows = [(i, [0, 0]) for i in range(5)] + [(i + 5, [9, 9]) for i in range(5)]
    assigned, cents = kmeans(
        _df(spark, rows), vec_col="vec", id_col="id", k=3, n_iter=2
    )
    got = {r.id: r.cluster for r in assigned.collect()}
    want_assign, want_cents = np_kmeans(
        [i for i, _ in rows], [x for _, x in rows], 3, 2
    )
    assert got == dict(zip([i for i, _ in rows], want_assign))
    assert cents == want_cents
    assert all(c == c for cent in cents for c in cent)  # no NaN


def test_kmeans_rejects_bad_args(spark):
    with pytest.raises(ValueError):
        kmeans(_df(spark, BLOBS), k=0)
