"""semantic_dedup (operators/dedup.py) — SemDeDup semantics on a
hand-built embedding set: within-cluster drops, min-id survivor rule,
partitioning invariance of the integer math."""

from face_hunter_spark.operators.dedup import semantic_dedup


def _df(spark, rows, parts=1):
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    )
    return df.repartition(parts) if parts > 1 else df


ROWS = [
    # two tight groups far apart + one isolated vector
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 0 -> dropped
    (2, [0.98, 0.02, 0.0, 0.0]),   # near-dup of 0/1 -> dropped
    (3, [0.0, 1.0, 0.0, 0.0]),
    (4, [0.0, 0.99, 0.01, 0.0]),   # near-dup of 3 -> dropped
    (5, [0.0, 0.0, 0.0, -1.0]),    # isolated (negative dot vs others)
]


def test_drops_larger_ids_within_threshold(spark):
    out = semantic_dedup(
        _df(spark, ROWS), k=3, n_iter=3, tau_num=9, tau_den=10
    )
    got = sorted((r.id, r.cluster) for r in out.collect())
    assert [i for i, _ in got] == [0, 3, 5]


def test_threshold_boundary_keeps_dissimilar(spark):
    # tau = 1: only exact-direction duplicates drop; the jittered
    # quantized vectors are not exactly parallel, so all survive
    out = semantic_dedup(
        _df(spark, ROWS), k=3, n_iter=3, tau_num=1, tau_den=1
    )
    assert out.count() == len(ROWS)


def test_partitioning_invariance(spark):
    a = sorted(
        (r.id, r.cluster)
        for r in semantic_dedup(
            _df(spark, ROWS, parts=1), k=2, n_iter=2, tau_num=9, tau_den=10
        ).collect()
    )
    b = sorted(
        (r.id, r.cluster)
        for r in semantic_dedup(
            _df(spark, ROWS, parts=5), k=2, n_iter=2, tau_num=9, tau_den=10
        ).collect()
    )
    assert a == b


def test_negative_dot_never_drops(spark):
    rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.0])]
    out = semantic_dedup(_df(spark, rows), k=1, n_iter=1,
                         tau_num=1, tau_den=2)
    assert out.count() == 2


def test_mega_cluster_cap_bounds_pair_search(spark):
    """review r5: the docs promised 10^4-10^5-row clusters but nothing
    enforced it — one degenerate cluster could quietly become an
    all-pairs join.  With max_cluster_size, a cluster over the cap is
    EXCLUDED from the pair search (its members all survive) while
    normal clusters still dedup; None restores the uncapped result."""
    # k=1 -> everything lands in one "mega" cluster of 6 > cap 5
    capped = semantic_dedup(
        _df(spark, ROWS), k=1, n_iter=2, tau_num=9, tau_den=10,
        max_cluster_size=5,
    )
    assert sorted(r.id for r in capped.collect()) == [0, 1, 2, 3, 4, 5]
    # uncapped (explicit None) drops the near-dups as before
    full = semantic_dedup(
        _df(spark, ROWS), k=1, n_iter=2, tau_num=9, tau_den=10,
        max_cluster_size=None,
    )
    assert sorted(r.id for r in full.collect()) == [0, 3, 5]
    # a cap the clusters fit inside changes nothing (default-path
    # regression guard: driver-query clusters sit far under 100k)
    roomy = semantic_dedup(
        _df(spark, ROWS), k=1, n_iter=2, tau_num=9, tau_den=10,
        max_cluster_size=100,
    )
    assert sorted(r.id for r in roomy.collect()) == [0, 3, 5]
