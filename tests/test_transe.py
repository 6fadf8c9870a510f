"""TransE training epoch (operators/transe.py): integer-exactness,
partitioning invariance, the filtered-corruption protocol, training
signal on a plantable graph, and epoch chaining."""

import pytest

from face_hunter_spark.operators.transe import (
    init_embeddings,
    score_triples,
    transe_epoch,
)


@pytest.fixture(scope="module")
def kg(spark):
    # two "nations" with their member customers + one cross edge:
    # enough corruptions survive the filter to generate gradients
    rows = [(f"c{i}", "in", "nA") for i in range(6)] + [
        (f"c{i}", "in", "nB") for i in range(6, 12)
    ] + [("c0", "knows", "c7"), ("c3", "knows", "c9")]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _flat(df):
    return sorted(
        (r.id, tuple(r.emb)) for r in df.select("id", "emb").collect()
    )


def test_init_is_content_keyed_and_bounded(spark):
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "id string"
    )
    e1 = _flat(init_embeddings(nodes, "id", 8))
    e2 = _flat(init_embeddings(nodes.repartition(5), "id", 8))
    assert e1 == e2
    assert all(
        -3 <= x < 4 for _, emb in e1 for x in emb
    ) and all(len(emb) == 8 for _, emb in e1)


def test_epoch_partitioning_invariance(kg):
    ent1, rel1 = transe_epoch(kg.repartition(1), dim=4, k_neg=2)
    ent8, rel8 = transe_epoch(kg.repartition(8), dim=4, k_neg=2)
    assert _flat(ent1) == _flat(ent8)
    assert _flat(rel1) == _flat(rel8)
    # something actually trained: at least one embedding moved
    ent0 = init_embeddings(
        kg.selectExpr("subj as id").union(kg.selectExpr("obj")),
        "id", 4, salt="ent",
    )
    assert _flat(ent1) != _flat(ent0)
    # and everything stayed integral
    assert dict(ent1.dtypes)["emb"] == "array<bigint>"


def test_filtered_protocol_noop_graph(spark):
    # every corruption of every positive is itself a true triple, so
    # the filtered protocol leaves zero training pairs -> epoch = no-op
    full = spark.createDataFrame(
        [("a", "p", "a"), ("a", "p", "b"), ("b", "p", "a"),
         ("b", "p", "b")],
        "subj string, pred string, obj string",
    )
    ent, rel = transe_epoch(full, dim=4, k_neg=3)
    ents = full.selectExpr("subj as id").union(full.selectExpr("obj"))
    assert _flat(ent) == _flat(init_embeddings(ents, "id", 4, salt="ent"))
    assert _flat(rel) == _flat(
        init_embeddings(full.select("pred"), "pred", 4, salt="rel")
    )


def test_training_signal_and_chaining(kg):
    def hinge_loss(ent, rel, salt):
        # recompute the epoch's own pair set and its hinge loss
        import pyspark.sql.functions as F

        from face_hunter_spark.operators.negatives import negative_samples

        pos = score_triples(kg, ent, rel).withColumnRenamed(
            "score", "d_pos"
        )
        negs = negative_samples(
            kg, k=2,
            pool=kg.selectExpr("subj as id").union(kg.selectExpr("obj")),
            pool_col="id", salt=salt,
        ).select("subj", "pred", F.col("obj_neg").alias("obj")).distinct()
        dneg = score_triples(negs, ent, rel).withColumnRenamed(
            "score", "d_neg"
        ).withColumnRenamed("obj", "obj_neg")
        # pair every positive with each of its corruptions
        pairs = pos.join(dneg, ["subj", "pred"])
        return (
            pairs.selectExpr(
                "sum(greatest(0, 2 + d_pos - d_neg)) as loss"
            ).collect()[0]["loss"]
        )

    ents = kg.selectExpr("subj as id").union(kg.selectExpr("obj"))
    ent0 = init_embeddings(ents, "id", 4, salt="ent")
    rel0 = init_embeddings(kg.select("pred"), "pred", 4, salt="rel")
    before = hinge_loss(ent0, rel0, "transe-e0")
    ent1, rel1 = transe_epoch(kg, dim=4, k_neg=2, salt="transe-e0")
    after = hinge_loss(ent1, rel1, "transe-e0")
    assert after < before

    # chaining with a fresh salt keeps the contract (integer arrays,
    # deterministic) and the loss keeps falling on ITS pair set
    b2 = hinge_loss(ent1, rel1, "transe-e1")
    ent2, rel2 = transe_epoch(
        kg, dim=4, k_neg=2, ent_emb=ent1, rel_emb=rel1, salt="transe-e1"
    )
    a2 = hinge_loss(ent2, rel2, "transe-e1")
    assert a2 < b2
    assert dict(ent2.dtypes)["emb"] == "array<bigint>"


def test_score_triples_shape(kg):
    ent, rel = transe_epoch(kg, dim=4, k_neg=1)
    s = score_triples(kg, ent, rel)
    rows = s.collect()
    assert len(rows) == kg.count()
    assert all(r.score >= 0 for r in rows)


def test_link_prediction_ranks_hand_computed(spark):
    # 3 entities, hand-placed embeddings: h+r = [2], tails a=[2] (d=0),
    # b=[1] (d=1), c=[5] (d=3); test triple (q, p, b) -> true tail b
    # ranks behind a (d=0 < 1): rank 2.  With the filter containing
    # (q, p, a), a is excluded -> rank 1.
    import pyspark.sql.functions as F  # noqa: F401

    from face_hunter_spark.operators.transe import (
        link_prediction_eval,
        link_prediction_ranks,
    )

    ent = spark.createDataFrame(
        [("a", [2]), ("b", [1]), ("c", [5]), ("q", [0])],
        "id string, emb array<long>",
    )
    rel = spark.createDataFrame([("p", [2])], "id string, emb array<long>")
    test = spark.createDataFrame(
        [("q", "p", "b")], "subj string, pred string, obj string"
    )
    raw = link_prediction_ranks(test, ent, rel).collect()
    assert [(r.subj, r.obj, r.rank) for r in raw] == [("q", "b", 2)]

    filt = spark.createDataFrame(
        [("q", "p", "a")], "subj string, pred string, obj string"
    )
    filtered = link_prediction_ranks(test, ent, rel, filt).collect()
    assert filtered[0].rank == 1

    summary = link_prediction_eval(test, ent, rel, filt).collect()[0]
    assert (summary.n, summary.sum_rank, summary.mrr_micro,
            summary.hits_1) == (1, 1, 1000000, 1)


def test_link_prediction_tiebreak_and_invariance(kg):
    from face_hunter_spark.operators.transe import (
        link_prediction_ranks,
        transe_epoch,
    )

    ent, rel = transe_epoch(kg, dim=4, k_neg=2)
    test = kg.limit(5)
    r1 = sorted(map(tuple, link_prediction_ranks(
        test, ent, rel, filter_triples=kg).collect()))
    r8 = sorted(map(tuple, link_prediction_ranks(
        test.repartition(8), ent, rel, filter_triples=kg).collect()))
    assert r1 == r8 and all(row[3] >= 1 for row in r1)


def test_no_broadcast_paths_match(kg):
    # the shuffle fallbacks (10^8-entity regime) must be bit-identical
    # to the broadcast defaults
    from face_hunter_spark.operators.transe import (
        link_prediction_ranks,
        transe_epoch,
    )

    e1, r1 = transe_epoch(kg, dim=4, k_neg=2)
    e2, r2 = transe_epoch(kg, dim=4, k_neg=2, broadcast_vocab=False)
    assert _flat(e1) == _flat(e2) and _flat(r1) == _flat(r2)
    test = kg.limit(3)
    a = sorted(map(tuple, link_prediction_ranks(test, e1, r1).collect()))
    b = sorted(map(tuple, link_prediction_ranks(
        test, e1, r1, broadcast_candidates=False).collect()))
    assert a == b
