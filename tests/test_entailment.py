"""transitive_closure + rdfs_entail (operators/graph.py) vs
hand-computed closures, incl. cycles, diamonds, and the inferred-only
/ anti-join contract."""

import pytest

from face_hunter_spark.operators.graph import rdfs_entail, transitive_closure

SUB = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
TYP = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _closure_pairs(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return sorted(tuple(r) for r in transitive_closure(df).collect())


def test_closure_chain(spark):
    got = _closure_pairs(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == sorted(
        [("a", "b"), ("a", "c"), ("a", "d"),
         ("b", "c"), ("b", "d"), ("c", "d")]
    )


def test_closure_diamond_and_long_chain(spark):
    # doubling must converge in log rounds on a 20-long chain
    chain = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(20)]
    got = _closure_pairs(spark, chain)
    assert len(got) == 20 * 21 // 2


def test_closure_cycle_reaches_self(spark):
    got = _closure_pairs(spark, [("a", "b"), ("b", "a")])
    assert got == [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]


@pytest.fixture()
def kg(spark):
    rows = [
        # ontology: cat < mammal < animal ; dog < mammal
        ("cat", SUB, "mammal"),
        ("dog", SUB, "mammal"),
        ("mammal", SUB, "animal"),
        # instances
        ("felix", TYP, "cat"),
        ("rex", TYP, "dog"),
        ("worm", TYP, "invertebrate"),
        # a pre-asserted inferable triple: must NOT be re-emitted
        ("felix", TYP, "mammal"),
        # unrelated triple: passes through untouched
        ("felix", "http://example.org/name", "Felix"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_rdfs_entail_inferred_only(spark, kg):
    got = sorted(tuple(r) for r in rdfs_entail(kg).collect())
    assert got == sorted([
        # rdfs11
        ("cat", SUB, "animal"),
        ("dog", SUB, "animal"),
        # rdfs9 (felix->mammal already asserted, so only ->animal)
        ("felix", TYP, "animal"),
        ("rex", TYP, "mammal"),
        ("rex", TYP, "animal"),
    ])


def test_rdfs_entail_idempotent(spark, kg):
    inferred = rdfs_entail(kg)
    full = kg.select("subj", "pred", "obj").unionByName(inferred)
    assert rdfs_entail(full).count() == 0
