"""VoID statistics (operators/void_stats.py) against hand counts and a
groupBy mirror; approximate summary within HLL tolerance."""

import pytest

from face_hunter_spark.operators.shacl import RDF_TYPE
from face_hunter_spark.operators import void_stats


@pytest.fixture(scope="module")
def triples(spark):
    rows = (
        [(f"v{i}", RDF_TYPE, "ex:Video") for i in range(10)]
        + [(f"s{i}", RDF_TYPE, "ex:Scene") for i in range(25)]
        + [(f"v{i % 10}", "ex:has", f"s{i}") for i in range(25)]
        + [(f"v{i}", "ex:name", f"name_{i % 4}") for i in range(10)]
    )
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_summary_exact(triples):
    row = void_stats.summary(triples).collect()[0]
    assert row.n_triples == 70
    assert row.n_subjects == 35  # v0..v9 + s0..s24
    assert row.n_predicates == 3
    assert row.n_objects == 2 + 25 + 4  # classes + scenes + names


def test_summary_approximate_close(triples):
    row = void_stats.summary(triples, approximate=True).collect()[0]
    assert row.n_triples == 70
    assert abs(row.n_subjects - 35) <= 4
    assert abs(row.n_predicates - 3) <= 1
    assert abs(row.n_objects - 31) <= 4


def test_predicate_partitions(triples):
    got = {
        r.pred: (r.n_triples, r.n_subjects, r.n_objects)
        for r in void_stats.predicate_partitions(triples).collect()
    }
    assert got == {
        RDF_TYPE: (35, 35, 2),
        "ex:has": (25, 10, 25),
        "ex:name": (10, 10, 4),
    }


def test_class_partitions(triples):
    got = {
        r.cls: r.n_instances
        for r in void_stats.class_partitions(triples).collect()
    }
    assert got == {"ex:Video": 10, "ex:Scene": 25}
