"""SHACL-lite validation (operators/shacl.py): every constraint kind
against a hand-computed violation set, conformance on the clean slice,
and input validation."""

import pytest

from face_hunter_spark.operators.shacl import RDF_TYPE, validate

HAS = "ex:has"
NAME = "ex:name"
VID = "ex:Video"
SCN = "ex:Scene"


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        # typed nodes
        ("v1", RDF_TYPE, VID),
        ("v2", RDF_TYPE, VID),
        ("s1", RDF_TYPE, SCN),
        ("s2", RDF_TYPE, SCN),
        # v1 conforms everywhere; v2 has no scenes (min_count violation)
        ("v1", HAS, "s1"),
        ("v1", HAS, "s2"),
        # untyped subject of HAS (domain violation) pointing at an
        # untyped object (range violation)
        ("ghost", HAS, "s9"),
        # names: v1 ok, v2 has two (max_count violation), one malformed
        ("v1", NAME, "n_v1"),
        ("v2", NAME, "n_v2a"),
        ("v2", NAME, "n_v2b"),
        ("v2", NAME, "BAD"),  # pattern violation (and 3rd name)
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_domain_and_range(triples):
    rep = validate(
        triples,
        [
            {"id": "dom", "kind": "domain", "pred": HAS, "cls": VID},
            {"id": "rng", "kind": "range", "pred": HAS, "cls": SCN},
        ],
    )
    got = sorted(map(tuple, rep.collect()))
    assert got == [
        ("dom", "domain", "ghost", HAS, "s9"),
        ("rng", "range", "s9", HAS, "s9"),
    ]


def test_pattern(triples):
    rep = validate(
        triples,
        [{"id": "p", "kind": "pattern", "pred": NAME, "pattern": "n\\_%"}],
    )
    assert [tuple(r) for r in rep.collect()] == [
        ("p", "pattern", "v2", NAME, "BAD")
    ]


def test_min_count(triples):
    rep = validate(
        triples,
        [{"id": "m", "kind": "min_count", "pred": HAS, "cls": VID, "n": 1}],
    )
    assert [tuple(r) for r in rep.collect()] == [
        ("m", "min_count", "v2", HAS, "0")
    ]


def test_max_count_with_and_without_cls(triples):
    rep = validate(
        triples,
        [{"id": "x", "kind": "max_count", "pred": NAME, "cls": VID, "n": 1}],
    )
    assert [tuple(r) for r in rep.collect()] == [
        ("x", "max_count", "v2", NAME, "3")
    ]
    # without cls: every subject of NAME is in scope — same result here
    rep2 = validate(
        triples, [{"id": "x", "kind": "max_count", "pred": NAME, "n": 1}]
    )
    assert [tuple(r) for r in rep2.collect()] == [
        ("x", "max_count", "v2", NAME, "3")
    ]


def test_conformant_graph_is_empty_report(triples):
    clean = triples.where("subj <> 'ghost' AND subj <> 'v2'")
    rep = validate(
        clean,
        [
            {"id": "dom", "kind": "domain", "pred": HAS, "cls": VID},
            {"id": "rng", "kind": "range", "pred": HAS, "cls": SCN},
            {"id": "m", "kind": "min_count", "pred": HAS, "cls": VID, "n": 1},
            {"id": "x", "kind": "max_count", "pred": NAME, "n": 1},
            {"id": "p", "kind": "pattern", "pred": NAME, "pattern": "n\\_%"},
        ],
    )
    assert rep.count() == 0


def test_shape_validation_errors(triples):
    with pytest.raises(ValueError, match="unknown kind"):
        validate(triples, [{"kind": "nope", "pred": HAS}])
    with pytest.raises(ValueError, match="pred is required"):
        validate(triples, [{"kind": "domain", "cls": VID}])
    with pytest.raises(ValueError, match="cls is required"):
        validate(triples, [{"kind": "range", "pred": HAS}])
    with pytest.raises(ValueError, match="needs cls"):
        validate(triples, [{"kind": "min_count", "pred": HAS, "n": 1}])
    with pytest.raises(ValueError, match="at least one shape"):
        validate(triples, [])
