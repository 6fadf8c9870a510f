"""Property test for LeftJoin(P1, P2, F) with an EXISTS marker in F
(EXISTS inside an OPTIONAL group's FILTER): random small graphs
evaluated by the engine must match a naive bag-semantics evaluator of
the SPARQL algebra — for each left row, candidate extensions that
fail the EXISTS drop, and a left row with NO surviving extension
survives exactly once, NULL-padded.

The query shape is fixed (the marker-in-LeftJoin-condition shape the
implementation routes specially); the graphs are random: h-edges
(left), d-edges (optional extensions) and lbl-edges (the EXISTS
witness set) over a small vocabulary, so empty candidate sets,
all-candidates-fail sets and multi-candidate bags all occur.
"""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from face_hunter_spark.operators import sparql

VS = ["v1", "v2"]
SS = ["s1", "s2", "s3"]
ES = ["A", "B", "C"]

h_edges = st.lists(
    st.tuples(st.sampled_from(VS), st.sampled_from(SS)),
    min_size=1, max_size=4, unique=True,
)
d_edges = st.lists(
    st.tuples(st.sampled_from(SS), st.sampled_from(ES)),
    max_size=6, unique=True,
)
lbl_set = st.sets(st.sampled_from(ES), max_size=3)


def _naive(h, d, lbl, positive=True, rescue=None):
    """Bag-semantics LeftJoin(P1, P2, F): P1 = h-edges (?v ?s),
    P2 = d-edges (?s ?e), F = [NOT] EXISTS(lbl witness for ?e),
    optionally OR ?e = rescue."""
    out = Counter()
    for v, s in h:
        kept = [
            e for s2, e in d
            if s2 == s
            and (
                ((e in lbl) if positive else (e not in lbl))
                or (rescue is not None and e == rescue)
            )
        ]
        if kept:
            for e in kept:
                out[(v, e)] += 1
        else:
            out[(v, None)] += 1
    return out


def _run(spark, h, d, lbl, text):
    rows = (
        [(v, "h", s) for v, s in h]
        + [(s, "d", e) for s, e in d]
        + [(e, "lbl", "w") for e in sorted(lbl)]
    )
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )
    got = Counter(
        (r.v, r.e) for r in sparql.execute(t, text).collect()
    )
    return got


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(h=h_edges, d=d_edges, lbl=lbl_set)
def test_optional_exists_matches_naive(spark, h, d, lbl):
    got = _run(
        spark, h, d, lbl,
        "SELECT ?v ?e WHERE { ?v <h> ?s OPTIONAL { ?s <d> ?e "
        "FILTER(EXISTS { ?e <lbl> ?x }) } }",
    )
    assert got == _naive(h, d, lbl, positive=True)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(h=h_edges, d=d_edges, lbl=lbl_set)
def test_optional_not_exists_or_rescue_matches_naive(spark, h, d, lbl):
    got = _run(
        spark, h, d, lbl,
        "SELECT ?v ?e WHERE { ?v <h> ?s OPTIONAL { ?s <d> ?e "
        "FILTER(!EXISTS { ?e <lbl> ?x } || ?e = 'B') } }",
    )
    assert got == _naive(h, d, lbl, positive=False, rescue="B")
