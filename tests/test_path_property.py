"""Property test for the SPARQL property-path grammar: random path
expressions (inverse / sequence / alternative / grouping / '+'
closures on atoms AND on closure-free compound groups — the
composite-relation closure — plus negated property sets with forward
AND inverse members) evaluated by the engine's DNF rewrite must match
a naive set-semantics evaluator over a fixed cyclic graph.

Comparison is on SETS of (s, o) pairs: SPARQL sequences/alternatives
are bag-semantic (``(p|p)`` legitimately yields each solution twice),
while the naive evaluator is set-based — the engine's multiplicity is
covered by the targeted tests in test_sparql.py instead.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from face_hunter_spark.operators import sparql

PREDS = ["p", "q", "r"]

# small cyclic graph exercising chains, fan-out and a 3-cycle
EDGES = [
    ("a", "p", "b"),
    ("b", "p", "c"),
    ("c", "p", "a"),  # p-cycle
    ("a", "q", "c"),
    ("c", "q", "d"),
    ("d", "r", "e"),
    ("b", "r", "d"),
    ("e", "q", "a"),
]


@pytest.fixture(scope="module")
def triples(spark):
    rows = [(s, f"http://e/{p}", o) for s, p, o in EDGES]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


# ---- path AST: ("atom", p) | ("plus", p) | ("inv", a) |
#      ("seq", a, b) | ("alt", a, b)

atoms = st.sampled_from(PREDS).map(lambda p: ("atom", p))
plus = st.sampled_from(PREDS).map(lambda p: ("plus", p))


def _compound(children):
    return st.one_of(
        st.tuples(st.just("inv"), children),
        st.tuples(st.just("seq"), children, children),
        st.tuples(st.just("alt"), children, children),
    )


# negated property set !(p|^q|...): per §9.1 the forward members
# constrain forward edges, ^-members constrain reversed edges, and
# each branch exists iff its member list is non-empty.
npss = st.tuples(
    st.frozensets(st.sampled_from(PREDS), max_size=2),
    st.frozensets(st.sampled_from(PREDS), max_size=2),
).filter(lambda t: t[0] or t[1]).map(
    lambda t: ("nps", tuple(sorted(t[0])), tuple(sorted(t[1])))
)

# composite closure '(...)+': the group may contain plain / inverse
# steps, negated sets, sequences, alternatives, closure steps
# ((a/b+)+ — nested-closure atoms, r5 continuation) and, one level
# deeper, a closed group of its own (((a/b)+/c)+); a bare '!(...)+'
# arrives as cplus over a single-atom group
_inner0 = st.recursive(st.one_of(atoms, plus, npss), _compound,
                       max_leaves=3)
_cplus0 = st.tuples(st.just("cplus"), _inner0)
_inner1 = st.recursive(st.one_of(atoms, plus, _cplus0, npss),
                       _compound, max_leaves=3)
cplus = st.tuples(st.just("cplus"), _inner1)

paths = st.recursive(
    st.one_of(atoms, plus, cplus, npss), _compound, max_leaves=5
)


def render(ast) -> str:
    kind = ast[0]
    if kind == "atom":
        return f"<http://e/{ast[1]}>"
    if kind == "plus":
        return f"<http://e/{ast[1]}>+"
    if kind == "cplus":
        return f"({render(ast[1])})+"
    if kind == "nps":
        members = [f"<http://e/{p}>" for p in ast[1]] + [
            f"^<http://e/{q}>" for q in ast[2]
        ]
        return "!(" + "|".join(members) + ")"
    if kind == "inv":
        return f"^({render(ast[1])})"
    if kind == "seq":
        return f"({render(ast[1])})/({render(ast[2])})"
    return f"({render(ast[1])})|({render(ast[2])})"


def _fixpoint(step: set) -> set:
    out = set(step)
    while True:
        new = {(s, o2) for s, o in out for o1, o2 in step if o == o1}
        if new <= out:
            return out
        out |= new


def naive(ast) -> set:
    kind = ast[0]
    if kind == "atom":
        return {(s, o) for s, p, o in EDGES if p == ast[1]}
    if kind == "plus":
        return _fixpoint({(s, o) for s, p, o in EDGES if p == ast[1]})
    if kind == "cplus":
        return _fixpoint(naive(ast[1]))
    if kind == "nps":
        fwd, rev = ast[1], ast[2]
        out = set()
        if fwd:
            out |= {(s, o) for s, p, o in EDGES if p not in fwd}
        if rev:
            out |= {(o, s) for s, p, o in EDGES if p not in rev}
        return out
    if kind == "inv":
        return {(o, s) for s, o in naive(ast[1])}
    if kind == "seq":
        a, b = naive(ast[1]), naive(ast[2])
        return {(s, o) for s, m in a for m2, o in b if m == m2}
    return naive(ast[1]) | naive(ast[2])


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ast=paths)
def test_path_dnf_matches_naive_evaluator(triples, ast):
    text = f"SELECT ?s ?o WHERE {{ ?s {render(ast)} ?o }}"
    got = {
        (r.s, r.o) for r in sparql.execute(triples, text).collect()
    }
    assert got == naive(ast), text
