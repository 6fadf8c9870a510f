"""Basic-graph-pattern compiler (operators/bgp.py) — semantics vs a
hand-computed mirror on a small triple set, plus the plan shape the
module promises (hash equi-joins, no cartesian without opt-in)."""

import pytest

from face_hunter_spark.operators.bgp import construct, graph_pattern

P_SCENE = "http://face-hunter.org/ontology/hasScene"
P_DEPICTS = "https://schema.org/depicts"
P_TITLE = "http://purl.org/dc/elements/1.1/title"
P_SAME = "http://www.w3.org/2002/07/owl#sameAs"


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("v1", P_SCENE, "s1"),
        ("v1", P_SCENE, "s2"),
        ("v2", P_SCENE, "s3"),
        ("s1", P_DEPICTS, "e1"),
        ("s1", P_DEPICTS, "e2"),
        ("s3", P_DEPICTS, "e1"),
        ("v1", P_TITLE, "t_one"),
        ("v2", P_TITLE, "t_two"),
        ("e1", P_SAME, "e1"),  # self-loop for the repeated-var case
        ("e1", P_SAME, "e9"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_two_pattern_join(triples):
    got = sorted(
        tuple(r) for r in graph_pattern(
            triples,
            [("?v", P_SCENE, "?s"), ("?s", P_DEPICTS, "?e")],
            select=["v", "s", "e"],
        ).collect()
    )
    assert got == [("v1", "s1", "e1"), ("v1", "s1", "e2"), ("v2", "s3", "e1")]


def test_constant_object_and_chain(triples):
    got = sorted(
        tuple(r) for r in graph_pattern(
            triples,
            [("?s", P_DEPICTS, "e1"),
             ("?v", P_SCENE, "?s"),
             ("?v", P_TITLE, "?t")],
            select=["v", "t"],
        ).collect()
    )
    assert got == [("v1", "t_one"), ("v2", "t_two")]


def test_default_projection_is_sorted_vars(triples):
    df = graph_pattern(triples, [("?v", P_SCENE, "?s")])
    assert df.columns == ["s", "v"]


def test_anonymous_wildcard_binds_nothing(triples):
    got = sorted(
        r.v for r in graph_pattern(
            triples, [("?v", P_SCENE, None)], distinct=True
        ).collect()
    )
    assert got == ["v1", "v2"]


def test_repeated_variable_in_one_pattern(triples):
    got = [tuple(r) for r in graph_pattern(
        triples, [("?x", P_SAME, "?x")]
    ).collect()]
    assert got == [("e1",)]


def test_bag_semantics_and_distinct(triples):
    # e1 is depicted in two scenes of two videos -> two bindings of ?e
    dup = graph_pattern(
        triples,
        [(None, P_DEPICTS, "?e")],
    )
    assert sorted(r.e for r in dup.collect()) == ["e1", "e1", "e2"]
    assert sorted(
        r.e for r in graph_pattern(
            triples, [(None, P_DEPICTS, "?e")], distinct=True
        ).collect()
    ) == ["e1", "e2"]


def test_ask_style_constant_pattern(triples):
    present = graph_pattern(
        triples,
        [("v1", P_TITLE, "t_one"), ("?s", P_DEPICTS, "?e")],
        select=["s", "e"],
    )
    assert present.count() == 3
    absent = graph_pattern(
        triples,
        [("v1", P_TITLE, "WRONG"), ("?s", P_DEPICTS, "?e")],
        select=["s", "e"],
    )
    assert absent.count() == 0


def test_disconnected_patterns_raise_without_optin(triples):
    with pytest.raises(ValueError, match="cross product"):
        graph_pattern(
            triples, [("?a", P_TITLE, "?t"), ("?s", P_DEPICTS, "?e")]
        )
    n = graph_pattern(
        triples,
        [("?a", P_TITLE, "?t"), ("?s", P_DEPICTS, "?e")],
        allow_cartesian=True,
    ).count()
    assert n == 2 * 3


def test_chain_reordering_never_fakes_a_cross(triples):
    # user order (a-b), (c-t), (b-c): naive left-to-right would see a
    # cross at step 2; the connectivity-aware order must not raise
    got = sorted(tuple(r) for r in graph_pattern(
        triples,
        [("?v", P_SCENE, "?s"),
         ("?e", P_SAME, "?o"),
         ("?s", P_DEPICTS, "?e")],
        select=["v", "s", "e", "o"],
    ).collect())
    assert got == [
        ("v1", "s1", "e1", "e1"), ("v1", "s1", "e1", "e9"),
        ("v2", "s3", "e1", "e1"), ("v2", "s3", "e1", "e9"),
    ]


def test_select_validates_and_orders(triples):
    df = graph_pattern(
        triples, [("?v", P_SCENE, "?s")], select=["s", "v"]
    )
    assert df.columns == ["s", "v"]
    with pytest.raises(ValueError, match="unbound"):
        graph_pattern(triples, [("?v", P_SCENE, "?s")], select=["nope"])


def test_no_cartesian_in_connected_plan(triples):
    plan = graph_pattern(
        triples,
        [("?v", P_SCENE, "?s"), ("?s", P_DEPICTS, "?e")],
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hunter_match_facade(spark, tmp_path):
    from face_hunter_spark import synth
    from face_hunter_spark.hunter import SparkHunter

    h = SparkHunter(spark, str(tmp_path / "kg"), n_entities=8)
    assert h.match([("?v", P_SCENE, "?s")]) is None  # nothing committed
    h.link(synth.documents_df(spark, 8, 8))
    got = h.match(
        [("?v", P_SCENE, "?s"), ("?s", P_DEPICTS, "?e")],
        select=["v", "e"], distinct=True,
    )
    # mirror via the raw-SQL facade the patterns are documented to equal
    want = h.sql(
        "SELECT DISTINCT hs.subj AS v, d.obj AS e "
        "FROM {triples} hs JOIN {triples} d ON hs.obj = d.subj "
        f"WHERE hs.pred = '{P_SCENE}' AND d.pred = '{P_DEPICTS}'"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() > 0


# ------------------------------------------------------- OPTIONAL/FILTER

def test_optional_preserves_unmatched(triples):
    # s2 has no depicts triple -> e comes back NULL (SPARQL OPTIONAL)
    got = sorted(
        (r.v, r.s, r.e) for r in graph_pattern(
            triples,
            [("?v", P_SCENE, "?s")],
            optional=[[("?s", P_DEPICTS, "?e")]],
            select=["v", "s", "e"],
        ).collect()
    )
    assert got == [
        ("v1", "s1", "e1"), ("v1", "s1", "e2"), ("v1", "s2", None),
        ("v2", "s3", "e1"),
    ]


def test_optional_multi_pattern_group(triples):
    # group {?s depicts ?e . ?e sameAs ?x}: only e1 has sameAs rows;
    # s1's e2 branch and s2 both fall back to NULLs as one unit
    got = sorted(
        (r.s, r.e, r.x) for r in graph_pattern(
            triples,
            [("?v", P_SCENE, "?s")],
            optional=[[("?s", P_DEPICTS, "?e"), ("?e", P_SAME, "?x")]],
            select=["s", "e", "x"],
        ).collect()
    )
    assert got == [
        ("s1", "e1", "e1"), ("s1", "e1", "e9"), ("s2", None, None),
        ("s3", "e1", "e1"), ("s3", "e1", "e9"),
    ]


def test_filter_observes_optional_null(triples):
    got = sorted(
        (r.s, r.e) for r in graph_pattern(
            triples,
            [("?v", P_SCENE, "?s")],
            optional=[[("?s", P_DEPICTS, "?e")]],
            filters=["e IS NULL OR e = 'e1'"],
            select=["s", "e"],
        ).collect()
    )
    assert got == [("s1", "e1"), ("s2", None), ("s3", "e1")]


def test_filter_on_required_var(triples):
    got = sorted(
        r.v for r in graph_pattern(
            triples,
            [("?v", P_TITLE, "?t")],
            filters=["t LIKE 't_o%'"],
            select=["v"],
        ).collect()
    )
    assert got == ["v1"]


def test_uncorrelated_optional_raises(triples):
    with pytest.raises(ValueError, match="correlated"):
        graph_pattern(
            triples,
            [("?v", P_TITLE, "?t")],
            optional=[[("?s", P_DEPICTS, "?e")]],
        )


def test_optional_with_no_new_vars_raises(triples):
    with pytest.raises(ValueError, match="binds no new"):
        graph_pattern(
            triples,
            [("?v", P_SCENE, "?s"), ("?s", P_DEPICTS, "?e")],
            optional=[[("?s", P_DEPICTS, "?e")]],
        )


# ------------------------------------------------------------ CONSTRUCT

def test_construct_materializes_template_graph(triples):
    got = sorted(tuple(r) for r in construct(
        triples,
        [("?v", P_SCENE, "?s"), ("?s", P_DEPICTS, "?e")],
        template=[("?e", "appears_in", "?v"),
                  ("?v", "features", "?e")],
    ).collect())
    # graph = SET: e1 appears in v1 via s1 only once
    assert got == sorted([
        ("e1", "appears_in", "v1"), ("e2", "appears_in", "v1"),
        ("e1", "appears_in", "v2"),
        ("v1", "features", "e1"), ("v1", "features", "e2"),
        ("v2", "features", "e1"),
    ])


def test_construct_skips_null_instantiations(triples):
    # s2 has no depicts -> its binding has e = NULL; the ?e template
    # triple is skipped for it but the ?s one still fires (SPARQL spec)
    got = sorted(tuple(r) for r in construct(
        triples,
        [("?v", P_SCENE, "?s")],
        optional=[[("?s", P_DEPICTS, "?e")]],
        template=[("?v", "shows", "?e"), ("?v", "has", "?s")],
    ).collect())
    assert ("v1", "has", "s2") in got
    assert not any(r[1] == "shows" and r[2] is None for r in got)
    assert ("v1", "shows", "e1") in got and ("v2", "shows", "e1") in got


def test_construct_exclude_asserted(triples):
    # reconstructing an already-asserted triple yields nothing novel
    base = construct(
        triples,
        [("?s", P_DEPICTS, "?e")],
        template=[("?s", P_DEPICTS, "?e"), ("?e", "depicted_in", "?s")],
        exclude_asserted=True,
    )
    got = sorted(tuple(r) for r in base.collect())
    assert got == sorted([
        ("e1", "depicted_in", "s1"), ("e2", "depicted_in", "s1"),
        ("e1", "depicted_in", "s3"),
    ])


def test_construct_executes_bgp_join_once(triples):
    # the templates explode over one binding pass — the join subtree
    # must not be duplicated per template triple
    plan = construct(
        triples,
        [("?v", P_SCENE, "?s"), ("?s", P_DEPICTS, "?e")],
        template=[("?e", "appearsIn", "?v"), ("?v", "about", "?e"),
                  ("?s", "shows", "?e")],
    )._jdf.queryExecution().executedPlan().toString()
    assert (
        plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") == 1
    )
    assert plan.count("Generate") == 1


def test_construct_validates_template(triples):
    with pytest.raises(ValueError, match="unbound variable"):
        construct(triples, [("?v", P_SCENE, "?s")],
                  template=[("?v", "p", "?nope")])
    with pytest.raises(ValueError, match="wildcard"):
        construct(triples, [("?v", P_SCENE, "?s")],
                  template=[("?v", "p", None)])
    with pytest.raises(ValueError, match="at least one template"):
        construct(triples, [("?v", P_SCENE, "?s")], template=[])


def test_ask_hit_and_miss(triples):
    from face_hunter_spark.operators.bgp import ask

    assert ask(triples, [("?v", P_SCENE, "?s"), ("?s", P_DEPICTS, "e1")])
    assert not ask(triples, [("?v", P_SCENE, "?s"), ("?s", P_DEPICTS, "e404")])
    # filters participate
    assert ask(triples, [("?v", P_TITLE, "?t")], filters=["t = 't_two'"])
    assert not ask(triples, [("?v", P_TITLE, "?t")], filters=["t = 't_x'"])


def test_describe_star(triples):
    from face_hunter_spark.operators.bgp import describe

    got = sorted(tuple(r) for r in describe(triples, "s1").collect())
    assert got == [
        ("s1", P_DEPICTS, "e1", "out"),
        ("s1", P_DEPICTS, "e2", "out"),
        ("v1", P_SCENE, "s1", "in"),
    ]
    out_only = describe(triples, "s1", inbound=False)
    assert out_only.count() == 2
    # a self-loop appears once, as outbound
    loop = sorted(tuple(r) for r in describe(triples, "e1").collect())
    assert ("e1", P_SAME, "e1", "out") in loop
    assert ("e1", P_SAME, "e1", "in") not in loop


def test_ask_describe_on_facade(spark, tmp_path):
    from face_hunter_spark import synth
    from face_hunter_spark.hunter import SparkHunter

    h = SparkHunter(spark, str(tmp_path / "kg"), n_entities=6)
    assert h.ask([("?v", P_SCENE, "?s")]) is False  # pre-commit
    assert h.describe("anything") is None
    h.link(synth.documents_df(spark, 6, 6))
    assert h.ask([("?v", P_SCENE, "?s")]) is True
    some_v = h.match([("?v", P_SCENE, None)], select=["v"]).first()["v"]
    star = h.describe(some_v)
    assert star.where("direction = 'out'").count() > 0
