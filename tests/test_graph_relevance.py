"""PageRank (operators/graph.py) and BM25 (operators/relevance.py).

Correctness strategy: tiny hand-checkable graphs/corpora with answers
derived independently (a pure-Python replay of the integer PageRank
recurrence; a pure-Python BM25 with math.log), plus structural
invariants — mass conservation up to the documented floor-division
leak, partitioning invariance, dangling-sink handling.  The driver
queries `pagerank_suppliers` / `bm25_ranking` add fully-unrolled
DuckDB CTE oracles at sf0.01.
"""

import math

import pyspark.sql.functions as F

from face_hunter_spark.operators.graph import SCALE, pagerank
from face_hunter_spark.operators.relevance import bm25


def _py_pagerank(edges, n_iter=6, num=85, den=100):
    """Driver-side integer replay of the documented recurrence."""
    e = sorted(set(edges))
    verts = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(verts)
    deg = {}
    for u, _ in e:
        deg[u] = deg.get(u, 0) + 1
    pr = {v: SCALE // n for v in verts}
    base = ((den - num) * SCALE // den) // n
    for _ in range(n_iter):
        csum = {v: 0 for v in verts}
        for u, v in e:
            csum[v] += pr[u] // deg[u]
        dang = sum(pr[v] for v in verts if v not in deg)
        pr = {
            v: base + (num * (csum[v] + dang // n)) // den for v in verts
        }
    return pr


def _run_pagerank(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["v"]: r["pr"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_python_replay(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("c", "d"), ("e", "a"),  # e: no in-edges
        ("f", "g"),  # g: dangling sink
    ]
    assert _run_pagerank(spark, edges) == _py_pagerank(edges)


def test_pagerank_dangling_only_graph(spark):
    # every dst is a sink: dangling redistribution dominates
    edges = [("a", "x"), ("b", "y"), ("c", "z")]
    got = _run_pagerank(spark, edges, n_iter=3)
    assert got == _py_pagerank(edges, n_iter=3)
    # sinks receive strictly more than sources after round 1
    assert got["x"] > got["a"]


def test_pagerank_mass_conservation(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    got = _run_pagerank(spark, edges, n_iter=4)
    total = sum(got.values())
    n = 4
    # floor-division leak < n units per round per division site
    assert SCALE - 4 * 3 * n <= total <= SCALE


def test_pagerank_duplicate_edges_collapse(spark):
    base = [("a", "b"), ("b", "a")]
    dup = base + [("a", "b"), ("a", "b")]
    assert _run_pagerank(spark, base) == _run_pagerank(spark, dup)


def test_pagerank_partitioning_invariance(spark):
    edges = [(f"v{i}", f"v{(i * 7 + 3) % 23}") for i in range(40)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {r["v"]: r["pr"] for r in pagerank(df.repartition(1)).collect()}
    b = {r["v"]: r["pr"] for r in pagerank(df.repartition(7)).collect()}
    assert a == b


def _py_bm25(doc_tokens, terms, k1=1.2, b=0.75):
    n = len(doc_tokens)
    dls = [len(t) for t in doc_tokens]
    avgdl = sum(dls) / n
    dfs = [sum(1 for t in doc_tokens if q in t) for q in terms]
    out = []
    for toks, dl in zip(doc_tokens, dls):
        s = 0.0
        for q, dfq in zip(terms, dfs):
            tf = toks.count(q)
            idf = math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))
        out.append(s)
    return out


def test_bm25_matches_python(spark):
    corpus = [
        "spark shuffles data across the cluster",
        "the quick brown fox",
        "spark spark spark and more spark",
        "spark cluster",
    ]
    terms = ["spark", "cluster"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25(df, terms).collect()
    }
    want = _py_bm25([c.split() for c in corpus], terms)
    for i, w in enumerate(want):
        assert abs(got[i] - w) < 1e-9, (i, got[i], w)
    # doc 3 has the same tf but a shorter dl than doc 0 -> BM25 length
    # normalization ranks it strictly higher
    assert got[3] > got[0]


def test_bm25_absent_term_scores_zero_contribution(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    both = bm25(df, ["beta"]).collect()
    with_ghost = bm25(df, ["beta", "zzz_absent"]).collect()
    a = {r["doc_id"]: r["score"] for r in both}
    g = {r["doc_id"]: r["score"] for r in with_ghost}
    # idf of the absent term is ln(1+(2-0+.5)/.5) > 0 but tf=0 -> no change
    for k in a:
        assert abs(a[k] - g[k]) < 1e-12


def test_bm25_empty_terms_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    try:
        bm25(df, [])
    except ValueError:
        pass
    else:
        raise AssertionError("empty query_terms must raise")


def test_bm25_plan_is_scan_plus_single_agg(spark):
    """Plan shape: no per-term explode/join — one broadcast of a 1-row
    aggregate back onto the scan stage."""
    df = spark.createDataFrame(
        [(i, "a b c spark") for i in range(10)], "doc_id long, text string"
    )
    plan = bm25(df, ["spark", "b"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Generate") == 0  # no explode


# --- triangle counting ---

from face_hunter_spark.operators.graph import triangle_count  # noqa: E402


def _edges(spark, pairs, parts=3):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    ).repartition(parts)


def test_triangles_k4(spark):
    import itertools

    k4 = list(itertools.combinations(range(4), 2))
    row = triangle_count(_edges(spark, k4)).collect()[0]
    assert (row["n_triangles"], row["n_edges"], row["n_vertices"]) == (4, 6, 4)


def test_triangles_normalization(spark):
    # triangle given as duplicated, reversed, self-looped mess
    pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3), (3, 2)]
    row = triangle_count(_edges(spark, pairs)).collect()[0]
    assert row["n_triangles"] == 1 and row["n_edges"] == 3


def test_triangles_path_and_star_are_zero(spark):
    path = [(i, i + 1) for i in range(20)]
    star = [(0, i) for i in range(1, 30)]
    assert triangle_count(_edges(spark, path)).collect()[0]["n_triangles"] == 0
    assert triangle_count(_edges(spark, star)).collect()[0]["n_triangles"] == 0


def test_triangles_per_vertex_k4(spark):
    import itertools

    k4 = list(itertools.combinations(range(4), 2))
    rows = triangle_count(_edges(spark, k4), per_vertex=True).collect()
    assert {r["vertex"]: r["n_triangles"] for r in rows} == {
        0: 3, 1: 3, 2: 3, 3: 3
    }


def test_triangles_random_graph_vs_bruteforce(spark):
    import itertools
    import random

    rng = random.Random(7)
    n = 24
    pairs = [
        (a, b)
        for a, b in itertools.combinations(range(n), 2)
        if rng.random() < 0.3
    ]
    adj = {v: set() for v in range(n)}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    expected = sum(
        1
        for a, b, c in itertools.combinations(range(n), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    got = triangle_count(_edges(spark, pairs)).collect()[0]
    assert got["n_triangles"] == expected


def test_triangles_partitioning_invariance(spark):
    pairs = [(i, (i * 7 + 3) % 15) for i in range(40)] + [(1, 2), (2, 3), (3, 1)]

    def run(parts):
        return triangle_count(_edges(spark, pairs, parts)).collect()[0]

    assert run(1) == run(9)


def test_triangles_edges_scanned_once(spark):
    import re

    edges = spark.range(500).select(
        (F.col("id") % 40).alias("src"), ((F.col("id") * 7) % 40).alias("dst")
    )
    plan = (
        triangle_count(edges)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # checkpoints truncate the shared subtrees: the raw edge input must
    # not appear in the final plan at all (it was scanned 18x before)
    assert len(re.findall(r"Range \(0, 500", plan)) == 0


# ------------------------------------------------------------ LPA


def test_lpa_disjoint_cliques(spark):
    from face_hunter_spark.operators.graph import label_propagation

    K3a = [("a1", "a2"), ("a2", "a3"), ("a3", "a1")]
    K3b = [("b1", "b2"), ("b2", "b3"), ("b3", "b1")]
    e = spark.createDataFrame(
        K3a + K3b, "src string, dst string"
    ).repartition(4)
    got = {
        r.id: r.community
        for r in label_propagation(e, n_iter=4).collect()
    }
    # each clique converges to its minimum member label
    assert got == {
        "a1": "a1", "a2": "a1", "a3": "a1",
        "b1": "b1", "b2": "b1", "b3": "b1",
    }


def test_lpa_partitioning_invariance_and_validation(spark):
    import pytest

    from face_hunter_spark.operators.graph import label_propagation

    pairs = [(f"v{i}", f"v{(i * 3 + 1) % 23}") for i in range(60)]

    def run(parts):
        e = spark.createDataFrame(
            pairs, "src string, dst string"
        ).repartition(parts)
        return sorted(
            map(tuple, label_propagation(e, n_iter=3).collect())
        )

    assert run(1) == run(8)
    e2 = spark.createDataFrame(pairs, "src string, dst string")
    with pytest.raises(ValueError, match="n_iter"):
        label_propagation(e2, n_iter=0)


# -------------------------------------------------- common neighbors


def test_common_neighbors_square(spark):
    from face_hunter_spark.operators.graph import common_neighbors

    # square a-b-c-d-a: diagonals (a,c) and (b,d) share 2 neighbors
    # and are non-adjacent; adjacent pairs are excluded
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    got = {
        (r.u, r.v): (r.n_common, r.jaccard_num, r.jaccard_den)
        for r in common_neighbors(e).collect()
    }
    assert got == {("a", "c"): (2, 2, 2), ("b", "d"): (2, 2, 2)}


def test_common_neighbors_hub_cap_and_invariance(spark):
    import pytest

    from face_hunter_spark.operators.graph import common_neighbors

    # hub h connects to everything; x and y also share n1
    pairs = [("h", f"v{i}") for i in range(10)]
    pairs += [("x", "n1"), ("y", "n1"), ("x", "h"), ("y", "h")]
    e = spark.createDataFrame(pairs, "src string, dst string")
    exact = {
        (r.u, r.v): r.n_common for r in common_neighbors(e).collect()
    }
    # via the hub every leaf pair shares h; (x, y) share h AND n1
    assert exact[("x", "y")] == 2
    assert exact[("v0", "v1")] == 1
    capped = {
        (r.u, r.v): r.n_common
        for r in common_neighbors(e, max_degree=5).collect()
    }
    # hub excluded as APEX (no leaf-leaf pairs via h), but it still
    # participates as an endpoint: x and y are apexes for (h, n1)
    assert capped == {("x", "y"): 1, ("h", "n1"): 2}
    # deterministic at any partitioning
    r1 = sorted(map(tuple, common_neighbors(e.repartition(1)).collect()))
    r8 = sorted(map(tuple, common_neighbors(e.repartition(8)).collect()))
    assert r1 == r8
    with pytest.raises(ValueError, match="min_common"):
        common_neighbors(e, min_common=0)


def test_common_neighbors_ignores_self_loops_and_nulls(spark):
    from face_hunter_spark.operators.graph import common_neighbors

    # regression (review r5): the reversed half of the symmetrized
    # edge list took RAW edges, so a self-loop (u,u) — common in
    # sameAs graphs — leaked into sym and inflated degrees/jaccard_den.
    # ADVICE example: edges (u,a),(v,a),(u,u) must give deg_u=1,
    # jaccard_den=1, not 2/2.
    e = spark.createDataFrame(
        [("u", "a"), ("v", "a"), ("u", "u"), ("a", None)],
        "src string, dst string",
    )
    got = {
        (r.u, r.v): (r.n_common, r.deg_u, r.deg_v, r.jaccard_den)
        for r in common_neighbors(e).collect()
    }
    assert got == {("u", "v"): (1, 1, 1, 1)}


# ------------------------------------------------------------- BFS


def test_bfs_levels_path_graph(spark):
    import pytest

    from face_hunter_spark.operators.graph import bfs_levels

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string",
    )
    got = {
        r.id: r.level for r in bfs_levels(e, "a", max_hops=6).collect()
    }
    # early stop + disconnected component excluded
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    # max_hops truncates
    got2 = {
        r.id: r.level for r in bfs_levels(e, "a", max_hops=2).collect()
    }
    assert got2 == {"a": 0, "b": 1, "c": 2}
    # directed: no back-edges
    got3 = {
        r.id: r.level
        for r in bfs_levels(e, "c", max_hops=6, directed=True).collect()
    }
    assert got3 == {"c": 0, "d": 1}
    with pytest.raises(ValueError, match="max_hops"):
        bfs_levels(e, "a", max_hops=0)


def test_bfs_partitioning_invariance(spark):
    from face_hunter_spark.operators.graph import bfs_levels

    pairs = [(f"v{i}", f"v{(i * 5 + 2) % 31}") for i in range(80)]

    def run(parts):
        e = spark.createDataFrame(
            pairs, "src string, dst string"
        ).repartition(parts)
        return sorted(
            map(tuple, bfs_levels(e, "v0", max_hops=4).collect())
        )

    assert run(1) == run(8)


def test_facade_distance(spark, tmp_path):
    from face_hunter_spark import synth
    from face_hunter_spark.hunter import SparkHunter

    h = SparkHunter(spark, str(tmp_path / "dkg"), n_entities=6)
    assert h.distance("a", "b") is None  # before any commit
    h.link(synth.documents_df(spark, 8, 6))
    t = h.catalog.read(spark, "triples")
    row = (
        t.where(~F.col("obj_is_literal"))
        .where(F.col("pred") == "http://xmlns.com/foaf/0.1/depicts")
        .select("subj", "obj")
        .limit(1)
        .collect()[0]
    )
    scene, entity = row.subj, row.obj
    assert h.distance(scene, entity) == 1
    assert h.distance(entity, scene) == 1  # undirected
    assert h.distance(scene, "urn:nowhere") is None
