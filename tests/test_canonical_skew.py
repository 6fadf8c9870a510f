import pandas as pd
import pyspark.sql.functions as F

from face_hunter_spark import synth
from face_hunter_spark.operators.canonical import (
    canonical_map,
    connected_components,
    same_as_edges,
)
from face_hunter_spark.operators.skew import salted_agg


def test_connected_components_chain(spark):
    # chain a-b-c-d plus isolated pair e-f: two components
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")], ["uri_a", "uri_b"]
    )
    got = {r.uri: r.component for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e", "f": "e"}


def test_canonical_map_prefers_wikidata(spark):
    from face_hunter_spark.schemas import ENTITY_CATALOG

    cat_pdf = synth.make_entity_catalog_pdf(n_entities=10, distractors=0)
    cat = spark.createDataFrame(cat_pdf, ENTITY_CATALOG)
    canon = canonical_map(cat)
    rows = {r.uri: r.canonical for r in canon.collect()}
    # every URI maps somewhere; canonical is always a wikidata URI when
    # the component has one (all our components do)
    assert set(rows) == set(cat_pdf["entity"])
    for uri, c in rows.items():
        assert c.startswith("http://www.wikidata.org/")
    # dbpedia and wikidata URI of the same entity share a canonical id
    by_name = cat_pdf.groupby("name")["entity"].apply(list)
    for name, uris in by_name.items():
        assert len({rows[u] for u in uris}) == 1, name


def test_same_as_edges_shape(spark):
    from face_hunter_spark.schemas import ENTITY_CATALOG

    cat = spark.createDataFrame(
        synth.make_entity_catalog_pdf(n_entities=9, distractors=0),
        ENTITY_CATALOG,
    )
    edges = same_as_edges(cat)
    # 8 of 9 entities have both KGs (1/9 wikidata-only) -> 8 edges
    assert edges.count() == 8


def test_salted_agg_matches_plain(spark):
    pdf = pd.DataFrame(
        {
            "k": ["hot"] * 500 + ["cold%d" % i for i in range(100)],
            "v": list(range(600)),
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        r.k: (r.n, r.total, r.lo, r.hi)
        for r in salted_agg(
            df,
            keys=["k"],
            aggs={
                "n": ("count", "v"),
                "total": ("sum", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
            salt_buckets=8,
            salt_source="v",
        ).collect()
    }
    want = {
        r.k: (r.n, r.total, r.lo, r.hi)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_salted_agg_default_salt_partitioning_invariant(spark):
    """The default (whole-row hash) salt must assign each row the same
    bucket regardless of input partitioning — assert the PARTIAL stage
    (key, salt, partial aggregates) is identical for a 2-partition and
    a 17-partition layout of the same data."""
    pdf = pd.DataFrame(
        {
            "k": ["hot"] * 300 + ["cold%d" % i for i in range(60)],
            "v": list(range(360)),
        }
    )

    def partial_counts(n_parts):
        df = spark.createDataFrame(pdf).repartition(n_parts)
        salt = F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(8)
        )
        return {
            (r.k, r.s): (r.n, r.total)
            for r in df.withColumn("s", salt)
            .groupBy("k", "s")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
            .collect()
        }

    assert partial_counts(2) == partial_counts(17)
    # and the merged result still matches the plain groupBy
    df = spark.createDataFrame(pdf)
    got = {
        r.k: (r.n, r.total)
        for r in salted_agg(
            df, keys=["k"], aggs={"n": ("count", "v"), "total": ("sum", "v")},
            salt_buckets=8,
        ).collect()
    }
    want = {
        r.k: (r.n, r.total)
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
        ).collect()
    }
    assert got == want


def test_salted_agg_tolerates_map_columns(spark):
    """xxhash64 rejects MapType at any nesting depth; the default salt
    must skip map-bearing columns instead of failing analysis."""
    df = spark.createDataFrame(
        [("a", 1, {"x": 1}, [{"m": 1}]),
         ("a", 2, {"y": 2}, [{"m": 2}]),
         ("b", 3, {"z": 3}, [])],
        "k string, v int, props map<string,int>, "
        "tags array<map<string,int>>",
    )
    got = {
        r.k: r.total
        for r in salted_agg(
            df, keys=["k"], aggs={"total": ("sum", "v")}, salt_buckets=4
        ).collect()
    }
    assert got == {"a": 3, "b": 3}


def test_bigstar_matches_hashmin_on_random_graphs(spark):
    """Large-star/small-star CC (the O(log^2 n) scale variant) labels
    every node identically to hash-min propagation on seeded random
    graphs of varied density."""
    import numpy as np

    for seed, n_nodes, n_edges in [(1, 40, 25), (2, 60, 80), (3, 30, 45)]:
        rng = np.random.default_rng(seed)
        pairs = {
            (f"n{a:03d}", f"n{b:03d}")
            for a, b in rng.integers(0, n_nodes, (n_edges, 2))
            if a != b
        }
        edges = spark.createDataFrame(
            sorted(pairs), ["uri_a", "uri_b"]
        )
        hm = {r.uri: r.component
              for r in connected_components(edges).collect()}
        bs = {r.uri: r.component
              for r in connected_components(
                  edges, algorithm="bigstar").collect()}
        assert bs == hm, (seed, {k: (bs.get(k), hm.get(k))
                                 for k in set(bs) ^ set(hm) or hm
                                 if bs.get(k) != hm.get(k)})


def test_bigstar_path_graph_bounded_rounds(spark):
    """A 1,000-node path has diameter 999 — hash-min would need ~999
    rounds; large-star/small-star must label it min-reachable within
    its default iteration budget (O(log^2 n) rounds)."""
    n = 1000
    edges = spark.createDataFrame(
        [(f"p{i:04d}", f"p{i+1:04d}") for i in range(n - 1)],
        ["uri_a", "uri_b"],
    )
    got = {r.uri: r.component
           for r in connected_components(edges, algorithm="bigstar")
           .collect()}
    assert got == {f"p{i:04d}": "p0000" for i in range(n)}


def _full_vs_incremental(spark, old_pairs, new_pairs, algorithm="hashmin"):
    from face_hunter_spark.operators.canonical import incremental_components

    old = spark.createDataFrame(old_pairs, ["uri_a", "uri_b"])
    new = spark.createDataFrame(new_pairs, ["uri_a", "uri_b"])
    labels = connected_components(old)
    inc = {
        r.uri: r.component
        for r in incremental_components(
            labels, new, algorithm=algorithm
        ).collect()
    }
    full = {
        r.uri: r.component
        for r in connected_components(old.unionByName(new)).collect()
    }
    assert inc == full
    return inc


def test_incremental_cc_merges_components(spark):
    # two standing components merged by one new edge; one untouched
    got = _full_vs_incremental(
        spark,
        [("a", "b"), ("c", "d"), ("x", "y")],
        [("b", "c")],
    )
    assert got["d"] == "a" and got["x"] == "x"


def test_incremental_cc_new_nodes_and_internal_edges(spark):
    # new edge internal to a component (no-op), brand-new pair, and a
    # brand-new uri that becomes the new min root of an old component
    got = _full_vs_incremental(
        spark,
        [("b", "c"), ("m", "n")],
        [("b", "c"), ("p", "q"), ("a0", "n")],
    )
    assert got == {
        "b": "b", "c": "b",
        "m": "a0", "n": "a0", "a0": "a0",
        "p": "p", "q": "p",
    }


def test_incremental_cc_chain_across_three_components_bigstar(spark):
    _full_vs_incremental(
        spark,
        [("a", "b"), ("d", "e"), ("g", "h")],
        [("b", "d"), ("e", "g")],
        algorithm="bigstar",
    )


def test_incremental_cc_empty_delta(spark):
    got = _full_vs_incremental(spark, [("a", "b")], [("a", "b")])
    assert got == {"a": "a", "b": "a"}
