"""Graph analytics over the knowledge graph: PageRank, triangle
counting.

Entity importance over the materialized triple graph (or any edge
list) — the standard power iteration, expressed as DataFrame joins so
every round is one equi-join shuffle + one groupBy, never an
adjacency-matrix collect.

**Fixed-point arithmetic for exactness.**  Classic double-precision
PageRank sums floating contributions per vertex, and cross-row double
addition is order-dependent — the result would differ run-to-run with
partitioning and engine-to-engine vs an oracle.  Ranks here are
integer "mass units" (total mass = ``scale`` = 10^12): shares divide
with integer DIV, contributions sum exactly, damping multiplies by an
integer ratio.  Every value is reproducible bit-for-bit at any
parallelism, and a SQL engine can replay the identical recurrence
(see driver_queries._oracle_pagerank — the fully-unrolled DuckDB CTE).
The floor-division mass leak is < n_vertices units per round, i.e.
relative error < n·rounds/10^12 vs true PageRank.

Scale notes (100 TB / 10^9-vertex regime): per round the plan is
edges ⨝ ranks (equi-join on src — co-partition both on the vertex key
and the exchange is reused across rounds) then groupBy(dst) with
map-side partial sums; dangling mass is a 1-row aggregate broadcast
back, not a driver collect.  Ranks persist per round with the previous
round unpersisted, so lineage stays O(1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "pagerank", "triangle_count", "property_path",
    "transitive_closure", "rdfs_entail", "label_propagation",
    "common_neighbors", "bfs_levels",
]

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 6,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """PageRank over directed ``edges`` -> (v, pr) with ``pr`` the
    integer mass (out of 10^12 total) after ``n_iter`` rounds; damping
    factor = damping_num/damping_den (default 0.85).

    Recurrence (all integer ops, DIV = truncating division):
      pr_0(v)    = SCALE DIV N
      share(u)   = pr_t(u) DIV outdeg(u)
      csum(v)    = sum of share(u) over in-edges u->v
      dang       = sum of pr_t(u) over vertices with outdeg 0
      pr_{t+1}(v)= ((den-num)*SCALE DIV den) DIV N
                   + (num * (csum(v) + dang DIV N)) DIV den

    Dangling mass is redistributed uniformly (no mass escapes through
    sinks).  Duplicate edges are collapsed first; self-loops count.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct().persist()
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .persist()
    )
    n = verts.count()  # scalar; becomes a literal in every expression
    if n == 0:
        e.unpersist()
        verts.unpersist()
        return verts.withColumn("pr", F.lit(0).cast("long"))

    deg = e.groupBy("src").agg(F.count("*").alias("deg")).persist()
    base = ((damping_den - damping_num) * SCALE // damping_den) // n

    ranks = verts.withColumn(
        "pr", F.lit(SCALE // n).cast("long")
    ).localCheckpoint()
    for _ in range(n_iter):
        shares = (
            ranks.join(deg, ranks["v"] == deg["src"])
            .select(
                F.col("v").alias("u"), F.expr("pr DIV deg").alias("share")
            )
        )
        csum = (
            e.join(shares, F.col("src") == F.col("u"))
            .groupBy("dst")
            .agg(F.sum("share").alias("csum"))
            .withColumnRenamed("dst", "v")
        )
        dang = (
            ranks.join(deg, ranks["v"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0)).alias("dang"))
        )
        nxt = (
            ranks.select("v")
            .join(csum, "v", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "v",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * (COALESCE(csum, 0L)"
                        f" + dang DIV {n})) DIV {damping_den}"
                    )
                ).cast("long").alias("pr"),
            )
            .localCheckpoint()  # eager: truncate lineage every round
        )
        ranks = nxt

    out = ranks.select("v", "pr")
    e.unpersist()
    deg.unpersist()
    verts.unpersist()
    return out


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    per_vertex: bool = False,
) -> DataFrame:
    """Count triangles in the undirected graph induced by ``edges``
    (direction, duplicates and self-loops are normalized away).

    Returns one row (n_triangles, n_edges, n_vertices) — or, with
    ``per_vertex=True``, (vertex, n_triangles) counting each triangle
    at all three corners.

    Scale shape: the naive wedge join explodes at hub vertices (a
    celebrity entity with 10^6 sameAs/depicts edges contributes 10^12
    wedges).  The standard fix is DEGREE ORIENTATION (Suri-Vassilvitskii
    "Counting Triangles and the Curse of the Last Reducer", WWW'11):
    direct every edge from its (degree, id)-smaller endpoint to the
    larger, making out-degree <= sqrt(2|E|) for every vertex, so the
    wedge self-join is bounded by |E|^1.5 total — no hub blowup, no
    salting needed.  The plan is: one groupBy for degrees, two
    broadcast-or-shuffle equi-joins to attach endpoint degrees, one
    self-join on the wedge apex, one equi-join to close wedges against
    the oriented edge set.  All equi-joins on ids — AQE handles the
    residual skew.

    Deterministic (pure integer/set logic), so any engine agrees on
    the exact result: driver query `triangle_count_graph` checks the
    full output against a DuckDB ordered-join oracle.
    """
    a, b = F.col(src), F.col(dst)
    # canon, deg and oriented each feed several consumers below, and
    # Catalyst does not reuse exchanges across differently-aliased
    # references — without materialization the edge input is rescanned
    # ~18x (plan-audited).  Eager localCheckpoints bound it to one
    # normalization pass + one degree pass + one orientation pass.
    canon = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        canon.select(F.col("u").alias("x"))
        .unionAll(canon.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint()
    )
    # orient u->v iff (deg(u), u) < (deg(v), v): total order, so the
    # two out-neighbors of a wedge apex are themselves ordered.
    du = deg.select(F.col("x").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("deg").alias("dv"))
    withdeg = canon.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = withdeg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("d"),
        F.when(fwd, F.struct("dv", "v")).otherwise(
            F.struct(F.col("du").alias("dv"), F.col("u").alias("v"))
        ).alias("dord"),  # (deg, id) order key of the head endpoint
    ).localCheckpoint()
    e1 = oriented.select(
        F.col("s").alias("apex"), F.col("d").alias("b"), F.col("dord").alias("ob")
    )
    e2 = oriented.select(
        F.col("s").alias("apex"), F.col("d").alias("c"), F.col("dord").alias("oc")
    )
    wedges = e1.join(e2, "apex").filter(F.col("ob") < F.col("oc"))
    closing = oriented.select(
        F.col("s").alias("b"), F.col("d").alias("c")
    )
    tris = wedges.join(closing, ["b", "c"]).select("apex", "b", "c")
    if per_vertex:
        return (
            tris.select(F.explode(F.array("apex", "b", "c")).alias("vertex"))
            .groupBy("vertex")
            .agg(F.count("*").alias("n_triangles"))
        )
    return tris.agg(F.count("*").alias("n_triangles")).crossJoin(
        canon.agg(
            F.count("*").alias("n_edges"),
        )
    ).crossJoin(deg.agg(F.count("*").alias("n_vertices")))


def property_path(
    edges: DataFrame,
    start: str,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    include_start: bool = False,
) -> DataFrame:
    """SPARQL property-path reachability (``pred{1,k}`` — and ``pred*``
    with ``include_start=True``): nodes reachable from ``start`` in at
    most ``max_hops`` directed edge traversals, with the MINIMUM hop
    count.  The reference's SPARQL endpoint would answer this with a
    Virtuoso transitive pattern (graph.py:194-244 splices arbitrary
    patterns); over the triple table, pass
    ``triples.where(pred == P).select(subj.alias('src'), obj.alias('dst'))``.

    Returns (node:string, hops:int), ordered by nothing (caller sorts).

    Scale shape: layered frontier BFS — each hop is ONE equi-join of
    the current frontier against the edge list plus one anti-join
    against the visited set, both hash joins on the node key (the edge
    list keeps its partitioning across hops, so AQE reuses the
    exchange).  The frontier is localCheckpointed every hop: lineage
    stays O(1) and a hop's join never re-runs prior hops.  Visited
    grows to the reachable set — at 10^9-vertex scale that is the
    same O(|V|) state every distributed BFS carries; the anti-join is
    the bounded alternative to the exponential walk a recursive
    UNION ALL would do on cyclic graphs.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = edges.select(
        F.col(src).cast("string").alias("e_src"),
        F.col(dst).cast("string").alias("e_dst"),
    ).distinct()
    spark = edges.sparkSession
    frontier = spark.createDataFrame([(start,)], "node string").localCheckpoint()
    visited = frontier.withColumn("hops", F.lit(0)).localCheckpoint()
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["e_src"], "inner")
            .select(F.col("e_dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint()  # eager: truncate per-hop lineage
        )
        if nxt.isEmpty():
            break
        visited = visited.union(
            nxt.withColumn("hops", F.lit(h))
        ).localCheckpoint()
        frontier = nxt
    out = visited if include_start else visited.where(F.col("hops") > 0)
    return out.select("node", F.col("hops").cast("int").alias("hops"))


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """All (src, dst) pairs connected by a directed path — the
    materialized form of SPARQL ``pred+`` and the engine of rdfs11
    (subClassOf transitivity).  Path-doubling iteration: after round i
    the closure covers every path of length <= 2^i, so rounds =
    ceil(log2(longest simple path)) — each round is ONE self-equi-join
    on the node key + union + distinct, and localCheckpoint keeps the
    lineage O(1).  Safe on cycles (the distinct pair set is the
    fixpoint; self-pairs from cycles are kept — (C, C) means C sits on
    a cycle, mirroring SPARQL pred+ reaching itself)."""
    r = (
        edges.select(
            F.col(src).cast("string").alias("src"),
            F.col(dst).cast("string").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    n = r.count()
    for _ in range(max_iter):
        hop = r.select(F.col("src").alias("mid"), F.col("dst"))
        grown = (
            r.select("src", F.col("dst").alias("mid"))
            .join(hop, "mid")
            .select("src", "dst")
            .unionByName(r)
            .distinct()
            .localCheckpoint()
        )
        n2 = grown.count()
        r = grown
        if n2 == n:
            break
        n = n2
    return r


def rdfs_entail(
    triples: DataFrame,
    subclass_pred: str = "http://www.w3.org/2000/01/rdf-schema#subClassOf",
    type_pred: str = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
    max_iter: int = 30,
) -> DataFrame:
    """RDFS entailment materialization over a (subj, pred, obj) triple
    table — the forward-chaining pass a KG-construction pipeline runs
    after the write path so SPARQL consumers need no reasoner:

    * rdfs11: (C subClassOf D) . (D subClassOf E)  ->  (C subClassOf E)
    * rdfs9:  (x type C) . (C subClassOf D)        ->  (x type D)

    Returns ONLY the inferred triples (subj, pred, obj), already
    anti-joined against the input — append them through the catalog
    like any link-job output (idempotent by construction).

    Scale shape: the ontology (subClassOf rows) is tiny next to the
    instance data, so its closure is an iterated small self-join; the
    instance-side rdfs9 join streams the 10^12-row type slice once
    against a BROADCAST closure — no shuffle of the big table."""
    onto = triples.where(F.col("pred") == subclass_pred).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    closure = transitive_closure(onto, max_iter=max_iter).where(
        F.col("src") != F.col("dst")
    )
    inferred_sub = closure.select(
        F.col("src").alias("subj"),
        F.lit(subclass_pred).alias("pred"),
        F.col("dst").alias("obj"),
    )
    types = triples.where(F.col("pred") == type_pred).select(
        "subj", F.col("obj").alias("cls")
    )
    inferred_type = types.join(
        F.broadcast(closure.withColumnRenamed("src", "cls")), "cls"
    ).select(
        "subj", F.lit(type_pred).alias("pred"), F.col("dst").alias("obj")
    )
    return (
        inferred_sub.unionByName(inferred_type)
        .distinct()
        .join(
            triples.select("subj", "pred", "obj"),
            ["subj", "pred", "obj"],
            "left_anti",
        )
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over an undirected graph — (id, community) with
    community = the label that survives ``n_iter`` fixed rounds.  The
    graph-side blocking complement to the embedding-side clustering
    family (SemDeDup's k-means): near-duplicate/same-as edge graphs
    decompose into candidate communities without an all-pairs pass.

    Determinism (the property async/randomized LPA lacks): labels
    start as the node's own id; every round is SYNCHRONOUS and each
    node adopts the most frequent label among its neighbors with ties
    broken by MINIMUM label, isolated nodes keep their label, and the
    round count is FIXED — so the result is a pure function of the
    edge set, bit-identical at any partitioning, and a fixed-depth
    DuckDB CTE chain replays it exactly (the driver oracle).

    Scale shape: each round is one hash join (labels onto the
    symmetrized edge list, shuffle keyed by node id), one
    (node, label) count aggregation with map-side combine, and one
    two-stage argmax (max count per node -> min label at that count) —
    no windows over the whole graph, no driver-side state; lineage is
    cut per round (the CC/k-means loop discipline).
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("community", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(n_iter):
        neigh = sym.join(
            labels.select(
                F.col("id").alias("b"), F.col("community").alias("nl")
            ),
            "b",
        )
        counts = neigh.groupBy("a", "nl").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        best_cnt = counts.groupBy("a").agg(F.max("cnt").alias("cnt"))
        new = (
            counts.join(best_cnt, ["a", "cnt"])
            .groupBy("a")
            .agg(F.min("nl").alias("community"))
            .select(F.col("a").alias("id"), "community")
        )
        # isolated-in-this-view nodes cannot occur (labels' domain is
        # sym's node set and every node has >= 1 neighbor there), so
        # `new` covers the full domain each round
        labels = new.localCheckpoint()
    return labels


def common_neighbors(
    edges: DataFrame,
    min_common: int = 1,
    max_degree: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Common-neighbor / Jaccard link prediction over the undirected
    graph induced by ``edges`` — (u, v, n_common, deg_u, deg_v,
    jaccard_num, jaccard_den) for every NON-adjacent candidate pair
    with at least ``min_common`` shared neighbors, u < v.  The classic
    same-as candidate generator: two entities sharing many neighbors
    in the depicts/sameAs graph are merge candidates the exact-match
    pass can't see.

    Jaccard rides as an integer numerator/denominator pair
    (|N(u)∩N(v)| and |N(u)∪N(v)| = deg_u + deg_v − n_common) so the
    output is engine-exact; callers divide when they want the float.

    Scale shape: the wedge self-join around each shared neighbor is
    the whole cost, and a hub apex of degree d contributes d² pairs —
    the last-reducer curse (same as triangle counting, WWW'11).
    ``max_degree`` caps which nodes may act as the SHARED NEIGHBOR:
    apexes above the cap are excluded before the self-join, an
    explicit, oracle-mirrored approximation (the minhash bucket-cap
    convention) — a node connected to everything carries no linking
    signal anyway.  Default None = exact.  All joins are hash
    equi-joins; counts aggregate with map-side combine.
    """
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    a, b = F.col(src), F.col(dst)
    # null/self-loop filter applies AFTER the union so BOTH directed
    # halves are cleaned (self-loops are common in sameAs graphs);
    # matches label_propagation/bfs_levels and the driver oracle.
    sym = (
        edges.select(a.alias("n"), b.alias("x"))
        .unionByName(edges.select(b.alias("n"), a.alias("x")))
        .where(
            F.col("n").isNotNull()
            & F.col("x").isNotNull()
            & (F.col("n") != F.col("x"))
        )
        .distinct()
        .localCheckpoint()
    )
    deg = sym.groupBy("x").agg(F.count(F.lit(1)).alias("deg"))
    apex = sym
    if max_degree is not None:
        heavy = (
            sym.groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") > max_degree)
            .select("n")
        )
        apex = sym.join(heavy, "n", "left_anti")
    pairs = (
        apex.select("n", F.col("x").alias("u"))
        .join(apex.select("n", F.col("x").alias("v")), "n")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    # link PREDICTION: drop pairs that are already edges
    pairs = pairs.join(
        sym.select(F.col("n").alias("u"), F.col("x").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    du = deg.select(F.col("x").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("x").alias("v"), F.col("deg").alias("deg_v"))
    return (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "n_common",
            "deg_u",
            "deg_v",
            F.col("n_common").alias("jaccard_num"),
            (F.col("deg_u") + F.col("deg_v") - F.col("n_common"))
            .alias("jaccard_den"),
        )
    )


def bfs_levels(
    edges: DataFrame,
    source: str,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """Minimum hop distance from ``source`` to every reachable node
    within ``max_hops`` — (id, level), level 0 = the source itself.
    property_path answers "which pairs are reachable"; this answers
    "HOW FAR", the primitive behind entity-relatedness queries
    ("how are X and Y connected") over the emitted KG.

    Deterministic by construction (min-hop is unique), so a recursive
    CTE replays it exactly (the driver oracle).

    Scale shape: classic frontier expansion — per hop one hash
    equi-join of the frontier against the edge list plus one anti-join
    against the visited set, lineage cut per hop; the only driver-side
    values are one frontier-size scalar per hop (early stop), bounded
    by ``max_hops``.  At diameter-heavy graphs use property_path's
    path-doubling instead (O(log d) rounds); BFS is the right shape
    when ``max_hops`` is small, which relatedness queries are.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    a, b = F.col(src), F.col(dst)
    e = edges.where(a.isNotNull() & b.isNotNull()).select(
        a.alias("n"), b.alias("x")
    )
    if not directed:
        e = e.unionByName(
            edges.select(b.alias("n"), a.alias("x"))
        )
    e = e.where(F.col("n") != F.col("x")).distinct().localCheckpoint()

    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(source, 0)], "id string, level int"
    ).localCheckpoint()
    frontier = visited.select("id")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["id"] == e["n"])
            .select(F.col("x").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("level", F.lit(h))
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("id")
    return visited
