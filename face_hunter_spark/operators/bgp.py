"""Basic-graph-pattern matching over the triple table — the declarative
analogue of the reference's SPARQL query surface.

The reference templates SPARQL basic graph patterns against Virtuoso
(src/kg/graph.py:194-244: the user's triple patterns are spliced into a
SELECT template; api/api.py:81-97 exposes that over HTTP).  SparkHunter
already offers the raw-SQL escape hatch (``hunter.sql``, one self-join
per pattern written BY HAND); this module closes the gap by compiling a
pattern list into that self-join plan automatically:

    graph_pattern(triples, [
        ("?v", NS["hunter_has_scene"], "?s"),
        ("?s", NS["sdo_depicts"],      "?e"),
    ])                       # -> DataFrame(v, s, e)

Terms: a string starting with ``?`` is a variable; ``None`` is an
anonymous wildcard (matches anything, binds nothing); any other string
is a constant matched against the column value (URIs and literals look
the same here — the triple table stores both in ``obj``).

Scale shape (10^12 triples): each pattern compiles to constant
equality filters directly on the scan — Catalyst pushes them into the
parquet reader, and because the committed table is bucketed by doc_id
(triples.with_partitioning) subject-chained patterns co-locate.  The
patterns are joined most-constrained-first (more constants = smaller
side first), every join is a hash equi-join on the shared variables
(never a theta join), and a pattern sharing no variable with the
accumulated plan raises by default instead of silently emitting a
10^12 x 10^12 cross product (``allow_cartesian=True`` opts in).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_POS = ("subj", "pred", "obj")

# Separator the SPARQL path expander (sparql._expand_paths) embeds in
# its synthetic closure predicates.  Those triples exist only so a
# rewritten pattern can match its closure under a constant key; a
# VARIABLE in predicate position must never bind one (a user's
# ``?s ?p ?o`` alongside a ``pred+`` pattern would otherwise leak
# engine-internal rows).
PATH_SYNTH_SEP = "\x1f"


def _is_var(term) -> bool:
    # exact-type check: parsed literals arrive as a str SUBCLASS
    # (sparql.Lit), so a literal whose lexical form happens to start
    # with '?' is matched as a constant, never treated as a variable
    return type(term) is str and term.startswith("?")


def _compile_pattern(triples: DataFrame, pattern, idx: int) -> tuple:
    """One triple pattern -> (DataFrame with one column per bound
    variable, frozenset of its variable names)."""
    if len(pattern) != 3:
        raise ValueError(f"pattern {idx} must be (subj, pred, obj): {pattern!r}")
    df = triples
    bound: dict[str, str] = {}  # var -> first position that binds it
    for pos, term in zip(_POS, pattern):
        if term is None:
            continue
        if _is_var(term):
            var = term[1:]
            if not var:
                raise ValueError(f"pattern {idx}: bare '?' is not a variable")
            if var in bound:
                # repeated variable inside one pattern = equality
                df = df.where(F.col(bound[var]) == F.col(pos))
            else:
                bound[var] = pos
            if pos == "pred":
                # synthetic closure triples are engine-internal: a
                # predicate variable binds asserted predicates only
                df = df.where(
                    ~F.col("pred").contains(PATH_SYNTH_SEP)
                )
        else:
            df = df.where(F.col(pos) == F.lit(term))
    if bound:
        out = df.select(
            *(F.col(pos).alias(var) for var, pos in bound.items())
        )
    else:
        # all-constant (ASK-style) pattern: keeps the result iff the
        # triple exists; a broadcast 1-row marker, dropped after the join
        out = df.limit(1).select(F.lit(1).alias(f"_exists_{idx}"))
    return out, frozenset(bound)


def graph_pattern(
    triples: DataFrame,
    patterns,
    select: list[str] | None = None,
    distinct: bool = False,
    allow_cartesian: bool = False,
    optional=None,
    filters=None,
    optional_filters=None,
) -> DataFrame:
    """Match a list of (subj, pred, obj) patterns against a triple
    DataFrame (columns ``subj``, ``pred``, ``obj``; extra columns are
    ignored) and return one row per variable binding.

    ``select`` projects (and orders) the output variables; default is
    every variable, sorted.  ``distinct=True`` applies SPARQL
    ``SELECT DISTINCT`` semantics; the default keeps duplicate
    bindings, matching SPARQL's bag semantics.

    ``optional`` is a list of pattern GROUPS (each a list of patterns,
    or a single pattern tuple); each group is matched like ``patterns``
    and then LEFT-joined onto the required plan on the shared variables
    — SPARQL ``OPTIONAL{...}`` (the reference's templates use it for
    names: knowledge_graphs.py:103,123).  Unmatched optional variables
    come back NULL.  An optional group must share at least one variable
    with the required patterns (otherwise it would be a cross product).

    ``filters`` is a list of SQL boolean expressions over variable
    names, applied after all joins — SPARQL ``FILTER(...)``
    (knowledge_graphs.py:45-46,104).  Expressed declaratively so
    Catalyst pushes each predicate as deep as join semantics allow
    (below the joins for required vars, post-join where an optional
    NULL is observable) — no hand-scheduling.

    ``optional_filters`` is a list aligned with ``optional``: the g-th
    entry is a list of SQL boolean expressions belonging INSIDE the
    g-th OPTIONAL group — SPARQL's ``LeftJoin(P1, P2, F)``, where the
    filter joins the left-join CONDITION: a left row whose every
    candidate extension fails F is kept unextended (NULL-padded), NOT
    dropped.  Implemented by renaming the group's shared columns and
    folding F into the join's ON expression — one left join, same
    physical shape as the unfiltered form; the filter may reference
    outer variables (they resolve to the left side unambiguously
    because the group's shared columns are renamed away).
    """
    if not patterns:
        raise ValueError("need at least one pattern")
    compiled = [
        _compile_pattern(triples, p, i) for i, p in enumerate(patterns)
    ]
    plan, bound = _join_compiled(compiled, allow_cartesian)

    for g, group in enumerate(optional or []):
        if isinstance(group, DataFrame):
            # pre-evaluated group bindings (e.g. a UNION inside
            # OPTIONAL, assembled by the SPARQL layer): left-join the
            # DataFrame as a unit — LeftJoin(P1, B ∪ C).  Hidden
            # __exists_* marker columns (EXISTS inside the group's
            # LeftJoin-condition filter) are not variables: they feed
            # the folded join condition and drop after the join.
            gplan, gvars = group, set(group.columns)
            hidden = sorted(
                c for c in gvars if c.startswith("__exists_")
            )
            gvars = gvars - set(hidden)
        else:
            hidden = []
            if isinstance(group, tuple):
                group = [group]
            if not group:
                raise ValueError(f"optional group {g} is empty")
            gcompiled = [
                _compile_pattern(triples, p, f"opt{g}_{i}")
                for i, p in enumerate(group)
            ]
            gplan, gvars = _join_compiled(
                gcompiled, allow_cartesian=False
            )
        shared = sorted(bound & gvars)
        if not shared:
            raise ValueError(
                f"optional group {g} shares no variable with the "
                "required patterns — OPTIONAL must be correlated"
            )
        if not gvars - bound:
            raise ValueError(
                f"optional group {g} binds no new variable — use a "
                "required pattern (or drop it) instead"
            )
        gfilters = (
            list(optional_filters[g])
            if optional_filters and g < len(optional_filters)
            and optional_filters[g]
            else []
        )
        if not gfilters:
            plan = plan.join(gplan, on=shared, how="left")
            if hidden:
                plan = plan.drop(*hidden)
        else:
            # LeftJoin(P1, P2, F): rename the group's shared columns so
            # every name resolves unambiguously, then fold the equality
            # keys AND the filter into the join condition — unmatched
            # (or all-extensions-fail-F) left rows survive NULL-padded
            ren = {v: f"__optf{g}__{v}" for v in shared}
            gp = gplan
            for v, r in ren.items():
                gp = gp.withColumnRenamed(v, r)
            cond = None
            for v in shared:
                c = F.col(v) == F.col(ren[v])
                cond = c if cond is None else cond & c
            for e in gfilters:
                cond = cond & F.expr(e)
            plan = plan.join(gp, on=cond, how="left").drop(
                *ren.values(), *hidden
            )
        bound = bound | gvars

    for expr in filters or []:
        plan = plan.where(F.expr(expr))

    all_vars = bound
    if select is not None:
        missing = [v for v in select if v not in all_vars]
        if missing:
            raise ValueError(f"select names unbound variables: {missing}")
    out_cols = select if select is not None else sorted(all_vars)
    plan = plan.select(*out_cols)
    return plan.distinct() if distinct else plan


def construct(
    triples: DataFrame,
    patterns,
    template,
    optional=None,
    filters=None,
    optional_filters=None,
    allow_cartesian: bool = False,
    exclude_asserted: bool = False,
) -> DataFrame:
    """SPARQL ``CONSTRUCT`` analogue: match ``patterns`` (with the same
    ``optional``/``filters`` semantics as :func:`graph_pattern`), then
    instantiate every (subj, pred, obj) triple in ``template`` once per
    binding and return the resulting GRAPH — a distinct set of triples,
    per the SPARQL spec (a graph is a set, so CONSTRUCT dedups).

    Template terms are variables (``"?v"``) or constants; per the spec,
    a template triple whose instantiation contains an unbound (NULL)
    term — an unmatched OPTIONAL variable — is skipped for that binding,
    not emitted with a NULL.

    ``exclude_asserted=True`` anti-joins the result against the input
    triple table, returning only NOVEL triples — the natural form for a
    materialization job that appends inferences to the catalog
    idempotently (the same anti-join identity pipeline.py uses).

    Scale shape: the bindings plan (the expensive BGP self-join chain)
    executes ONCE — the templates are instantiated by exploding an
    array of per-template structs over the binding rows, not by
    unioning one projection per template (which would re-execute the
    join subtree once per template triple); the only added exchange is
    the distinct on the output triples, which set semantics require.
    """
    if not template:
        raise ValueError("need at least one template triple")
    bindings = graph_pattern(
        triples,
        patterns,
        select=None,
        distinct=False,
        allow_cartesian=allow_cartesian,
        optional=optional,
        optional_filters=optional_filters,
        filters=filters,
    )
    return construct_from_bindings(
        bindings,
        template,
        asserted=triples if exclude_asserted else None,
    )


def construct_from_bindings(
    bindings: DataFrame,
    template,
    asserted: DataFrame | None = None,
) -> DataFrame:
    """Instantiate a CONSTRUCT template once per binding row — the
    materialization half of :func:`construct`, exposed so callers that
    assemble the bindings through richer algebra (UNION variants,
    negation clauses, subqueries — operators/sparql.py) reuse the same
    single-explode plan.  ``asserted`` (a triple DataFrame) anti-joins
    the output to the novel triples only."""
    bound = set(bindings.columns)
    structs = []
    for t, tpl in enumerate(template):
        if len(tpl) != 3:
            raise ValueError(
                f"template {t} must be (subj, pred, obj): {tpl!r}"
            )
        cols = []
        for pos, term in zip(_POS, tpl):
            if term is None:
                raise ValueError(
                    f"template {t}: wildcard None is not allowed in a "
                    "CONSTRUCT template"
                )
            if _is_var(term):
                var = term[1:]
                if var not in bound:
                    raise ValueError(
                        f"template {t} uses unbound variable ?{var}"
                    )
                # all-lexical triple model: a non-string binding (an
                # aggregated count from a subquery, a BIND number)
                # materializes as its lexical form
                cols.append(F.col(var).cast("string").alias(pos))
            else:
                cols.append(F.lit(term).alias(pos))
        structs.append(F.struct(*cols))
    out = bindings.select(
        F.explode(F.array(*structs)).alias("_t")
    ).select("_t.subj", "_t.pred", "_t.obj")
    # drop instantiations with an unbound (NULL) term, then set-dedup
    out = out.where(
        F.col("subj").isNotNull()
        & F.col("pred").isNotNull()
        & F.col("obj").isNotNull()
    ).distinct()
    if asserted is not None:
        out = out.join(
            asserted.select("subj", "pred", "obj"),
            ["subj", "pred", "obj"],
            "left_anti",
        )
    return out


def ask(
    triples: DataFrame,
    patterns,
    optional=None,
    filters=None,
    optional_filters=None,
    allow_cartesian: bool = False,
) -> bool:
    """SPARQL ``ASK`` analogue: True iff at least one binding for
    ``patterns`` exists (same ``optional``/``filters`` semantics as
    :func:`graph_pattern` — the reference's exists-style checks,
    e.g. video_exists, compile to this form).

    Scale shape: the plan is capped with LIMIT 1 before the action, so
    Spark's incremental take() runs ONE partition first and stops at
    the first binding — a hit costs one scan task, not a full pass.
    """
    bindings = graph_pattern(
        triples,
        patterns,
        select=None,
        distinct=False,
        allow_cartesian=allow_cartesian,
        optional=optional,
        optional_filters=optional_filters,
        filters=filters,
    )
    return len(bindings.limit(1).take(1)) > 0


def describe(
    triples: DataFrame, node: str, inbound: bool = True
) -> DataFrame:
    """SPARQL ``DESCRIBE <node>`` analogue: every triple where ``node``
    is the subject and — with ``inbound=True``, the common
    concise-bounded-description reading — every triple where it is the
    object.  Output keeps the (subj, pred, obj) columns plus a
    ``direction`` column ('out' / 'in') so callers can split the star.

    Scale shape: two constant equality filters pushed into the scan
    (one pass each over the pruned column) unioned — no join, no
    shuffle; at 10^12 triples this is two pushed-predicate scans.
    """
    t = triples.select("subj", "pred", "obj")
    out = t.where(F.col("subj") == F.lit(node)).withColumn(
        "direction", F.lit("out")
    )
    if not inbound:
        return out
    inn = t.where(
        (F.col("obj") == F.lit(node)) & (F.col("subj") != F.lit(node))
    ).withColumn("direction", F.lit("in"))
    return out.unionByName(inn)


def describe_set(
    triples: DataFrame, nodes: DataFrame, col: str
) -> DataFrame:
    """:func:`describe` over a DISTRIBUTED node set (SPARQL
    ``DESCRIBE ?v WHERE {...}`` — operators/sparql.py): two left-semi
    hash joins pull the out-star (node as subject) and in-star (node
    as object, self-loops excluded like the single-node form) without
    collecting the nodes to the driver.

    Scale shape: the node set is usually small after DISTINCT, so AQE
    broadcasts the semi-join side; at worst it is two shuffled
    semi-joins keyed on subj/obj — never a driver collect."""
    t = triples.select("subj", "pred", "obj")
    n = (
        nodes.select(F.col(col).alias("__dn"))
        .where(F.col("__dn").isNotNull())
        .distinct()
        # the node set feeds BOTH semi joins — cut the lineage so the
        # binding plan (possibly a whole solution-algebra subtree)
        # executes once, not once per star direction
        .localCheckpoint(eager=False)
    )
    out = t.join(
        n, F.col("subj") == F.col("__dn"), "left_semi"
    ).withColumn("direction", F.lit("out"))
    inn = (
        t.where(F.col("subj") != F.col("obj"))
        .join(n, F.col("obj") == F.col("__dn"), "left_semi")
        .withColumn("direction", F.lit("in"))
    )
    return out.unionByName(inn)


def _join_compiled(compiled, allow_cartesian: bool):
    """Join a list of compiled (df, vars) patterns into one plan;
    returns (plan, bound_vars)."""
    # greedy most-constrained-first along the variable-sharing graph:
    # start from the pattern with the fewest variables (= most pushed
    # constants), then always extend with a connected pattern when one
    # exists — reordering never introduces a cross product the user's
    # order avoided; ties keep the original order
    remaining = sorted(
        range(len(compiled)),
        # all-constant markers sort LAST as a seed (a marker-only plan
        # has no variables to join on); among variable-bearing patterns
        # fewest-variables-first
        key=lambda i: (not compiled[i][1], len(compiled[i][1]), i),
    )
    plan, bound = compiled[remaining.pop(0)]
    while remaining:
        i = next(
            (j for j in remaining if bound & compiled[j][1]
             or not compiled[j][1]),
            remaining[0],
        )
        remaining.remove(i)
        df, vars_i = compiled[i]
        shared = sorted(bound & vars_i)
        if shared:
            plan = plan.join(df, on=shared, how="inner")
        elif not vars_i:
            # existence marker: tiny by construction, broadcast it
            plan = plan.crossJoin(F.broadcast(df))
        elif allow_cartesian:
            plan = plan.crossJoin(df)
        else:
            raise ValueError(
                f"pattern {i} shares no variable with the preceding "
                "patterns — this is a cross product; pass "
                "allow_cartesian=True if you really mean it"
            )
        bound = bound | vars_i
    return plan, bound
