"""TransE KG-embedding training over the emitted triple table —
integer-exact, bit-reproducible at any parallelism.

The pipeline's output (subj, pred, obj) table is the input to
knowledge-graph embedding training (Bordes et al., NeurIPS'13:
score(h, r, t) = ||h + r - t||, trained with margin-ranking loss
against corrupted tails).  operators/negatives.py already generates
the filtered corrupted tails; this module closes the loop with the
training step itself, designed like operators/cluster.py's k-means:
ALL arithmetic stays in 64-bit integers — md5-derived integer init,
L1 distance, sign (∈ {-1,0,1}) subgradients, lr=1 updates — so every
aggregation is an order-independent integer sum and the result is
bit-identical at any partitioning and replayable in DuckDB as an exact
oracle.  (Float TransE makes sums order-dependent; the integer form
trades step-size granularity for verifiable distributed correctness —
production would widen lr/init ranges, same plan shape.)

One epoch, per (positive, corruption) pair with margin violation
(margin + d_pos - d_neg > 0), L1 subgradients:

    c_pos = h + r - t        c_neg = h + r - t'
    grad_h = grad_r = sign(c_pos) - sign(c_neg)
    grad_t = -sign(c_pos)    grad_t' = +sign(c_neg)

Scale shape (10^12 triples, 10^8 entities): parameter tables are
DataFrames keyed by id — the DataFrame form of a parameter-server
shard.  Per-example compute (distances, signs) is scan-stage array
math after four hash equi-joins against the parameter tables (AQE
broadcasts them while they fit).  Gradients flatten to COO rows
(kind, id, dim_idx, g) — the standard sparse-gradient exchange — with
map-side partial sums on the groupBy; reassembly is one more groupBy
on (kind, id) with an array_sort (deterministic: dim_idx is unique
within a group).  The update is a left join on the parameter table.
No collect, no driver-side loops; epochs chain by passing the returned
tables back in.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .negatives import _HEX_CHARS, _SEP, indexed_vocabulary

__all__ = [
    "init_embeddings",
    "transe_epoch",
    "score_triples",
    "link_prediction_ranks",
    "link_prediction_eval",
]


def _md5_int(*cols) -> "F.Column":
    """The repo's md5→int convention (operators/negatives.py:36): first
    15 hex chars = 60 bits, always positive in a signed 64-bit int, and
    DuckDB replays it as ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(_SEP, *cols)), 1, _HEX_CHARS),
        16,
        10,
    ).cast("long")


def init_embeddings(
    nodes: DataFrame,
    col: str,
    dim: int,
    modulus: int = 7,
    shift: int = 3,
    salt: str = "emb",
) -> DataFrame:
    """Deterministic integer init: (id, emb array<long>) with
    component i = md5int(salt␟id␟i) % modulus - shift — i.i.d.-ish
    values in [-shift, modulus - shift), content-keyed so the table is
    identical on any engine/partitioning (no RNG state)."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    d = nodes.select(F.col(col).cast("string").alias("id")).where(
        F.col("id").isNotNull()
    ).distinct()
    return d.select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: _md5_int(F.lit(salt), F.col("id"), i.cast("string"))
            % modulus
            - shift,
        ).alias("emb"),
    )


def _l1(arr) -> "F.Column":
    return F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
    )


def _sign(arr) -> "F.Column":
    return F.transform(arr, lambda x: F.signum(x).cast("long"))


def transe_epoch(
    triples: DataFrame,
    dim: int = 8,
    k_neg: int = 2,
    margin: int = 2,
    lr: int = 1,
    ent_emb: DataFrame | None = None,
    rel_emb: DataFrame | None = None,
    salt: str = "transe-e0",
    step: str = "sign",
    broadcast_vocab: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """One TransE training epoch over ``triples`` (subj, pred, obj).
    Returns the updated (entity_embeddings, relation_embeddings), each
    (id, emb array<long>).  Pass them back in (with a fresh ``salt``)
    to chain epochs; omit them to start from the deterministic init.

    Corrupted tails follow operators/negatives.py's content-keyed
    filtered protocol exactly — the i-th corruption of (s, p, o)
    replaces o with vocab[md5(salt␟s␟p␟o␟i) % |vocab|], corruptions
    that are true triples are dropped — but the positive tail is kept
    on the row (the hinge needs the (o, o') pair, which the standalone
    operator's output omits).

    ``step='sign'`` (default) updates each component by
    ``lr * sign(aggregated gradient)`` — signSGD (Bernstein et al.,
    ICML'18).  A full-batch epoch sums sign-subgradients over every
    violating pair, so a hub entity in P pairs accumulates components
    up to ±P: with integer embeddings a raw-sum step of that size
    destroys the solution (measured on the test fixture: loss 78→230).
    The sign clamp bounds every component's movement to ±lr per epoch,
    stays integral, and keeps the order-independence guarantee (the
    sum is exact before the sign).  ``step='sum'`` applies the raw
    summed gradient for callers who scale lr themselves.

    Known Spark 4.1 hazard for catalog-read inputs: the init tables'
    Project constraint (emb <=> transform(md5(id...))) survives
    localCheckpoint, and InferFiltersFromConstraints can remap it
    across this epoch's id-aliased joins into an unbindable filter
    ([INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND]).  training.run_transe_job
    disables spark.sql.constraintPropagation.enabled for the job's
    duration (see its comment for the root-cause analysis); set the
    same conf if you drive this operator directly over
    pipeline-emitted tables and hit that error."""
    if k_neg < 1:
        raise ValueError("k_neg must be >= 1")
    if step not in ("sign", "sum"):
        raise ValueError("step must be 'sign' or 'sum'")
    base = triples.select("subj", "pred", "obj").distinct()
    entities = (
        base.select(F.col("subj").alias("id"))
        .unionByName(base.select(F.col("obj").alias("id")))
        .distinct()
    )
    # each parameter table is consumed 4x (three role joins + the
    # update); when we derived it ourselves just above, cut once so the
    # init's distinct-shuffle doesn't re-run per consumer.  A
    # caller-provided table keeps the caller's plan (it may already be
    # a materialized catalog read).
    if ent_emb is None:
        ent_emb = init_embeddings(
            entities, "id", dim, salt="ent"
        ).localCheckpoint()
    if rel_emb is None:
        rel_emb = init_embeddings(
            base.select("pred"), "pred", dim, salt="rel"
        ).localCheckpoint()

    # --- corrupted tails (negatives.py protocol, obj kept) ------------
    vocab = indexed_vocabulary(entities, "id").localCheckpoint()
    n = vocab.count()
    spark = triples.sparkSession
    cand = base.crossJoin(
        F.broadcast(
            spark.range(k_neg).select(F.col("id").alias("neg_idx"))
        )
    ).withColumn(
        "idx",
        F.pmod(
            _md5_int(
                F.lit(salt),
                F.col("subj"),
                F.col("pred"),
                F.col("obj"),
                F.col("neg_idx").cast("string"),
            ),
            F.lit(n),
        ),
    )
    # broadcast fits to ~10^7 entities; pass broadcast_vocab=False at
    # 10^8+ so the idx lookup shuffles instead (same convention as
    # operators/negatives.py)
    v_tbl = F.broadcast(vocab) if broadcast_vocab else vocab
    pairs = (
        cand.join(v_tbl, "idx")
        .select("subj", "pred", "obj", F.col("value").alias("obj_neg"))
        .join(
            base.select(
                "subj", "pred", F.col("obj").alias("obj_neg")
            ).distinct(),
            ["subj", "pred", "obj_neg"],
            "left_anti",
        )
        # one gradient per distinct (pos, corruption) pair: two neg_idx
        # draws hitting the same tail must not double the step (and the
        # oracle's NOT EXISTS form dedups the same way)
        .distinct()
    )

    # --- per-pair subgradients (scan stage) ----------------------------
    def emb_as(df, key, out):
        return df.select(F.col("id").alias(key), F.col("emb").alias(out))

    j = (
        pairs.join(emb_as(ent_emb, "subj", "h"), "subj")
        .join(emb_as(rel_emb, "pred", "r"), "pred")
        .join(emb_as(ent_emb, "obj", "t"), "obj")
        .join(emb_as(ent_emb, "obj_neg", "tn"), "obj_neg")
    )
    cpos = F.zip_with(
        F.zip_with("h", "r", lambda a, b: a + b),
        "t",
        lambda a, b: a - b,
    )
    cneg = F.zip_with(
        F.zip_with("h", "r", lambda a, b: a + b),
        "tn",
        lambda a, b: a - b,
    )
    v = j.select(
        "subj",
        "pred",
        "obj",
        "obj_neg",
        _sign(cpos).alias("sp"),
        _sign(cneg).alias("sn"),
        (F.lit(margin) + _l1(cpos) - _l1(cneg) > 0).alias("viol"),
    ).where("viol")
    # the gradient flatten below consumes v FOUR times (one union
    # branch per parameter role); without a cut Catalyst re-executes
    # the whole corruption+join subtree per branch — the shared-subtree
    # rescan fixed the same way in graph.py/shacl.py.  v is small
    # relative to its inputs (violating pairs only, sign arrays).
    v = v.localCheckpoint()

    # --- COO gradient flatten + integer sums ---------------------------
    gh = F.zip_with("sp", "sn", lambda a, b: a - b)
    contrib = (
        v.select(F.lit("ent").alias("kind"),
                 F.col("subj").alias("id"), gh.alias("g"))
        .unionByName(
            v.select(F.lit("rel").alias("kind"),
                     F.col("pred").alias("id"), gh.alias("g"))
        )
        .unionByName(
            v.select(
                F.lit("ent").alias("kind"),
                F.col("obj").alias("id"),
                F.transform("sp", lambda x: -x).alias("g"),
            )
        )
        .unionByName(
            v.select(F.lit("ent").alias("kind"),
                     F.col("obj_neg").alias("id"), F.col("sn").alias("g"))
        )
    )
    flat = contrib.select(
        "kind", "id", F.posexplode("g").alias("i", "gi")
    )
    grads = (
        flat.groupBy("kind", "id", "i")
        .agg(F.sum("gi").alias("gi"))
        .groupBy("kind", "id")
        .agg(F.array_sort(F.collect_list(F.struct("i", "gi"))).alias("sg"))
        .select(
            "kind",
            "id",
            F.transform("sg", lambda s: s["gi"]).alias("grad"),
        )
    )

    # --- parameter update ----------------------------------------------
    def apply(emb_df: DataFrame, kind: str) -> DataFrame:
        g = grads.where(F.col("kind") == kind).select("id", "grad")
        if step == "sign":
            upd = lambda x, gr: x - F.lit(lr) * F.signum(gr).cast("long")
        else:
            upd = lambda x, gr: x - F.lit(lr) * gr
        return (
            emb_df.join(g, "id", "left")
            .select(
                "id",
                F.when(F.col("grad").isNull(), F.col("emb"))
                .otherwise(F.zip_with("emb", "grad", upd))
                .alias("emb"),
            )
        )

    return apply(ent_emb, "ent"), apply(rel_emb, "rel")


def link_prediction_ranks(
    test: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    filter_triples: DataFrame | None = None,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Filtered link-prediction ranks (Bordes'13 evaluation protocol):
    for each test (subj, pred, obj), the 1-based rank of the true tail
    among ALL entity candidates, skipping candidates that form a true
    triple in ``filter_triples`` (the 'filtered' setting — other
    correct answers don't count as errors).  Ties break by candidate
    id ascending (integer scores tie often; an UNDEFINED tie order
    would make the metric partitioning-dependent).  Returns
    (subj, pred, obj, rank:long).

    Scale shape: the test × entity fan-out is the evaluation protocol's
    inherent cost — test slices are small by construction; candidates
    arrive via one broadcast of the entity parameter table, hr = h + r
    is computed once per test row (not per candidate), and the rank is
    one groupBy over the candidate rows with map-side partial counts.
    """
    t = test.select("subj", "pred", "obj").distinct()
    hr_rows = (
        t.join(
            ent_emb.select(
                F.col("id").alias("subj"), F.col("emb").alias("h")
            ),
            "subj",
        )
        .join(
            rel_emb.select(
                F.col("id").alias("pred"), F.col("emb").alias("r")
            ),
            "pred",
        )
        .select(
            "subj",
            "pred",
            "obj",
            F.zip_with("h", "r", lambda a, b: a + b).alias("hr"),
        )
    )
    cand_tbl = ent_emb.select(
        F.col("id").alias("cand"), F.col("emb").alias("t")
    )
    # the candidate table broadcast fits to ~10^6-10^7 entities;
    # broadcast_candidates=False shuffles the fan-out instead (the
    # test x entity product is the protocol's inherent cost either way)
    cand = hr_rows.crossJoin(
        F.broadcast(cand_tbl) if broadcast_candidates else cand_tbl
    )
    dist = F.aggregate(
        F.zip_with("hr", "t", lambda a, b: a - b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.abs(x),
    )
    scored = cand.select("subj", "pred", "obj", "cand", dist.alias("s"))
    if filter_triples is not None:
        known = filter_triples.select(
            "subj", "pred", F.col("obj").alias("cand")
        ).distinct()
        scored = scored.join(
            known.alias("k"),
            (scored["subj"] == F.col("k.subj"))
            & (scored["pred"] == F.col("k.pred"))
            & (scored["cand"] == F.col("k.cand"))
            & (scored["cand"] != scored["obj"]),
            "left_anti",
        )
    true_s = scored.where(F.col("cand") == F.col("obj")).select(
        "subj", "pred", "obj", F.col("s").alias("s_true")
    )
    return (
        scored.join(true_s, ["subj", "pred", "obj"])
        .groupBy("subj", "pred", "obj")
        .agg(
            (
                F.lit(1)
                + F.sum(
                    F.when(
                        (F.col("cand") != F.col("obj"))
                        & (
                            (F.col("s") < F.col("s_true"))
                            | (
                                (F.col("s") == F.col("s_true"))
                                & (F.col("cand") < F.col("obj"))
                            )
                        ),
                        1,
                    ).otherwise(0)
                )
            ).cast("long").alias("rank")
        )
    )


def link_prediction_eval(
    test: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    filter_triples: DataFrame | None = None,
) -> DataFrame:
    """One-row summary of :func:`link_prediction_ranks` in exact
    integers — (n, sum_rank, mrr_micro, hits_1, hits_3, hits_10) with
    mrr_micro = Σ (1,000,000 div rank): reporting the float MR/MRR
    directly would make the value depend on float summation order
    across partitions; integer numerators are order-free and the
    caller divides by n once."""
    r = link_prediction_ranks(test, ent_emb, rel_emb, filter_triples)
    return r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rank").alias("sum_rank"),
        F.sum(F.expr("1000000 div rank")).alias("mrr_micro"),
        F.sum((F.col("rank") <= 1).cast("long")).alias("hits_1"),
        F.sum((F.col("rank") <= 3).cast("long")).alias("hits_3"),
        F.sum((F.col("rank") <= 10).cast("long")).alias("hits_10"),
    )


def score_triples(
    triples: DataFrame, ent_emb: DataFrame, rel_emb: DataFrame
) -> DataFrame:
    """L1 TransE score per (subj, pred, obj) row — lower is more
    plausible.  Three hash equi-joins + scan-stage array math."""
    j = (
        triples.select("subj", "pred", "obj")
        .join(
            ent_emb.select(F.col("id").alias("subj"),
                           F.col("emb").alias("h")),
            "subj",
        )
        .join(
            rel_emb.select(F.col("id").alias("pred"),
                           F.col("emb").alias("r")),
            "pred",
        )
        .join(
            ent_emb.select(F.col("id").alias("obj"),
                           F.col("emb").alias("t")),
            "obj",
        )
    )
    c = F.zip_with(
        F.zip_with("h", "r", lambda a, b: a + b),
        "t",
        lambda a, b: a - b,
    )
    return j.select("subj", "pred", "obj", _l1(c).alias("score"))
