"""KG-embedding training job over the committed triple table.

The pipeline emits the knowledge graph; operators/transe.py trains
TransE embeddings on it one integer-exact epoch at a time.  This
module is the JOB shape around that operator — the analogue of
pipeline.run_link_job for the training side: read the committed
triples, chain N epochs (fresh content salt per epoch, lineage cut per
epoch), commit the embedding tables through the catalog, and report
filtered link-prediction metrics on a held-out content-keyed split.

Design notes:

* **Literal tails are excluded by default** — TransE embeds ENTITIES;
  a literal like "0:00:05"^^xsd:dateTime as a corruption target is
  noise (obj_is_literal is right there in the table; corpora without
  the column train on everything).
* **The split is content-keyed** (md5 of the triple), so train/test
  membership is stable under re-runs, partitioning, and corpus
  appends — the same determinism contract as corpus.hash_split.
* **Per-epoch localCheckpoint**: epochs chain the returned parameter
  tables; without cutting lineage each epoch's plan would nest the
  previous epoch's four joins + two groupBys (exponential plan
  growth, the k-means/CC loop discipline, operators/cluster.py).
* **Embeddings commit as catalog tables** (`transe_entity_emb`,
  `transe_rel_emb`) via copy-on-write overwrite — a training run
  REPLACES the artifact (an append would union stale epochs on read);
  downstream scoring joins them by id (operators/transe.score_triples).
* **Metrics are exact integers** (sum_rank / mrr_micro / hits@k
  numerators, link_prediction_eval) — the derived float means are
  computed once driver-side from those integers, so the reported
  numbers are bit-stable at any parallelism.
"""

from __future__ import annotations

import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .operators.negatives import _HEX_CHARS, _SEP
from .operators.transe import (
    link_prediction_eval,
    transe_epoch,
)

__all__ = ["run_transe_job"]

ENT_TABLE = "transe_entity_emb"
REL_TABLE = "transe_rel_emb"


def _split_bucket(cols) -> "F.Column":
    """Content-keyed bucket in [0, 100) — md5-prefix integer mod 100,
    the repo's hash-split convention (DuckDB-replayable)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(_SEP, *cols)), 1, _HEX_CHARS),
            16,
            10,
        ).cast("long")
        % 100
    )


def run_transe_job(
    spark: SparkSession,
    catalog,
    table: str = "triples",
    epochs: int = 2,
    dim: int = 8,
    k_neg: int = 2,
    margin: int = 2,
    lr: int = 1,
    step: str = "sign",
    eval_pct: int = 10,
    include_literals: bool = False,
    run_id: str | None = None,
    salt_prefix: str = "transe",
) -> dict:
    """Train TransE on the committed triple table and commit the
    embedding tables.  Returns a stats dict (counts, snapshots,
    integer eval numerators + derived means)."""
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    if not (0 <= eval_pct < 100):
        raise ValueError("eval_pct must be in [0, 100)")
    run_id = run_id or "transe-" + uuid.uuid4().hex[:8]
    t0 = time.time()

    # Spark 4.1 workaround (root-caused from the physical plan):
    # init_embeddings' Project gives Catalyst the constraint
    # ``emb <=> transform(..., md5(...id...))``; localCheckpoint's
    # LogicalRDD PRESERVES that constraint, and
    # InferFiltersFromConstraints then remaps it across the epoch's
    # id-aliased equi-joins into a filter over the checkpointed emb
    # scan that still references the OTHER side's attribute —
    # [INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND] "Could not find subj#1 in
    # [id, emb]" (observed as plan node `Filter (transform(...)
    # <=> emb)` directly above `Scan ExistingRDD [id, emb]`).
    # Whether the invalid inferred filter appears is alias-/plan-
    # shape-dependent: it reproduced deterministically on
    # pipeline-emitted catalog tables and never on flat/local test
    # inputs.  Constraint propagation off for the job's duration is
    # the verified fix (3/3 fresh sessions on the failing input);
    # every action of the job (checkpoints, commits, eval collect)
    # happens inside the guarded region and each epoch's outputs are
    # materialized, so no lazy plan escapes it.  The optimization is
    # worth ~nothing here anyway: every shared subtree is already
    # explicitly checkpointed and every join key is already
    # null-filtered.
    cp_key = "spark.sql.constraintPropagation.enabled"
    prior = spark.conf.get(cp_key, None)
    spark.conf.set(cp_key, "false")
    try:
        return _run_transe_job_inner(
            spark, catalog, table, epochs, dim, k_neg, margin, lr,
            step, eval_pct, include_literals, run_id, salt_prefix, t0,
        )
    finally:
        if prior is None:
            spark.conf.unset(cp_key)
        else:
            spark.conf.set(cp_key, prior)


def _run_transe_job_inner(
    spark, catalog, table, epochs, dim, k_neg, margin, lr, step,
    eval_pct, include_literals, run_id, salt_prefix, t0,
) -> dict:
    full = catalog.read(spark, table)
    g = full.select("subj", "pred", "obj")
    if not include_literals and "obj_is_literal" in full.columns:
        g = full.where(~F.coalesce("obj_is_literal", F.lit(False))).select(
            "subj", "pred", "obj"
        )
    # graph-set semantics: duplicate rows would double their gradients
    g = g.distinct()

    bucket = _split_bucket([F.col("subj"), F.col("pred"), F.col("obj")])
    train = g.where(bucket >= F.lit(eval_pct)) if eval_pct else g
    test = g.where(bucket < F.lit(eval_pct)) if eval_pct else None
    # one materialization: the epoch loop re-reads train `epochs`
    # times (4 joins + corruption expansion each) and the filtered
    # eval protocol re-reads the full graph
    train = train.localCheckpoint()
    n_train = train.count()
    if n_train == 0:
        raise ValueError(
            f"no trainable triples in {table!r} "
            "(all literal-tailed? pass include_literals=True)"
        )

    ent = rel = None
    for e in range(epochs):
        ent, rel = transe_epoch(
            train,
            dim=dim,
            k_neg=k_neg,
            margin=margin,
            lr=lr,
            ent_emb=ent,
            rel_emb=rel,
            salt=f"{salt_prefix}-e{e}",
            step=step,
        )
        # cut lineage: epoch N+1's plan must not nest epoch N's
        ent = ent.localCheckpoint()
        rel = rel.localCheckpoint()

    snap_ent = catalog.overwrite(ENT_TABLE, ent, run_id)
    snap_rel = catalog.overwrite(REL_TABLE, rel, run_id)

    stats = {
        "run_id": run_id,
        "epochs": epochs,
        "dim": dim,
        "k_neg": k_neg,
        "step": step,
        "n_train": n_train,
        "n_entities": ent.count(),
        "n_relations": rel.count(),
        "snapshot_ent": snap_ent,
        "snapshot_rel": snap_rel,
        "eval": None,
        "wall_s": None,
    }
    if test is not None:
        n_test_split = test.count()
        row = link_prediction_eval(
            test, ent, rel, filter_triples=g
        ).collect()[0]
        if row.n:
            # no silent caps: ranks exist only for test triples whose
            # head/tail/relation appear in TRAIN (the embeddings join
            # is inner); report how many split rows were skipped as
            # unseen instead of quietly shrinking the denominator
            stats["eval"] = {
                "n": row.n,
                "n_test_split": n_test_split,
                "n_skipped_unseen": n_test_split - row.n,
                "sum_rank": row.sum_rank,
                "mrr_micro": row.mrr_micro,
                "hits_1": row.hits_1,
                "hits_3": row.hits_3,
                "hits_10": row.hits_10,
                # derived once, driver-side, from exact integers
                "mean_rank": row.sum_rank / row.n,
                "mrr": row.mrr_micro / 1_000_000 / row.n,
            }
    stats["wall_s"] = round(time.time() - t0, 3)
    return stats


def load_embeddings(
    spark: SparkSession, catalog
) -> tuple[DataFrame, DataFrame]:
    """The committed (entity, relation) embedding tables of the last
    training run — join-ready inputs for transe.score_triples /
    link_prediction_ranks."""
    ent = catalog.read(spark, ENT_TABLE)
    rel = catalog.read(spark, REL_TABLE)
    if "snap" in ent.columns:
        ent = ent.drop("snap")
    if "snap" in rel.columns:
        rel = rel.drop("snap")
    return ent, rel
