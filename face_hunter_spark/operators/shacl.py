"""SHACL-lite shape validation over the triple table.

A KG-construction pipeline needs a data-quality gate on its OUTPUT the
same way a corpus pipeline gates its input: the reference's store
accepts any tuple (memory_store.py:48-54 ``insert`` does no checking),
so a pipeline bug silently materializes malformed triples.  This module
validates the committed graph against declarative shapes — the useful
core of W3C SHACL (sh:class on subject/object, sh:pattern,
sh:minCount/sh:maxCount) without the RDF-encoded shape graph.

Each shape is a dict::

    {"id": "scene-typed", "kind": "domain", "pred": HAS_SCENE,
     "cls": VIDEO_CLS}
    kinds:
      domain    — every subject of ``pred`` must be an instance of
                  ``cls`` (has an rdf:type triple)
      range     — every object of ``pred`` must be an instance of ``cls``
      pattern   — every object of ``pred`` must match the SQL LIKE
                  ``pattern``
      min_count — every instance of ``cls`` must have >= ``n`` distinct
                  ``pred`` values
      max_count — every instance of ``cls`` (or every subject of
                  ``pred`` when ``cls`` is omitted) must have <= ``n``
                  distinct ``pred`` values

The report has one row per violation: (shape_id, kind, focus, pred,
value) — ``focus`` is the non-conforming node, ``value`` the offending
object (domain/range/pattern) or the observed distinct-count rendered
as a string (min_count/max_count).

Scale shape (10^12 triples): the rdf:type sub-table is computed once
and every class check is a hash equi-join against it (anti-join for
domain/range, inner for the cardinality targets); pattern checks are
scan-stage filters; cardinality checks are one groupBy per shape on
(subj) with map-side partial counts.  No shape ever touches more than
its predicate's slice of the table, so Catalyst pushes the pred
equality into the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["validate", "RDF_TYPE"]

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_KINDS = ("domain", "range", "pattern", "min_count", "max_count")


def _report(shape_id: str, kind: str, df: DataFrame) -> DataFrame:
    return df.select(
        F.lit(shape_id).alias("shape_id"),
        F.lit(kind).alias("kind"),
        "focus",
        "pred",
        "value",
    )


def validate(
    triples: DataFrame, shapes, rdf_type: str = RDF_TYPE
) -> DataFrame:
    """Validate ``triples`` (columns subj, pred, obj) against a list of
    shape dicts; returns the violation report (empty = conformant).

    Deterministic: the report is a pure function of the graph, so it
    can be snapshotted next to the triples as a lineage artifact.
    """
    if not shapes:
        raise ValueError("need at least one shape")
    t = triples.select("subj", "pred", "obj")
    types = t.where(F.col("pred") == F.lit(rdf_type)).select(
        F.col("subj").alias("node"), F.col("obj").alias("cls")
    )
    # Every class-referencing shape joins against the rdf:type slice;
    # without a cut, Catalyst re-scans the full triple table once PER
    # shape (the unionByName keeps each branch's scan alive).  With >=2
    # consumers, materialize the slice once — same eager-checkpoint
    # pattern as graph.py's shared-subtree fix (plan-audited there at
    # 18x rescan).  One consumer: checkpointing is pure overhead, skip.
    n_cls_shapes = sum(
        1
        for s in shapes
        if s.get("kind") in ("domain", "range")
        or (s.get("kind") in ("min_count", "max_count") and s.get("cls"))
    )
    if n_cls_shapes >= 2:
        types = types.localCheckpoint()
    out = None
    for i, s in enumerate(shapes):
        kind = s.get("kind")
        if kind not in _KINDS:
            raise ValueError(f"shape {i}: unknown kind {kind!r}")
        shape_id = s.get("id", f"shape_{i}")
        pred = s.get("pred")
        if not pred:
            raise ValueError(f"shape {i} ({shape_id}): pred is required")
        slice_ = t.where(F.col("pred") == F.lit(pred))
        if kind in ("domain", "range"):
            cls = s.get("cls")
            if not cls:
                raise ValueError(f"shape {i} ({shape_id}): cls is required")
            node = "subj" if kind == "domain" else "obj"
            members = types.where(F.col("cls") == F.lit(cls)).select("node")
            bad = slice_.join(
                members, slice_[node] == members["node"], "left_anti"
            ).select(
                F.col("subj").alias("focus") if kind == "domain"
                else F.col("obj").alias("focus"),
                "pred",
                F.col("obj").alias("value"),
            )
            rep = _report(shape_id, kind, bad)
        elif kind == "pattern":
            pattern = s.get("pattern")
            if not pattern:
                raise ValueError(
                    f"shape {i} ({shape_id}): pattern is required"
                )
            rep = _report(
                shape_id,
                kind,
                slice_.where(~F.col("obj").like(pattern)).select(
                    F.col("subj").alias("focus"),
                    "pred",
                    F.col("obj").alias("value"),
                ),
            )
        else:  # min_count / max_count
            n = s.get("n")
            if n is None or n < 0:
                raise ValueError(
                    f"shape {i} ({shape_id}): n >= 0 is required"
                )
            counts = slice_.groupBy("subj").agg(
                F.count_distinct("obj").alias("_n")
            )
            cls = s.get("cls")
            if kind == "min_count":
                if not cls:
                    raise ValueError(
                        f"shape {i} ({shape_id}): min_count needs cls "
                        "(otherwise no focus set to check against)"
                    )
                members = types.where(
                    F.col("cls") == F.lit(cls)
                ).select("node").distinct()
                joined = members.join(
                    counts, members["node"] == counts["subj"], "left"
                ).select(
                    F.col("node").alias("focus"),
                    F.coalesce(F.col("_n"), F.lit(0)).alias("_n"),
                )
                bad = joined.where(F.col("_n") < F.lit(n))
            else:
                bad = counts.where(F.col("_n") > F.lit(n)).select(
                    F.col("subj").alias("focus"), "_n"
                )
                if cls:
                    members = types.where(
                        F.col("cls") == F.lit(cls)
                    ).select("node").distinct()
                    bad = bad.join(
                        members, bad["focus"] == members["node"], "left_semi"
                    )
            rep = _report(
                shape_id,
                kind,
                bad.select(
                    "focus",
                    F.lit(pred).alias("pred"),
                    F.col("_n").cast("string").alias("value"),
                ),
            )
        out = rep if out is None else out.unionByName(rep)
    return out
