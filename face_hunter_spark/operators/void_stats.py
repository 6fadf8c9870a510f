"""VoID dataset statistics over the triple table.

VoID (the W3C "Vocabulary of Interlinked Datasets") is how published
knowledge graphs describe themselves: dataset-level triple / distinct
subject / predicate / object counts, plus one "property partition" row
per predicate and one "class partition" row per rdf:type class.  The
reference's stores expose no statistics at all (a Virtuoso admin would
run these as SPARQL aggregates); here they are one-pass DataFrame aggs
a 10^12-triple deployment can actually afford.

Scale shape: ``summary`` with exact counts is three shuffles (one per
distinct column) — affordable as an occasional audit; pass
``approximate=True`` to replace the exact distincts with HLL sketches
(one pass, constant state, the same plan shape as operators/sketch.py).
``predicate_partitions`` / ``class_partitions`` are a single groupBy
with map-side partial aggregation; distinct-counts inside the predicate
partition use Spark's count_distinct expansion, still one exchange on
``pred``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .shacl import RDF_TYPE

__all__ = ["summary", "predicate_partitions", "class_partitions"]


def summary(triples: DataFrame, approximate: bool = False) -> DataFrame:
    """One row: (n_triples, n_subjects, n_predicates, n_objects) —
    void:triples / void:distinctSubjects / void:properties /
    void:distinctObjects.  ``approximate=True`` swaps the exact
    distinct counts for approx_count_distinct (HLL++, rsd 5%)."""
    d = F.approx_count_distinct if approximate else F.count_distinct
    return triples.agg(
        F.count(F.lit(1)).alias("n_triples"),
        d("subj").alias("n_subjects"),
        d("pred").alias("n_predicates"),
        d("obj").alias("n_objects"),
    )


def predicate_partitions(triples: DataFrame) -> DataFrame:
    """One row per predicate: (pred, n_triples, n_subjects, n_objects)
    — a void:propertyPartition with void:triples and the distinct
    subject/object counts of the predicate's slice."""
    return triples.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.count_distinct("subj").alias("n_subjects"),
        F.count_distinct("obj").alias("n_objects"),
    )


def class_partitions(
    triples: DataFrame, rdf_type: str = RDF_TYPE
) -> DataFrame:
    """One row per rdf:type class: (cls, n_instances) — a
    void:classPartition with void:entities (distinct typed nodes)."""
    return (
        triples.where(F.col("pred") == F.lit(rdf_type))
        .groupBy(F.col("obj").alias("cls"))
        .agg(F.count_distinct("subj").alias("n_instances"))
    )
