"""Text-mention entity linking over interleaved documents — the text
twin of the face-linking pipeline.

The reference links MEDIA mentions (faces) to entities; an interleaved
corpus also carries text spans, and the north-star KG wants
(doc, schema.org/mentions, entity) edges for them.  Matching is exact
label matching after the package tokenization (`text.tokens`): an
entity label of L words matches wherever the span's word L-gram equals
the normalized label.

Shape at scale — this is NOT a substring scan against every label:

* The catalog (10^5-10^7 labels) groups by label word-count L.  For
  each distinct L (a handful: most labels are 1-3 words) the text
  spans are shingled at n=L (`text.shingles`, HOF-only, O(1) token
  re-use via _bind) and EQUI-joined on the gram string against the
  broadcast catalog slice.  Equi-join, not a contains() theta join —
  so no BroadcastNestedLoop, no per-label rescan, and hub labels are
  just hot keys an equi-join handles.
* Each L pass re-reads the exploded text spans (len(Ls) scans,
  bounded by the catalog's distinct label lengths, not its size).

Deterministic (pure tokenization + string equality), so a SQL oracle
replays it exactly (driver query `text_mentions`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..schemas import HOME_URI
from .spans import explode_spans
from .text import shingles, tokens
from .triples import _t

__all__ = ["link_text_mentions", "mention_triples", "SDO_MENTIONS"]

SDO_MENTIONS = "https://schema.org/mentions"


def link_text_mentions(
    documents: DataFrame,
    entity_catalog: DataFrame,
    label_col: str = "label",
    uri_col: str = "uri",
) -> DataFrame:
    """(doc_id, entity_uri, label, n_spans): documents whose text spans
    contain an entity label as a word-boundary phrase, with the count
    of distinct spans mentioning it.

    ``entity_catalog`` is the (label, uri) dim table; labels normalize
    through the package tokenization, so 'Ada  LOVELACE!' matches
    'ada lovelace'.  Empty/stopword-only labels are dropped.
    """
    cat = (
        entity_catalog.select(
            F.col(uri_col).alias("entity_uri"),
            F.col(label_col).alias("label"),
            F.concat_ws(" ", tokens(F.col(label_col))).alias("gram"),
        )
        .filter(F.col("gram") != "")
        .withColumn("L", F.size(F.split("gram", " ")))
        .distinct()
        # materialize once: the lengths collect + one broadcast per L
        # would otherwise each re-run the catalog normalization
        .localCheckpoint()
    )
    lengths = sorted(r["L"] for r in cat.select("L").distinct().collect())
    txt = explode_spans(documents).filter(
        (F.col("kind") == "text") & F.col("text").isNotNull()
    ).select("doc_id", "pos", "text")

    hits = None
    for L in lengths:
        grams = txt.select(
            "doc_id",
            "pos",
            F.explode(shingles(F.col("text"), n=L)).alias("gram"),
        )
        # shingles() collapses a span SHORTER than L words to one
        # whole-span gram; that gram has fewer than L words and must
        # not match an L-word label slice of different length
        part = grams.join(
            F.broadcast(cat.filter(F.col("L") == L).drop("L")), "gram"
        ).filter(F.size(F.split("gram", " ")) == L)
        hits = part if hits is None else hits.unionByName(part)
    if hits is None:
        return txt.select(
            "doc_id",
            F.lit(None).cast("string").alias("entity_uri"),
            F.lit(None).cast("string").alias("label"),
            F.lit(0).cast("long").alias("n_spans"),
        ).limit(0)
    return hits.groupBy("doc_id", "entity_uri", "label").agg(
        F.count_distinct("pos").alias("n_spans")
    )


def mention_triples(mentions: DataFrame) -> DataFrame:
    """(subj, pred, obj, obj_is_literal, obj_datatype, doc_id) rows:
    one (doc, sdo:mentions, entity) edge per linked mention — same
    shape as triples.video_triples, appendable through
    triples.with_partitioning into the committed table."""
    doc_uri = F.concat(F.lit(HOME_URI), F.col("doc_id"))
    return mentions.select(
        F.inline(
            F.array(_t(doc_uri, SDO_MENTIONS, F.col("entity_uri")))
        ),
        "doc_id",
    )
