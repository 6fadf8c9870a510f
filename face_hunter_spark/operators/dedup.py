"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.

Scale design notes (the point of each physical shape):

* exact        — one groupBy on a 16-byte fingerprint; map-side
                 combine makes this shuffle tiny regardless of corpus.
* jaccard      — NEVER a cross join: an inverted-index equi-join on
                 shingles yields only pairs that share >= 1 shingle,
                 then |A∩B| falls out of a count per pair.
* minhash LSH  — band buckets bound the candidate set; each doc lands
                 in exactly `bands` buckets, so shuffle volume is
                 O(bands * N), independent of pair count.  Shingles are
                 hashed once to 60-bit ints (md5 prefix), then the
                 signature is a universal-hash family over those ints —
                 one md5 pass total, int arrays (not strings) on the
                 wire, engine-portable (the DuckDB oracle regenerates
                 the identical constants and signatures).  The md5-hex
                 string variant (`minhash_signature`) is kept for
                 API/teaching parity.
* simhash      — 32-bit fingerprints via token-hash bit voting; near-
                 dup candidates via 8-bit band equality (any pair at
                 hamming distance <= 3 shares at least one of 4 bands),
                 verified with bit_count(xor).
* embedding    — exact cosine over blocked pairs (see similarity.py
                 for the ANN path).

All built-in expressions; no Python workers anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .text import doc_fingerprint, shingles, tokens
from .util import ensure_parallelism


# ---------------------------------------------------------------- exact

def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fingerprint groups with >1 member: (fingerprint, n_docs,
    keep_id, dup_ids)."""
    fp = df.select(F.col(id_col).alias("id"), doc_fingerprint(F.col(text_col)).alias("fingerprint"))
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("id").alias("keep_id"),
            F.array_sort(F.collect_list("id")).alias("member_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id representative of each exact-content group."""
    fp = df.withColumn("_fp", doc_fingerprint(F.col(text_col)))
    keep = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, [ "_fp", id_col], "left_semi").drop("_fp")


# ------------------------------------------------------- n-gram jaccard

def _shingled(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    df = ensure_parallelism(df)  # md5 shingle hashing is CPU-bound
    return df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), n).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs with n-gram Jaccard >= threshold, via inverted-index
    join: explode shingles, equi-join on shingle, count common per pair.
    J = common / (|A| + |B| - common)."""
    s = _shingled(df, text_col, id_col, n).where(F.col("n_sh") > 0)
    inv = s.select("id", "n_sh", F.explode("sh").alias("shingle"))
    a = inv.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"), "shingle")
    b = inv.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"), "shingle")
    return (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("common"))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------- minhash LSH

MINHASH_P = 2147483647  # 2^31 - 1; products stay under 2^62 in BIGINT


def minhash_constants(num_hashes: int) -> tuple[list[int], list[int]]:
    """Fixed (a_i, b_i) for the universal-hash family h_i(x) =
    (a_i * x + b_i) mod P.  Deterministic LCG-derived constants so the
    DuckDB oracle can regenerate the identical family."""
    a, b = [], []
    for i in range(num_hashes):
        a.append(((1103515245 * (i + 7) + 12345) % MINHASH_P) | 1)
        b.append((69069 * (i + 3) + 1) % MINHASH_P)
    return a, b


def shingle_hashes(sh_col) -> Column:
    """Distinct 60-bit integer hashes of the shingle strings:
    int(md5(s)[:15], 16).  Engine-portable (DuckDB:
    ('0x' || substr(md5(s),1,15))::BIGINT) and ~2.5x smaller than the
    strings on the wire — the candidate join then shuffles long arrays
    instead of text, and set ops compare ints."""
    return F.array_distinct(
        F.transform(
            sh_col,
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )


def minhash_signature_int(hash_col, num_hashes: int) -> Column:
    """Array of num_hashes minhash values over integer shingle hashes:
    min over shingles of (a_i * (h mod P) + b_i) mod P.  Pure integer
    arithmetic — no per-hash md5 pass over the shingles."""
    a, b = minhash_constants(num_hashes)

    def hasher(i: int):
        return lambda h: (F.lit(a[i]) * (h % F.lit(MINHASH_P))
                          + F.lit(b[i])) % F.lit(MINHASH_P)

    return F.array(
        *[F.array_min(F.transform(hash_col, hasher(i)))
          for i in range(num_hashes)]
    )


def minhash_signature(sh_col, num_hashes: int) -> Column:
    """Array of num_hashes minhash values.  Hash_i(s) = md5(i ':' s) as
    a hex STRING; the lexicographic min over shingles is a valid
    min-hash (md5 is uniform on hex strings) and is engine-portable."""
    def hasher(i: int):
        # closure over i — a default-arg lambda would be introspected
        # as a 2-arg (elem, index) HOF lambda and receive the index
        # column as the second parameter
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return F.array(
        *[
            F.array_min(F.transform(sh_col, hasher(i)))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 12,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs from LSH band-bucket collisions, verified with
    exact Jaccard on the shingle arrays.  rows_per_band = num_hashes //
    bands; P(candidate) = 1-(1-J^r)^b — tune (b, r) to the threshold."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    s = _shingled(df, text_col, id_col, n).where(F.col("n_sh") > 0)
    hashed = s.select(
        "id", shingle_hashes(F.col("sh")).alias("sh")
    )
    sig = hashed.withColumn(
        "sig", minhash_signature_int(F.col("sh"), num_hashes)
    )
    bucketed = sig.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(str(b)),
                        *[F.col("sig")[b * r + j].cast("string")
                          for j in range(r)],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bucket"),
    )
    a = bucketed.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "bucket"
    )
    b_ = bucketed.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "bucket"
    )
    cand = (
        a.join(b_, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -------------------------------------------------------------- simhash

def _tok_hash32(t) -> Column:
    """Portable 32-bit token hash: int(md5(token)[:8], 16)."""
    return F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")


def simhash32(text_col) -> Column:
    """32-bit SimHash of the token stream: bit b of the fingerprint is
    the sign of sum_t (+1/-1 by bit b of hash(t)).  Expressed as a
    fold over the token array — no explode, no shuffle."""
    hashes = F.transform(tokens(text_col), _tok_hash32)

    def vote(b: int):
        # a real 2-arg lambda per bit (a default-arg binding would make
        # pyspark treat it as a 3-arg HOF lambda)
        def merge(acc, h):
            return acc + (
                F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1
            ).cast("int")
        return merge

    bit_votes = [F.aggregate(hashes, F.lit(0), vote(b)) for b in range(32)]
    out = F.lit(0).cast("long")
    for b, v in enumerate(bit_votes):
        out = out + F.when(v > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0))
    return out


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 x 8-bit bands (pigeonhole:
    hamming <= 3 over 32 bits guarantees >= 1 identical band), verify
    with bit_count(a XOR b) <= max_hamming."""
    sh = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), simhash32(F.col(text_col)).alias("simhash")
    )
    banded = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(b)),
                        F.shiftright("simhash", b * 8).bitwiseAND(F.lit(255)),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band"),
    )
    a = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("h_a"), "band")
    b_ = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("h_b"), "band")
    return (
        a.join(b_, "band")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------- embedding near-dup

def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Pairs with cosine similarity >= threshold.  Exact but blocked:
    with block_col, only within-block pairs are compared (caller
    provides a cheap blocking key, e.g. an LSH bucket or a label);
    without it this is the O(n^2) small-corpus fallback."""
    e = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                 *( [F.col("blk")] if block_col else [] ))
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                 *( [F.col("blk")] if block_col else [] ))
    joined = a.join(b, "blk") if block_col else a.crossJoin(b)
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a_, x: a_ + x * x))  # noqa: E731
    return (
        joined.where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (nrm(F.col("va")) * nrm(F.col("vb"))))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
