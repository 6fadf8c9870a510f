"""One-pass cardinality sketches: KMV (k-minimum-values) and
HyperLogLog — the distinct-count answer that still works when the
column has 10^11 distinct values and an exact ``count(distinct)``
would shuffle them all.

Both sketches are built from pure built-in expressions (no UDFs, no
driver state) and are DETERMINISTIC: the hash is the first 15 hex
chars of md5 (60 uniform bits — the same cross-engine technique as
operators/corpus.py), every intermediate is an integer, and the one
floating-point step at the end is a fixed expression over integers —
so the estimate is bit-identical at any partitioning and a SQL oracle
can replay it (driver queries `kmv_distinct_customers` /
`hll_distinct_orders`).

Shape at scale:

* ``kmv_distinct`` — hash, hash-distinct, then ``orderBy(h).limit(k)``.
  Spark plans the sort-limit as TakeOrderedAndProject: each partition
  keeps its local top-k and only k rows per partition reach the
  driver-side merge — no global sort.  The distinct is the expensive
  part (one shuffle of the hashed keys); use it when you ALSO need
  the distinct stream, else prefer HLL.
* ``hll_distinct`` — one groupBy over at most 2^p (default 4096)
  register ids with a map-side-combined ``max``: constant-size state
  regardless of input size.  This is the 100 TB default.

Accuracy: KMV se ~ 1/sqrt(k-2) (k=1024 -> ~3%); HLL se ~ 1.04/sqrt(m)
(p=12 -> ~1.6%), with the standard linear-counting small-range
correction below 2.5*m.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "kmv_distinct",
    "kmv_sketch",
    "kmv_set_estimates",
    "hll_distinct",
    "cms_build",
    "cms_estimate",
    "HASH_BITS",
]

HASH_BITS = 60  # 15 md5 hex chars
_HSPAN = float(2**HASH_BITS)


def _h60(col) -> F.Column:
    """Uniform 60-bit integer hash of ``col`` (md5-prefix, engine-
    portable: DuckDB spells it ('0x'||substr(md5(x),1,15))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_distinct(df: DataFrame, col: str, k: int = 1024) -> DataFrame:
    """K-minimum-values distinct-count estimate of ``df[col]``.

    Returns one row (estimate double, n_min long, hk long): with fewer
    than k distinct hashes the exact distinct count is returned (the
    sketch holds every hash), else (k-1) * 2^60 / h_(k).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    # NULL values don't count as a distinct value (count_distinct
    # semantics) — and Spark's ascending sort is NULLS FIRST, so an
    # unfiltered NULL hash would permanently occupy a sketch slot
    mins = (
        df.select(_h60(F.col(col)).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    scale = float((k - 1) * 2**HASH_BITS)  # exact double, embedded as literal
    return mins.agg(
        F.count("*").alias("n_min"), F.max("h").alias("hk")
    ).select(
        F.when(F.col("n_min") < k, F.col("n_min").cast("double"))
        .otherwise(F.lit(scale) / F.col("hk").cast("double"))
        .alias("estimate"),
        "n_min",
        "hk",
    )


def hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame, col: str, p: int = 12, by: list[str] | None = None
) -> DataFrame:
    """HyperLogLog distinct-count estimate with 2^p registers.

    Register id = h mod 2^p; rank rho = leading-zero count of the
    remaining 60-p bits + 1 (bit length via base-2 string conversion —
    exact, no float log).  The register sum is kept as an INTEGER
    scaled by 2^S with S = (60-p)+1 = max possible rho (sum of
    2^(S-rho), each term a representable power of two, absent
    registers contributing 2^S; total <= m*2^S = 2^61 < BIGINT), so
    the harmonic mean is reproducible bit-for-bit; only the final
    alpha*m^2*2^S/Z division and the ln() of the small-range
    correction are floating-point.

    Returns one row (estimate double, n_reg long, v_zero long) — or,
    with ``by=[keys...]``, one row PER GROUP (keys + the same three
    columns): the count-distinct-per-group at bounded state
    (n_groups * 2^p registers after the map-side combine), e.g.
    distinct users per event type over a 100 TB log.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    by = list(by or [])
    m = 1 << p
    rem_bits = HASH_BITS - p
    regs = (
        df.select(*by, _h60(F.col(col)).alias("h"))
        .filter(F.col("h").isNotNull())  # NULLs are not a distinct value
        .select(
            *by,
            F.pmod("h", F.lit(m)).alias("reg"),
            F.expr(f"h DIV {m}").alias("rem"),
        )
        .select(
            *by,
            "reg",
            # bit_length(rem) = length of the base-2 string; conv(0)='0'
            # has length 1, so guard rem=0 (all remaining bits zero ->
            # rho = rem_bits + 1).
            F.when(F.col("rem") == 0, F.lit(rem_bits + 1))
            .otherwise(
                F.lit(rem_bits + 1)
                - F.length(F.conv(F.col("rem").cast("string"), 10, 2))
            )
            .alias("rho"),
        )
        .groupBy(*by, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )
    # Z_int = sum over PRESENT registers of 2^(S-max_rho); absent
    # registers (rho would be 0 -> 2^S) are added from the zero count.
    s_exp = rem_bits + 1  # == max possible rho
    zsum = regs.groupBy(*by).agg(
        F.count("*").alias("n_reg"),
        # coalesce: an all-NULL/empty input has zero present registers
        # and must estimate 0.0, not NULL
        F.coalesce(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {s_exp} - max_rho)")
            ),
            F.lit(0).cast("long"),
        ).alias("z_present"),
    )
    alpha = hll_alpha(m)
    raw_num = float(alpha * m * m * 2**s_exp)  # exact-double literal
    return zsum.select(
        *by,
        "n_reg",
        (F.lit(m) - F.col("n_reg")).alias("v_zero"),
        (
            F.col("z_present")
            + (F.lit(m).cast("long") - F.col("n_reg"))
            * F.lit(1 << s_exp).cast("long")
        ).alias("z_int"),
    ).select(
        *by,
        F.when(
            # linear counting when the raw estimate is small and
            # empty registers remain
            (F.lit(raw_num) / F.col("z_int").cast("double") <= F.lit(2.5 * m))
            & (F.col("v_zero") > 0),
            F.lit(float(m))
            * F.log(F.lit(float(m)) / F.col("v_zero").cast("double")),
        )
        .otherwise(F.lit(raw_num) / F.col("z_int").cast("double"))
        .alias("estimate"),
        "n_reg",
        "v_zero",
    )


def _cms_hash(col, j: int, w: int) -> F.Column:
    """Row-j CMS bucket of ``col``: 60-bit md5-prefix hash of the
    salted string 'j:x', mod w.  Engine-portable (DuckDB:
    ('0x'||substr(md5('j:'||x::VARCHAR),1,15))::BIGINT % w)."""
    return F.pmod(
        _h60(F.concat(F.lit(f"{j}:"), F.col(col).cast("string"))),
        F.lit(w),
    )


def cms_build(df: DataFrame, col: str, d: int = 4, w: int = 2048) -> DataFrame:
    """Count-min sketch of the frequency distribution of ``df[col]``:
    d independent hash rows of w counters.

    Returns (row int, bucket long, cnt long) — at most d*w rows
    regardless of input size (absent cells are implicit zeros).  The
    build is ONE pass: each input row contributes d (row, bucket)
    pairs via a literal-array inline explode, and the groupBy
    map-side-combines into the bounded counter state, so the exchange
    carries at most d*w rows per input partition.  Estimates are
    biased UP only (collisions add, never subtract): point estimate
    err <= 2N/w with prob >= 1 - (1/2)^d (Cormode-Muthukrishnan).

    Deterministic (md5-prefix hashing) -> bit-identical at any
    partitioning; driver query `cms_heavy_custkeys` replays build +
    estimate in DuckDB exactly.
    """
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 and w >= 2")
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cms_hash(col, j, w).alias("bucket"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("p")
    )
    return (
        pairs.select("p.row", "p.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, items: DataFrame, col: str, d: int = 4, w: int = 2048
) -> DataFrame:
    """Point-estimate the frequency of each ``items[col]`` value from
    a `cms_build` sketch (built with the SAME d and w).

    Returns ``items`` plus ``est:long`` = min over the d rows of the
    value's counter (0 if a counter cell is absent).  The sketch is
    at most d*w rows, so the lookup broadcasts it: estimating any
    number of candidates costs one scan of ``items`` and no shuffle
    of the sketch.

    The sketch is localCheckpoint-ed eagerly before the d probe joins:
    each join references it under different aliases, Catalyst does not
    reuse the exchange, and without the checkpoint the BUILD —
    including its scan of the full input corpus — would execute d
    times (plan-audited in tests).
    """
    cms = cms.localCheckpoint()
    out = items
    for j in range(d):
        out = out.withColumn(f"__cms_b{j}", _cms_hash(col, j, w))
    for j in range(d):
        cj = cms.filter(F.col("row") == j).select(
            F.col("bucket").alias(f"__cms_b{j}"),
            F.col("cnt").alias(f"__cms_c{j}"),
        )
        out = out.join(F.broadcast(cj), f"__cms_b{j}", "left")
    est = F.least(
        *[
            F.coalesce(F.col(f"__cms_c{j}"), F.lit(0).cast("long"))
            for j in range(d)
        ]
    )
    return out.select(*items.columns, est.alias("est"))


def kmv_sketch(df: DataFrame, col: str, k: int = 1024) -> DataFrame:
    """The raw k-minimum-values sketch of ``df[col]``: the k smallest
    distinct 60-bit hashes, one `h:long` row each — the MERGEABLE form
    (union two sketches by unioning rows and re-taking the min-k),
    input to the set-operation estimators below."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return (
        df.select(_h60(F.col(col)).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_set_estimates(
    sk_a: DataFrame, sk_b: DataFrame, k: int = 1024
) -> DataFrame:
    """Distinct-count estimates for the UNION, INTERSECTION and Jaccard
    of two key sets from their `kmv_sketch`es (Beyer et al., "On
    Synopses for Distinct-Value Estimation Under Multiset Operations",
    SIGMOD'07) — corpus-overlap measurement without ever joining the
    corpora:

    * the union's sketch is the min-k of the merged hash sets; its
      k-th value gives the union estimate (exact when < k hashes);
    * rho = |{h in union sketch: h in A and h in B}| / k estimates the
      Jaccard similarity; intersection = rho * union.

    One row: (union_est double, jaccard double, intersect_est double,
    n_union long, n_both long).  Everything up to the two final
    divisions is integer set logic, so a SQL oracle replays it exactly
    (driver query `kmv_corpus_overlap`).  Cost: the sketches are <= k
    rows each — the estimate is a driver-scale computation regardless
    of corpus size, and sketches can be PERSISTED per corpus drop and
    compared pairwise later (the mergeable-synopsis property).
    """
    a = sk_a.select(F.col("h").alias("h"), F.lit(1).alias("in_a"))
    b = sk_b.select(F.col("h").alias("h"), F.lit(1).alias("in_b"))
    merged = (
        a.join(b, "h", "full_outer")
        .select(
            "h",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
        .orderBy("h")
        .limit(k)
    )
    scale = float((k - 1) * 2**HASH_BITS)
    agg = merged.agg(
        F.count("*").alias("n_union"),
        F.max("h").alias("hk"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).cast("long").alias("n_both"),
    )
    union_est = (
        F.when(F.col("n_union") < k, F.col("n_union").cast("double"))
        .otherwise(F.lit(scale) / F.col("hk").cast("double"))
    )
    jac = F.col("n_both").cast("double") / F.greatest(
        F.col("n_union").cast("double"), F.lit(1.0)
    )
    return agg.select(
        union_est.alias("union_est"),
        jac.alias("jaccard"),
        (union_est * jac).alias("intersect_est"),
        "n_union",
        "n_both",
    )
