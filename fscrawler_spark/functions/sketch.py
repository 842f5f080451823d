"""Relational HyperLogLog — a mergeable cardinality sketch as plain
DataFrame algebra, engine-exact.

Why it exists here: counting distinct URLs/users/hosts at 10^10-row
scale is exactly where exact count-distinct dies (the distinct
shuffle moves every key), and Spark's own approx_count_distinct is an
opaque JVM sketch no second engine can reproduce — un-oracle-able.
This module implements HLL (Flajolet et al. 2007) with every step an
integer DataFrame op, so the sketch AND the estimate are bit-identical
across runs, partitionings, and engines (the q42/q53 recipe extended
to a probabilistic data structure — the *estimate* is approximate,
its *computation* is exact).

Shape (m = 256 buckets, 32-bit substream):
- h       = md5(key)                 (hex; engine-shared)
- bucket  = int(h[0:2], 16)          (8 bits -> 0..255)
- v32     = int(h[2:10], 16)         (the next 32 bits)
- rho     = 33 - bitlen(v32)         (leading-zero rank; v32=0 -> 33)
- sketch  = per (group, bucket) MAX(rho)   <- the mergeable state
- s_scaled = sum over ALL m buckets of 2^(33 - rmax), absent buckets
  contributing 2^33 (rmax = 0), kept exactly in int64:
  s_scaled = (m - n_hit) * 2^33 + sum_hit(1::BIGINT << (33 - rmax))
- estimate = alpha_256 * m^2 * 2^33 / s_scaled — the raw HLL
  estimator as ONE shared SQL text (literals + a single IEEE
  division), identical on Spark and DuckDB; m^2 * 2^33 = 2^49 is
  exactly representable.

The bitlen is a generated 32-branch CASE over powers of two — pure
int64 comparisons, one SQL text shared verbatim by F.expr and the
oracle (the functions/layout.py device), so there is no twin to
drift.  The raw estimator is used as-is; the standard small-range
linear-counting correction needs ln() (libm-dependent, not
engine-exact) and is documented out — callers that need it apply it
to the returned (n_hit, s_scaled) components.

Merge = union the (group, bucket, rmax) sketches and re-MAX — the
HLL property that makes it a sketch rather than a sample; pytest
proves sketch(A) ⊎ sketch(B) == sketch(A ∪ B) exactly.

At scale: the sketch state is m rows per group (vs one row per
DISTINCT key for exact counting); the only wide exchange is the
(group, bucket) aggregate, which partial-aggregates map-side to
≤ m rows per group per partition.

Reference parity: FsCrawler's CrawlingQueue reports distinct counts
from an in-memory set (crawler/crawlingQueue.py queue stats); this is
that counter at the frontier scale where no set fits anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_BUCKETS = 256
# The e0 exponents are load-bearing: bare decimal literals parse as
# DECIMAL on both Spark and DuckDB, and their decimal arithmetic
# rounds differently — exponent form forces IEEE DOUBLE on both.
_ALPHA_NUM = "0.7213e0"
_ALPHA_DEN = "(1.0e0 + 1.079e0 / 256.0e0)"
# m^2 * 2^33 = 2^49 — exactly representable as a double literal.
_M2_POW33 = "562949953421312.0e0"


def bitlen32_sql(expr: str) -> str:
    """SQL text for the bit length of a non-negative 32-bit value in
    ``expr``: 0 for 0, else floor(log2(v)) + 1.  Pure int64
    comparisons (a generated 32-branch CASE), shared verbatim by both
    engines."""
    branches = " ".join(
        f"WHEN {expr} >= {1 << (k - 1)} THEN {k}" for k in range(32, 0, -1)
    )
    return f"(CASE {branches} ELSE 0 END)"


def hll_rho_sql(expr: str) -> str:
    """SQL text for the HLL rank rho = leading zeros of the 32-bit
    substream + 1 == 33 - bitlen(v)."""
    return f"(33 - {bitlen32_sql(expr)})"


def hll_estimate_sql(s_expr: str) -> str:
    """SQL text for the raw HLL estimate from the exact int64
    ``s_expr`` (= sum of 2^(33-rmax) over all 256 buckets): one IEEE
    division on shared literals — bit-identical on any engine."""
    return f"(({_ALPHA_NUM} / {_ALPHA_DEN}) * {_M2_POW33} / CAST({s_expr} AS DOUBLE))"


def hll_sketch(df: DataFrame, group_cols: list[str], key_col: str) -> DataFrame:
    """Build the mergeable sketch: (group_cols..., bucket, rmax) with
    one row per non-empty bucket.  bucket/v32 come from md5(key) —
    Spark parses the hex with conv(); an oracle uses the '0x' cast
    (the q50 device) and the SAME rho text."""
    h = F.md5(F.col(key_col).cast("string"))
    rows = df.select(
        *group_cols,
        F.conv(F.substring(h, 1, 2), 16, 10).cast("long").alias("bucket"),
        F.conv(F.substring(h, 3, 8), 16, 10).cast("long").alias("v32"),
    ).withColumn("rho", F.expr(hll_rho_sql("v32")).cast("long"))
    return rows.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rmax"))


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge two sketches over the same groups: union + re-MAX."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rmax").alias("rmax"))
    )


def hll_finalize(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse a sketch to (group_cols..., n_hit, s_scaled,
    est_distinct).  n_hit/s_scaled are exact int64; est_distinct is
    the shared-text raw estimator."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_hit"),
        F.sum(F.expr("CAST(1 AS BIGINT) << (33 - rmax)")).alias("s_hit"),
    )
    return agg.select(
        *group_cols,
        "n_hit",
        F.expr(f"({M_BUCKETS} - n_hit) * 8589934592 + s_hit")
        .cast("long")
        .alias("s_scaled"),
    ).withColumn("est_distinct", F.expr(hll_estimate_sql("s_scaled")))


def hll_distinct(df: DataFrame, group_cols: list[str], key_col: str) -> DataFrame:
    """One-shot grouped approximate count-distinct: sketch + finalize."""
    return hll_finalize(hll_sketch(df, group_cols, key_col), group_cols)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency estimation.
#
# The heavy-hitters companion to HLL: bounded-size frequency counts for
# an unbounded key domain (which hosts dominate the frontier, which
# n-grams dominate the corpus) without a per-key counter table.  Unlike
# HLL's estimator there is no floating point anywhere: updates are
# counter increments, the point query is min() over d counters — every
# value is int64, so estimates are oracle-exact outright, and the
# one-sided error guarantee (est >= true; est <= true + eps*N w.h.p.)
# is pytest-assertable.
#
# depth d=4 rows, width w=1024 counters: md5(j || ':' || key) gives d
# independent row hashes from the one md5 the engines share; the
# sketch is at most d*w rows however many distinct keys exist.  Merge
# = union + per-(row, idx) SUM (counters are additive), the same
# mergeability argument as hll_merge.
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 1024


def _cms_idx(key_col: str, j: int):
    h = F.md5(F.concat(F.lit(f"{j}:"), F.col(key_col).cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CMS_W).alias("idx")


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build the sketch from key occurrences: (row_j, idx, c) — at most
    d*w rows.  One explode to d rows per occurrence, then a map-side-
    combined count keyed on (row_j, idx): the exchange moves at most
    d*w rows per upstream partition regardless of input size."""
    rows = [
        df.select(F.lit(j).cast("int").alias("row_j"), _cms_idx(key_col, j))
        for j in range(CMS_D)
    ]
    u = rows[0]
    for r in rows[1:]:
        u = u.unionByName(r)
    return u.groupBy("row_j", "idx").agg(F.count("*").cast("long").alias("c"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches: counters are additive."""
    return (
        a.unionByName(b).groupBy("row_j", "idx").agg(F.sum("c").cast("long").alias("c"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-query a set of keys: est = min over the d rows of the
    counter at (j, idx_j(key)).  The d-row probe side is |keys|*d rows;
    the sketch side is <= d*w rows — broadcast it."""
    probes = [
        keys.select(key_col, F.lit(j).cast("int").alias("row_j"), _cms_idx(key_col, j))
        for j in range(CMS_D)
    ]
    u = probes[0]
    for p in probes[1:]:
        u = u.unionByName(p)
    return (
        u.join(F.broadcast(sketch), ["row_j", "idx"], "left")
        .groupBy(key_col)
        # An absent counter cell IS zero — a never-seen key whose cell
        # no occurrence touched must estimate 0, so the join is LEFT
        # and nulls coalesce before the min.
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_n"))
    )


# ---------------------------------------------------------------------------
# Bloom filter — set membership, completing the sketch family trio
# (HLL = how many distinct, CMS = how often, Bloom = is it there).
#
# The crawl engine's seen-set prefilter (operators/dedup.py) builds
# Spark's own BloomFilter through the JVM aggregate — fast, but its
# bit layout is engine-private.  This relational form trades a
# constant factor for verifiability: the filter IS a (word, bits)
# DataFrame built with bit_or, every position derived from the one
# md5 both engines share, so the exact bit pattern — and therefore
# every membership verdict INCLUDING the false positives — is
# reproducible cross-engine and oracle-checkable.
#
# k=4 hashes; m = 65536 bits packed 32 per int64 word (2048 rows max).
# 32-bit packing is deliberate: DuckDB range-checks left shifts into
# the BIGINT sign bit (1::BIGINT << 63 errors), so sign-safe words
# keep one arithmetic for both engines.  Merge = per-word bit_or
# (set union), the same mergeability as the other two sketches.
# ---------------------------------------------------------------------------

BLOOM_K = 4
BLOOM_BITS = 65536
_BLOOM_WORD_BITS = 32


def _bloom_pos(key_col: str, j: int):
    h = F.md5(F.concat(F.lit(f"b{j}:"), F.col(key_col).cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BLOOM_BITS).alias(
        "pos"
    )


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build the filter: (word, bits) with bits the OR of 1 << (pos %
    32) over every key's k positions — at most m/32 rows however many
    keys went in."""
    rows = [df.select(_bloom_pos(key_col, j)) for j in range(BLOOM_K)]
    u = rows[0]
    for r in rows[1:]:
        u = u.unionByName(r)
    return (
        u.select(
            F.expr(f"pos DIV {_BLOOM_WORD_BITS}").alias("word"),
            F.expr(
                f"CAST(1 AS BIGINT) << CAST(pos % {_BLOOM_WORD_BITS} AS INT)"
            ).alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two filters: per-word OR (set union)."""
    return a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(bloom: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Membership probe: a key is (possibly) present iff ALL k of its
    bits are set; any clear — or absent word row — is a definite NO
    (no false negatives, pytest-proved).  The probe side is |keys|*k
    rows; the filter is <= m/32 rows — broadcast it."""
    probes = [
        keys.select(key_col, _bloom_pos(key_col, j)) for j in range(BLOOM_K)
    ]
    u = probes[0]
    for p in probes[1:]:
        u = u.unionByName(p)
    u = u.select(
        key_col,
        F.expr(f"pos DIV {_BLOOM_WORD_BITS}").alias("word"),
        F.expr(
            f"CAST(1 AS BIGINT) << CAST(pos % {_BLOOM_WORD_BITS} AS INT)"
        ).alias("b"),
    )
    hit = (
        u.join(F.broadcast(bloom), "word", "left")
        .select(
            key_col,
            (
                (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("b")))
                == F.col("b")
            )
            .cast("int")
            .alias("hit"),
        )
    )
    return hit.groupBy(key_col).agg(
        (F.min("hit") == 1).alias("maybe_present")
    )
