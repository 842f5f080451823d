"""Deterministic hash-based sampling.

Training-data pipelines need samples that are REPRODUCIBLE (same rows
on every run, cluster size, and partitioning), CONSISTENT across
tables (the same key always lands in the sample, so joins between a
sampled fact table and its sampled children still line up), and cheap
(no shuffle, no state).  `df.sample()` gives none of these — its
Bernoulli draw depends on partition layout and seed plumbing.

The standard fix: hash the key, keep rows whose hash falls below the
fraction threshold.  We compare the first 8 hex digits of md5 against
a fixed-width lowercase-hex threshold STRING — lexicographic order on
fixed-width hex equals numeric order, md5 renders identically in every
engine, so the predicate is bit-portable (the DuckDB oracle runs the
very same expression) and stays a scan-level filter Catalyst pushes
into the parquet reader's row-group evaluation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(fraction: float) -> str:
    """fraction in [0,1] -> 8-digit lowercase hex of fraction * 2^32."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(min(int(fraction * 2**32), 2**32 - 1), "08x")


def _bucket(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with
    md5(salt || key)[:8] < hex(fraction * 2^32).  Same key -> same
    verdict everywhere; disjoint salts give independent samples (e.g.
    train/validation splits that can never overlap when drawn with
    fraction_a + fraction_b <= 1 from complementary ranges)."""
    return df.where(_bucket(F.col(key_col), salt) < F.lit(_hex_threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 5%
    but keep 100% of low-resource languages).  The per-stratum
    threshold is a CASE expression — no join, no shuffle; the strata
    map is plan-side metadata, so this stays a pushable filter."""
    expr = F.lit(_hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items(), key=lambda kv: str(kv[0])):
        expr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_hex_threshold(frac))
        ).otherwise(expr)
    return df.where(_bucket(F.col(key_col), salt) < expr)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Deterministic N-way disjoint split (train/valid/test) by
    COMPLEMENTARY hash ranges: split i gets bucket values in
    [cum_i, cum_{i+1}) of md5(salt||key)[:8].  Disjointness and
    exhaustiveness hold by construction (ranges partition the hash
    space), the assignment is stable across runs/partitionings/engines
    (same md5 everywhere), and — unlike sampling each split
    independently — a document can never land in two splits.  Rows
    beyond sum(fractions) of the space get split = NULL (with
    fractions summing to 1 every row is labeled except the single
    bucket value 0xffffffff — _hex_threshold caps there — a 2^-32
    sliver that is at least the SAME sliver on every engine).

    Adds a ``split`` column; the predicate is a pushable CASE over
    fixed hex-literal comparisons (no shuffle, no Python).
    """
    names = list(fractions)
    cum = 0.0
    bounds = []
    for n in names:
        lo = cum
        cum += fractions[n]
        bounds.append((n, _hex_threshold(lo), _hex_threshold(min(cum, 1.0))))
    if cum > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {cum} > 1")
    b = _bucket(F.col(key_col), salt)
    expr = F.lit(None).cast("string")
    for n, lo, hi in reversed(bounds):
        expr = F.when((b >= F.lit(lo)) & (b < F.lit(hi)), F.lit(n)).otherwise(expr)
    return df.withColumn("split", expr)


def score_weighted_sample(
    df: DataFrame, key_col: str, weight_e4_col: str, salt: str = ""
) -> DataFrame:
    """Per-row weighted Bernoulli sample, deterministic: keep a row iff
    ``md5_u32(salt || key) * 10^4 < weight_e4 * 2^32`` — the keep
    probability IS the row's own ``weight_e4``/10^4 (0..10^4), so a
    quality score becomes a sampling rate directly (the
    quality-weighted subsampling stage of published corpus pipelines —
    keep high-quality pages at ~1.0, tail pages at their score).

    Same contract as hash_sample: reproducible on any run/partitioning/
    engine (pure integer compare, q90's oracle runs the identical
    arithmetic), no shuffle, scan-pushable; disjoint salts decorrelate
    from any other hash_sample/split drawn on the same keys.  int64
    headroom: u32 * 10^4 < 2^46.
    """
    u32 = F.conv(_bucket(F.col(key_col), salt), 16, 10).cast("long")
    return df.where(
        u32 * F.lit(10_000) < F.col(weight_e4_col).cast("long") * F.lit(2**32)
    )
