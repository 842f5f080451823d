"""Seen-set dedup (J2) — exact anti-join anchored, bloom-accelerated.

The reference keeps an in-memory processed-paths set + a DB point probe
(app/crawler/file_system_crawler.py:70,412-415;
app/crawling_queue_consumer.py:111-115; app/database/data_manager.py:85-87).
At 10^10 URLs neither fits one machine, so (north rule):

  tier 1 — broadcast **Bloom filter** over the seen set: a vectorized
           numpy bit-array probe classifies each candidate as
           definitely-unseen (bloom negative) or possibly-seen.
  tier 2 — exact **left_anti join** against the `seen` table for the
           possibly-seen minority.  The Bloom is only ever a
           pre-filter: its false positives fall through to the exact
           join and are resolved there, never dropped (SURVEY §7.4 —
           FP => candidate wrongly dropped is the failure mode this
           two-tier split prevents).

The definitely-unseen majority skips the shuffle entirely — the warm
re-run speedup the reference reports (156x, README.md:111-115)
becomes "anti-join input shrinks to the bloom-positive fraction".

Scale notes: the bit array is built distributedly (per-partition numpy
OR via RDD treeAggregate — executors never ship raw URLs, only bit
arrays) and broadcast once per wave.  At 10^10 URLs a single bloom is
~12 GB at 1% FPP, past broadcast range — the deployment-scale design
shards the bloom by host-hash into per-partition filters (the same
two-tier contract per shard); the sandbox uses one shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


class NumpyBloom:
    """Double-hashing Bloom filter over (xxhash64, murmur3) column pairs.

    Position i = (h1 + i*h2) mod m — Kirsch-Mitzenmacher double hashing,
    k probes from two base hashes, both computed JVM-side (F.xxhash64 /
    F.hash), so Python only ever sees int64 arrays, never URLs.
    """

    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.bits = bits if bits is not None else np.zeros(
            (self.n_bits + 63) // 64, dtype=np.uint64
        )

    @classmethod
    def sized_for(cls, n_items: int, fpp: float = 0.01) -> "NumpyBloom":
        n_items = max(n_items, 1)
        m = int(-n_items * np.log(fpp) / (np.log(2) ** 2)) + 64
        k = max(1, int(round(m / n_items * np.log(2))))
        return cls(m, min(k, 8))

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        # (n, k) probe positions; uint64 arithmetic wraps (mod 2^64) then mod m.
        i = np.arange(self.n_hashes, dtype=np.uint64)
        return (
            h1.astype(np.uint64)[:, None] + i[None, :] * h2.astype(np.uint64)[:, None]
        ) % np.uint64(self.n_bits)

    def add_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        pos = self._positions(h1, h2).ravel()
        np.bitwise_or.at(self.bits, (pos // 64).astype(np.int64), np.uint64(1) << (pos % 64))

    def might_contain(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        pos = self._positions(h1, h2)
        probe = (self.bits[(pos // 64).astype(np.int64)] >> (pos % 64)) & np.uint64(1)
        return probe.all(axis=1)


def _hash_cols(df: DataFrame, col: str) -> DataFrame:
    return df.select(
        F.xxhash64(F.col(col)).alias("_h1"), F.hash(F.col(col)).cast("long").alias("_h2")
    )


def build_bloom(df: DataFrame, col: str, n_items: int, fpp: float = 0.01) -> NumpyBloom:
    """Distributed build: per-partition numpy bloom, OR-merged treewise.
    Only (m/8)-byte bit arrays cross the wire, never rows."""
    bloom = NumpyBloom.sized_for(n_items, fpp)
    n_bits, n_hashes = bloom.n_bits, bloom.n_hashes

    def part_bloom(rows):
        b = NumpyBloom(n_bits, n_hashes)
        arr = np.array([(r["_h1"], r["_h2"]) for r in rows], dtype=np.int64)
        if arr.size:
            b.add_hashes(arr[:, 0], arr[:, 1])
        yield b.bits

    merged = (
        _hash_cols(df, col)
        .rdd.mapPartitions(part_bloom)
        .treeReduce(np.bitwise_or)
    )
    return NumpyBloom(n_bits, n_hashes, merged)


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
    bloom: NumpyBloom | None = None,
) -> DataFrame:
    """Rows of `candidates` whose url is NOT in `seen` — exact.

    With a bloom, only bloom-positive rows enter the anti-join; bloom
    negatives are provably unseen and bypass the shuffle.
    """
    if bloom is None:
        return candidates.join(
            seen.select(F.col(url_col).alias(url_col)), url_col, "left_anti"
        )

    sc = candidates.sparkSession.sparkContext
    b_bits = sc.broadcast(bloom.bits)
    n_bits, n_hashes = bloom.n_bits, bloom.n_hashes

    @pandas_udf(T.BooleanType())
    def might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        b = NumpyBloom(n_bits, n_hashes, b_bits.value)
        out = b.might_contain(h1.to_numpy(np.int64), h2.to_numpy(np.int64))
        return pd.Series(out)

    tagged = candidates.withColumn(
        "_maybe_seen",
        might_contain(F.xxhash64(F.col(url_col)), F.hash(F.col(url_col)).cast("long")),
    )
    sure_new = tagged.where(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe = tagged.where(F.col("_maybe_seen")).drop("_maybe_seen")
    resolved = maybe.join(seen.select(url_col), url_col, "left_anti")
    return sure_new.unionByName(resolved)


def exact_duplicate_groups(
    df: DataFrame, hash_col: str, size_col: str | None = None
) -> DataFrame:
    """J1/A5 — duplicate groups by content identity: groupBy(hash[,size])
    HAVING count>1 (app/database/data_manager.py:330-359; sql/stats.sql:16-33).
    Returns (hash[, size], dup_count)."""
    keys = [hash_col] + ([size_col] if size_col else [])
    return df.groupBy(*keys).agg(F.count("*").alias("dup_count")).where(
        F.col("dup_count") > 1
    )
