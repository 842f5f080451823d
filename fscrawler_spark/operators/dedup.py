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


class CuckooFilter:
    """Cuckoo filter over JVM-computed xxhash64 values: 16-bit
    fingerprints, 4-slot buckets, partial-key cuckoo hashing
    (b2 = b1 xor H(fp)).  Unlike the Bloom filter it supports DELETE —
    the property that makes it the seen-set's *spill* accelerator: when
    the filter saturates, aged-out URL cohorts (old crawl epochs) are
    evicted by fingerprint while the exact `seen` table remains ground
    truth (the two-tier contract is unchanged: positives fall through
    to the exact anti-join, negatives are provably unseen IF their
    cohort was never deleted — deletions only reduce pre-filter power,
    never correctness, because deleted cohorts fail "definitely unseen"
    and go to the exact join).

    Scale note: filters shard by h1-range (each shard built from its
    own partition's hashes, no cross-shard evictions) — the sandbox
    builds one shard driver-side.
    """

    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        self.n_buckets = int(n_buckets)
        self.table = table if table is not None else np.zeros(
            (self.n_buckets, 4), dtype=np.uint16
        )

    @classmethod
    def sized_for(cls, n_items: int, load: float = 0.84) -> "CuckooFilter":
        n_buckets = 1 << max(4, int(np.ceil(np.log2(max(n_items, 1) / (4 * load)))))
        return cls(n_buckets)

    def _fp(self, h1: np.ndarray) -> np.ndarray:
        fp = ((h1.astype(np.uint64) >> np.uint64(40)) & np.uint64(0xFFFF)).astype(
            np.uint16
        )
        fp[fp == 0] = 1  # 0 is the empty-slot sentinel
        return fp

    def _b1(self, h1: np.ndarray) -> np.ndarray:
        return (h1.astype(np.uint64) % np.uint64(self.n_buckets)).astype(np.int64)

    def _b2(self, b1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mixed = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
        return ((b1.astype(np.uint64) ^ mixed) % np.uint64(self.n_buckets)).astype(
            np.int64
        )

    def add_hashes(self, h1: np.ndarray, h2: np.ndarray | None = None) -> int:
        """Insert; returns number of items dropped after eviction chains
        exhaust (callers should size for <=0.84 load so this stays 0)."""
        fps, b1s = self._fp(np.asarray(h1, np.int64)), self._b1(np.asarray(h1, np.int64))
        dropped = 0
        rng = np.random.Generator(np.random.PCG64(7))  # deterministic kicks
        for fp, b in zip(fps, b1s):
            cur_fp, cur_b = fp, b
            placed = False
            for _ in range(500):  # eviction chain cap
                for bucket in (cur_b, self._b2(np.array([cur_b]), np.array([cur_fp]))[0]):
                    empty = np.nonzero(self.table[bucket] == 0)[0]
                    if empty.size:
                        self.table[bucket, empty[0]] = cur_fp
                        placed = True
                        break
                if placed:
                    break
                # kick a random resident from b2 and retry with it
                victim_b = self._b2(np.array([cur_b]), np.array([cur_fp]))[0]
                slot = int(rng.integers(0, 4))
                cur_fp, self.table[victim_b, slot] = (
                    self.table[victim_b, slot].copy(), cur_fp
                )
                cur_b = victim_b
            if not placed:
                dropped += 1
        return dropped

    def might_contain(self, h1: np.ndarray, h2: np.ndarray | None = None) -> np.ndarray:
        h1 = np.asarray(h1, np.int64)
        fp, b1 = self._fp(h1), self._b1(h1)
        b2 = self._b2(b1, fp)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete_hashes(self, h1: np.ndarray) -> int:
        """Remove one matching fingerprint per item (spill/aging path);
        returns how many were found and removed."""
        h1 = np.asarray(h1, np.int64)
        fp, b1 = self._fp(h1), self._b1(h1)
        b2 = self._b2(b1, fp)
        removed = 0
        for f, ba, bb in zip(fp, b1, b2):
            for bucket in (ba, bb):
                slots = np.nonzero(self.table[bucket] == f)[0]
                if slots.size:
                    self.table[bucket, slots[0]] = 0
                    removed += 1
                    break
        return removed


class ShardedCuckoo:
    """Bank of cuckoo-filter shards keyed by pmod(h1, n_shards).

    Each shard is built executor-side from only its own hashes (no
    cross-shard evictions by construction), so the build is fully
    distributed: the driver receives finished fingerprint tables, never
    raw hashes.  FP-safety under saturation (round-1 advisory): a shard
    whose eviction chains exhausted (dropped > 0) can no longer prove
    "definitely unseen", so it degrades to answering True for every
    probe — its candidates all fall through to the exact anti-join,
    which is correct (just slower for that 1/n_shards slice) instead of
    silently re-scheduling seen URLs.
    """

    def __init__(
        self,
        n_shards: int,
        shards: dict[int, CuckooFilter],
        saturated: frozenset[int] = frozenset(),
    ):
        self.n_shards = int(n_shards)
        self.shards = shards
        self.saturated = frozenset(saturated)

    def might_contain(self, h1: np.ndarray, h2: np.ndarray | None = None) -> np.ndarray:
        h1 = np.asarray(h1, np.int64)
        # numpy's % matches Spark's pmod for negative int64 (non-negative)
        sid = h1 % np.int64(self.n_shards)
        out = np.zeros(len(h1), dtype=bool)
        for s in np.unique(sid):
            mask = sid == s
            if int(s) in self.saturated:
                out[mask] = True  # unreliable shard: everything "maybe seen"
            elif int(s) in self.shards:
                out[mask] = self.shards[int(s)].might_contain(h1[mask])
            # else: no seen hash ever landed in shard s -> definitely unseen
        return out

    def delete_hashes(self, h1: np.ndarray) -> int:
        """Aging/spill path: per-shard fingerprint deletes (skips
        saturated shards — already degraded to pass-through)."""
        h1 = np.asarray(h1, np.int64)
        sid = h1 % np.int64(self.n_shards)
        removed = 0
        for s in np.unique(sid):
            if int(s) in self.shards and int(s) not in self.saturated:
                removed += self.shards[int(s)].delete_hashes(h1[sid == s])
        return removed


def build_cuckoo(
    df: DataFrame, col: str, n_items: int, n_shards: int | None = None
) -> ShardedCuckoo:
    """Distributed sharded build from the xxhash64 of a column.

    Shard-by-pmod(h1) -> repartition on the shard id -> each executor
    builds its shards' fingerprint tables locally (Arrow-batched via
    mapInPandas) -> only the finished tables return to the driver.
    Nothing row-shaped crosses the wire and the driver never holds the
    hash column (the round-1 toPandas() build was ~80 GB of int64s at
    10^10 URLs — the exact driver-side bottleneck the north rule
    forbids).  Per-shard dropped counts are checked: a shard that
    overflowed is marked saturated and degrades to pass-through (see
    ShardedCuckoo) rather than breaking the two-tier FP-safety contract.
    """
    spark = df.sparkSession
    if n_shards is None:
        n_shards = max(1, spark.sparkContext.defaultParallelism)
    # 1.25x headroom over the uniform per-shard expectation keeps the
    # load factor under the 0.84 sizing target despite hash jitter.
    per_shard = max(64, int(n_items / n_shards * 1.25))

    hashed = df.select(F.xxhash64(F.col(col)).alias("_h1")).withColumn(
        "_s", F.pmod(F.col("_h1"), F.lit(n_shards)).cast("int")
    )
    parted = hashed.repartition(n_shards, "_s")

    def build_shards(batches):
        acc: dict[int, list[np.ndarray]] = {}
        for pdf in batches:
            for s, grp in pdf.groupby("_s"):
                acc.setdefault(int(s), []).append(grp["_h1"].to_numpy(np.int64))
        rows = []
        for s, chunks in acc.items():
            cf = CuckooFilter.sized_for(per_shard)
            dropped = cf.add_hashes(np.concatenate(chunks))
            rows.append((s, cf.n_buckets, cf.table.tobytes(), int(dropped)))
        yield pd.DataFrame(
            rows, columns=["shard", "n_buckets", "table", "dropped"]
        )

    built = parted.mapInPandas(
        build_shards, "shard int, n_buckets int, table binary, dropped long"
    ).collect()

    shards: dict[int, CuckooFilter] = {}
    saturated = set()
    for r in built:
        assert r["shard"] not in shards, "shard split across partitions"
        table = np.frombuffer(r["table"], dtype=np.uint16).reshape(-1, 4).copy()
        shards[r["shard"]] = CuckooFilter(r["n_buckets"], table)
        if r["dropped"] > 0:
            saturated.add(r["shard"])
    return ShardedCuckoo(n_shards, shards, frozenset(saturated))


def _hash_cols(df: DataFrame, col: str) -> DataFrame:
    return df.select(
        F.xxhash64(F.col(col)).alias("_h1"), F.hash(F.col(col)).cast("long").alias("_h2")
    )


class ShardedBloom:
    """Bank of bloom shards keyed by pmod(h1, n_shards) — the 10^10
    deployment shape: one monolithic bloom at 1% FPP is ~12 GB (past
    broadcast range); shards are independently buildable, independently
    broadcastable (each executor only needs the shards its partition's
    host-hash range probes), and independently refreshable per crawl
    epoch.  A shard with no filter means no seen hash ever landed there
    -> definitely unseen."""

    def __init__(self, n_shards: int, shards: dict[int, NumpyBloom]):
        self.n_shards = int(n_shards)
        self.shards = shards

    def might_contain(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        h1 = np.asarray(h1, np.int64)
        h2 = np.asarray(h2, np.int64)
        sid = h1 % np.int64(self.n_shards)
        out = np.zeros(len(h1), dtype=bool)
        for s in np.unique(sid):
            if int(s) in self.shards:
                mask = sid == s
                out[mask] = self.shards[int(s)].might_contain(h1[mask], h2[mask])
        return out


def build_bloom(
    df: DataFrame,
    col: str,
    n_items: int,
    fpp: float = 0.01,
    n_shards: int | None = None,
) -> ShardedBloom:
    """Distributed sharded build: repartition the JVM-computed hash
    pairs on pmod(h1, n_shards), build each shard's bit array locally
    (Arrow-batched), return only finished bit arrays to the driver —
    rows never leave the executors.  Each shard is sized for its
    expected share of n_items at the target fpp."""
    spark = df.sparkSession
    if n_shards is None:
        n_shards = max(1, spark.sparkContext.defaultParallelism)
    per_shard = max(64, int(n_items / n_shards * 1.25))
    proto = NumpyBloom.sized_for(per_shard, fpp)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes

    hashed = _hash_cols(df, col).withColumn(
        "_s", F.pmod(F.col("_h1"), F.lit(n_shards)).cast("int")
    )
    parted = hashed.repartition(n_shards, "_s")

    def build_shards(batches):
        acc: dict[int, NumpyBloom] = {}
        for pdf in batches:
            for s, grp in pdf.groupby("_s"):
                b = acc.setdefault(int(s), NumpyBloom(n_bits, n_hashes))
                b.add_hashes(
                    grp["_h1"].to_numpy(np.int64), grp["_h2"].to_numpy(np.int64)
                )
        yield pd.DataFrame(
            [(s, b.bits.tobytes()) for s, b in acc.items()],
            columns=["shard", "bits"],
        )

    built = parted.mapInPandas(build_shards, "shard int, bits binary").collect()
    shards: dict[int, NumpyBloom] = {}
    for r in built:
        assert r["shard"] not in shards, "shard split across partitions"
        bits = np.frombuffer(r["bits"], dtype=np.uint64).copy()
        shards[r["shard"]] = NumpyBloom(n_bits, n_hashes, bits)
    return ShardedBloom(n_shards, shards)


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
    bloom: "NumpyBloom | CuckooFilter | ShardedCuckoo | None" = None,
) -> DataFrame:
    """Rows of `candidates` whose url is NOT in `seen` — exact.

    With a membership pre-filter (NumpyBloom or CuckooFilter — anything
    with a vectorized ``might_contain(h1, h2)``), only filter-positive
    rows enter the anti-join; negatives are provably unseen and bypass
    the shuffle.
    """
    if bloom is None:
        return candidates.join(
            seen.select(F.col(url_col).alias(url_col)), url_col, "left_anti"
        )

    sc = candidates.sparkSession.sparkContext
    b_obj = sc.broadcast(bloom)

    @pandas_udf(T.BooleanType())
    def might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        out = b_obj.value.might_contain(
            h1.to_numpy(np.int64), h2.to_numpy(np.int64)
        )
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
