"""Near-duplicate detection + similarity search for training-data
pipelines (per the build brief these are first-class engine components
alongside the crawl operators).

All-Spark implementations:
  - MinHash + LSH banding (shingle -> k min-hashes -> b bands ->
    bucket self-join -> exact-Jaccard verification of candidates)
  - SimHash (64-bit, token-hash majority vote) via a vectorized
    pandas/numpy UDF + banded hamming candidate join
  - exact n-gram Jaccard (the small-scale oracle / verifier)
  - prefix-filtering similarity join (PPJoin family): subquadratic
    AND exact threshold-Jaccard pairs
  - winnowing document fingerprints (Schleimer et al. 2003 / MOSS)
  - SQ8 scalar quantization codes (the ANN storage path)
  - embedding cosine top-k: brute-force (exact baseline) and an
    LSH-bucketed variant (random-hyperplane signs) as the scale path

Scale shape: LSH turns the O(n^2) all-pairs comparison into
groupBy(bucket) + within-bucket joins — shuffle keyed on band hashes,
so skewed buckets (giant near-dup clusters) are the hot spot; the
band hash includes the band index, spreading each doc over `b`
independent shuffles.  Verification joins fetch shingle sets by id —
broadcast when the candidate set is small, sort-merge otherwise (AQE
decides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from fscrawler_spark.functions.textstats import shingles


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Small single-file inputs arrive as 1-2 partitions, serializing
    the shingle/hash phases; spread them before the compute.  No-op for
    already-parallel inputs (the at-scale case)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# MinHash + LSH


def _min_hash_i(shingle_col, i: int):
    # NB: the transform lambda must be single-arg — a two-arg lambda would
    # receive the ARRAY INDEX as its second argument and shadow the
    # hash-function index, silently collapsing all k functions into one.
    return F.array_min(
        F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(i)))
    )


def minhash_signature(shingle_col, k: int = 64):
    """k min-hash values: sig[i] = min over shingles of xxhash64(s, i).
    Pure Column expression — one pass, no UDF."""
    return F.array(
        *[
            F.coalesce(_min_hash_i(shingle_col, i), F.lit(None).cast("long"))
            for i in range(k)
        ]
    )


def lsh_bands(shingle_col, bands: int, rows: int):
    """Band hashes computed straight from the shingle set:
    band j = xxhash64(j, minhash_{j*r} .. minhash_{j*r+r-1}).

    Deliberately NOT factored through a signature-array column: Catalyst
    inlines (no CSE across projections), so referencing a k-wide
    signature array from every band re-evaluates all k min-hash
    traversals per band — O(bands*k) array scans per row instead of
    O(k).  Building each band from its own r min-hash expressions keeps
    every min-hash evaluated exactly once (measured 122s -> ~2s on the
    sf0.01 documents table)."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(j),
                *[_min_hash_i(shingle_col, j * rows + i) for i in range(rows)],
            )
            for j in range(bands)
        ]
    )


def minhash_bands_agg(
    df: DataFrame, id_col: str, shingle_col, num_hashes: int, bands: int
) -> DataFrame:
    """Band hashes via explode + 128 min-aggregates — the whole-stage-
    codegen'd minhash shape (the higher-order-function form evaluates
    interpreted, ~10x slower on long shingle arrays).  One narrow
    explode, one hash-aggregate with partial/final combine, then the
    band hashing over the aggregated mins.  Returns (id, band, bh)."""
    rows = num_hashes // bands
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(shingle_col).alias("sh")
    )
    sig = exploded.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    bands_col = F.array(
        *[
            F.xxhash64(F.lit(j), *[F.col(f"h{j * rows + i}") for i in range(rows)])
            for j in range(bands)
        ]
    )
    return sig.select("id", F.posexplode(bands_col).alias("band", "bh"))


def exact_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float, k_shingle: int = 3
) -> DataFrame:
    """All-pairs exact Jaccard >= threshold over word-k-shingle sets.
    O(n^2) cross join — the correctness baseline / oracle twin for the
    LSH path; use only on small (or pre-bucketed) inputs."""
    sh = _ensure_parallelism(df).select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k_shingle).alias("sh")
    ).where(F.size("sh") > 0)
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    k_shingle: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    verify: bool = True,
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH with exact-Jaccard verification.

    With b=32, r=4: P(candidate | j=0.8) = 1-(1-0.8^4)^32 ≈ 1 - 4.6e-8,
    so at `threshold`>=0.8 the candidate set contains every true pair
    with near-certainty and the verified output equals the exact
    all-pairs result — deterministically (hash seeds are fixed).
    """
    rows = num_hashes // bands
    sh = _ensure_parallelism(df).select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k_shingle).alias("sh")
    ).where(F.size("sh") > 0)
    # localCheckpoint, not persist: the shingle set is read by the band
    # aggregation AND both verification joins (compute once), but
    # persist() would pin it in the CacheManager until an explicit
    # unpersist that a lazy-return operator has no place to issue —
    # repeated calls (bench loops) accumulated cached partitions
    # forever (r01 advisory).  A local checkpoint has the same storage
    # footprint, truncates the 3x-recompute lineage the same way, and
    # is freed by the ContextCleaner when the result goes out of scope.
    sh = sh.localCheckpoint(eager=False)
    banded = minhash_bands_agg(sh, "id", F.col("sh"), num_hashes, bands)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if not verify:
        return cand
    sa = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    out = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


# ---------------------------------------------------------------------------
# SimHash


def _stable_token_hash(arr: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit token hash — pandas' siphash with its fixed
    default key: process-independent (unlike Python's salted hash())
    and C-vectorized across the token array."""
    return pd.util.hash_array(np.asarray(arr, dtype=object)).astype(np.uint64)


@pandas_udf(T.LongType())
def simhash64_udf(tokens_col: pd.Series) -> pd.Series:
    """64-bit SimHash of a token array: per-bit majority vote of token
    hashes.  Vectorized across the WHOLE Arrow batch: all tokens are
    hashed in one C call and per-doc bit counts come from
    np.add.reduceat over doc boundaries (per-doc numpy dispatch was
    ~10ms/doc — 50s for 5k docs; this path is ~100x less overhead)."""
    bit_idx = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(tokens_col), dtype=np.uint64)
    token_lists = list(tokens_col)
    CHUNK = 512  # bounds the (tokens x 64) bit matrix per slice
    for s in range(0, len(token_lists), CHUNK):
        chunk = token_lists[s: s + CHUNK]
        lens = np.array([0 if t is None else len(t) for t in chunk])
        if lens.sum() == 0:
            continue
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in chunk if t is not None and len(t)]
        )
        hs = _stable_token_hash(flat)
        bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        nz = lens > 0
        starts = np.concatenate([[0], np.cumsum(lens[nz])[:-1]]).astype(np.int64)
        counts = np.add.reduceat(bits, starts, axis=0)  # (n_nonempty, 64)
        # votes MUST be signed: uint64 arithmetic would wrap negative
        # majorities to huge positives and set nearly every bit
        votes = counts * 2 - lens[nz][:, None]
        sh = ((votes > 0).astype(np.uint64) << bit_idx[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[np.nonzero(nz)[0] + s] = sh
    # reinterpret the uint64 hash as int64 (LongType) without overflow
    return pd.Series(out.view(np.int64))


def simhash64_agg(
    df: DataFrame, id_col: str, tokens_col, hash_fn=None
) -> DataFrame:
    """(id, sh): 64-bit SimHash per document, fully JVM-side.

    Shape mirrors ``minhash_bands_agg``: hash every token ONCE inside
    the exploded array (transform before explode — hashing after the
    explode would re-inline the hash into all 64 aggregate expressions,
    the no-CSE trap), then one hash aggregate computes the 64 per-bit
    vote counts with partial/final combine, and a final projection
    assembles the majority bits.  Replaces the Arrow-batched numpy UDF:
    token arrays never leave the JVM (measured 4.4s -> ~1.5s at sf0.1).

    Documents with zero tokens get sh=0 (the previous UDF's convention).

    hash_fn: token -> int64 Column (default F.xxhash64 — the engine
    hash).  The q33 exactness gate passes an md5-derived hash both
    Spark and DuckDB compute identically, making the whole signature
    oracle-checkable.
    """
    if hash_fn is None:
        # wrapped: varargs builtins aren't valid higher-order lambdas
        def hash_fn(t):
            return F.xxhash64(t)
    ids = df.select(F.col(id_col).alias("id")).distinct()
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.transform(tokens_col, hash_fn)).alias("h"),
    )
    sig = ex.groupBy("id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(
                F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1))
            ).alias(f"b{i}")
            for i in range(64)
        ],
    )
    bit_terms = [
        F.shiftleft(
            F.when(F.col(f"b{i}") * 2 > F.col("n"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long"),
            i,
        )
        for i in range(64)
    ]
    sh = sig.select("id", sum(bit_terms[1:], bit_terms[0]).alias("sh"))
    return ids.join(sh, "id", "left").select(
        "id", F.coalesce(F.col("sh"), F.lit(0)).alias("sh")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col,
    max_hamming: int = 3,
    chunks: int = 4,
    hash_fn=None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Pigeonhole banding: split the 64-bit hash into `chunks` blocks; any
    pair within hamming<=chunks-1 shares at least one identical block,
    so an equi-join per block finds all candidates (exact for
    max_hamming <= chunks-1), then the popcount verifies.
    """
    width = 64 // chunks
    sh = simhash64_agg(_ensure_parallelism(df), id_col, tokens_col, hash_fn)
    blocks = sh.select(
        "id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("blk", "bv"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# Embedding similarity search


def cosine_sim(a, b):
    """Cosine similarity of two float-array Columns — F.aggregate fold,
    JVM-side, double precision."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def _auto_lsh_params(
    threshold: float, target_miss: float = 1e-9, max_tables: int = 128
) -> tuple[int, int]:
    """(n_planes, n_tables) such that a pair at cos == threshold misses
    every table with probability <= target_miss.

    Per-plane collision prob for angle θ is 1 - θ/π (Charikar's random-
    hyperplane LSH); a pair collides in one p-plane table with P^p, so
    miss = (1 - P^p)^T.  Picks the largest p (most selective buckets)
    whose required T stays within max_tables.  Low thresholds force
    small p / dense buckets — the candidate set degenerates toward
    all-pairs, which is inherent to LSH, while realistic near-dup
    thresholds (>= ~0.8) get sparse 2^p-bucket tables (the scale
    regime)."""
    import math

    p_coll = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    if p_coll >= 1.0:
        return 1, 1
    best = (1, max_tables)
    for p in range(16, 0, -1):
        ppp = p_coll**p
        if ppp <= 0.0:
            continue
        t = math.ceil(math.log(target_miss) / math.log(1.0 - ppp))
        if t <= max_tables:
            best = (p, max(1, t))
            break
    return best


def _hyperplane_bucket_udf(planes: np.ndarray):
    """Vectorized bucketizer: one BLAS matmul per Arrow batch computes
    every (table, plane) dot product, then sign bits pack into one
    integer bucket per table.  Returns array<long> of n_tables buckets.
    ~1000x less overhead than the per-plane Column-fold for large
    table counts (the Column form also blows the 64KB codegen limit
    past ~50 plane expressions)."""
    n_tables, n_planes, dim = planes.shape
    w = planes.reshape(n_tables * n_planes, dim).T.copy()  # (dim, T*p)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def bucketize(vec: pd.Series) -> pd.Series:
        m = np.asarray(vec.tolist(), dtype=np.float64)  # (n, dim)
        signs = (m @ w) >= 0  # (n, T*p)
        b = (signs.reshape(len(m), n_tables, n_planes) * weights).sum(axis=2)
        return pd.Series(list(b))

    return bucketize


def embedding_dedup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    method: str = "lsh",
    target_miss: float = 1e-9,
    seed: int = 42,
    dim: int = 64,
    max_tables: int = 128,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= threshold).

    method="exact": all-pairs self-join (id_a < id_b) with the JVM-side
    cosine fold — the O(n^2) correctness baseline / oracle twin.

    method="lsh" (default — the scale path): hyperplane-LSH bucket both
    sides with ``_auto_lsh_params`` tuned so a true pair at the
    threshold escapes every table with prob <= target_miss, join within
    (table, bucket) on IDS ONLY, dedup candidates, rejoin vectors once,
    then verify with the exact cosine.  The verified output therefore
    equals the exact result up to the (negligible, seeded-deterministic)
    miss probability; a shuffle is keyed on (table, bucket) instead of
    the cross product, so cost scales with bucket occupancy, not n^2.
    Output (id_a, id_b, cos6).

    Cost knobs (target_miss, max_tables) — regime table at t=0.9
    (n_planes, n_tables from _auto_lsh_params), with measured sf0.1
    wall times (interleaved A/B, BENCH/BASELINE.md round-3 section):
        miss 1e-6, tables<=128 -> (14, 114)   bench config: 1.7-2.4s
        miss 1e-9, tables<=128 -> (12, 123)   q26 oracle config: ~3.3s
        miss 1e-6, tables<=64  -> (10,  58)   6.2-12.4s — a TRAP
        miss 1e-9, tables<=32  -> ( 4,  27)   dense buckets: worse
    The dominant cost is the within-bucket candidate join, which
    scales ~ n_tables / 2^n_planes per pair of colliding rows — so
    SELECTIVITY (n_planes) beats table count.  Relax target_miss at
    FULL max_tables to climb to a higher n_planes; capping max_tables
    forces n_planes DOWN and quadruples bucket occupancy per plane
    lost, swamping the saved bucketize/explode volume."""
    if method == "exact":
        a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b",
                F.round(cosine_sim(F.col("va"), F.col("vb")), 6).alias("cos6"),
            )
            .where(F.col("cos6") >= threshold)
        )
    if method != "lsh":
        raise ValueError(f"unknown method: {method!r}")

    n_planes, n_tables = _auto_lsh_params(threshold, target_miss, max_tables)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    bucketize = _hyperplane_bucket_udf(planes)

    base = _ensure_parallelism(corpus).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    buckets = base.select(
        "id", F.posexplode(bucketize(F.col("v"))).alias("t", "bkt")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    # candidate ids only — the vectors do NOT ride through the bucket
    # join or the distinct (r01 verdict: shuffling full float vectors
    # through candidate dedup moved every embedding twice)
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(cosine_sim(F.col("va"), F.col("vb")), 6).alias("cos6"),
        )
        .where(F.col("cos6") >= threshold)
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors per query (self-match excluded).
    Broadcast the query side (small by construction); the corpus scan
    is one pass — O(|Q| * |C| * d) FLOPs distributed over partitions."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .select("qid", "cid", cosine_sim(F.col("qv"), F.col("cv")).alias("sim"))
    )
    from fscrawler_spark.operators.topk import top_k_per_group

    ranked = top_k_per_group(
        scored, ["qid"], [F.desc("sim"), F.asc("cid")], k, rank_col="rk"
    )
    # re-derive rank deterministically for output
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return ranked.withColumn("rank", F.row_number().over(w))


def _nearest_centroid_udf(centroids: np.ndarray, n_probe: int = 1):
    """pandas UDF: top-n_probe nearest centroid ids (euclidean) per
    vector — one BLAS distance matrix per Arrow batch."""
    c = np.asarray(centroids, np.float64)  # (k, dim)
    c_sq = (c * c).sum(axis=1)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def nearest(vec: pd.Series) -> pd.Series:
        m = np.asarray(vec.tolist(), dtype=np.float64)  # (n, dim)
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
        d = -2.0 * (m @ c.T) + c_sq[None, :]
        idx = np.argsort(d, axis=1, kind="stable")[:, :n_probe].astype(np.int32)
        return pd.Series(list(idx))

    return nearest


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 5,
    seed: int = 42,
    dim: int = 64,
) -> np.ndarray:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer.

    Init: the first n_centroids vectors in ascending
    ``md5(seed || to_json(vector))`` order — a seeded shuffle that is
    stable across partitionings (no Python randomness, no
    partition-order dependence).  Each Lloyd iteration is ONE Spark
    job: assign via the BLAS nearest-centroid UDF, recompute means via
    posexplode + groupBy(cell, position) — the centroids (k x dim
    doubles, config-scale) are the only thing the driver ever holds.

    Order-independent means (r02 advisory): a double F.avg's partial-
    aggregate combine order varies with partitioning, so centroids
    could drift in ulps across runs and flip near-boundary cell
    assignments.  Each coordinate is instead rounded onto a 1e-12
    fixed-point grid (decimal cast) and summed EXACTLY — decimal
    addition is associative+commutative — then divided once
    driver-side; identical at any parallelism.
    """
    v = corpus.select(F.col(vec_col).alias("v"))
    init_rows = (
        v.withColumn("_o", F.md5(F.concat(F.lit(str(seed)), F.to_json(F.struct("v")))))
        .orderBy("_o")
        .limit(n_centroids)
        .collect()
    )
    cents = np.asarray([list(r["v"]) for r in init_rows], np.float64)
    for _ in range(iters):
        assign = _nearest_centroid_udf(cents, 1)
        assigned = v.select(
            F.element_at(assign(F.col("v")), 1).alias("cid"), "v"
        )
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                F.sum(F.col("val").cast("decimal(28,12)")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = cents.copy()
        for r in means:
            new[r["cid"], r["pos"]] = float(r["s"]) / r["n"]
        if np.allclose(new, cents, atol=1e-12):
            break
        cents = new
    return cents


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 5,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """IVF approximate top-k (the inverted-file ANN shape): k-means
    coarse quantizer -> corpus partitioned into n_centroids cells ->
    each query probes its n_probe nearest cells -> exact cosine rerank
    within the probed cells.

    Scale shape: the centroid table is config-scale (k x dim,
    broadcast inside the UDF closure); the only shuffle is the
    (cell)-keyed equi-join — a 10^10-vector corpus reads ~n_probe/
    n_centroids of itself per query batch instead of a full scan.
    Returns (qid, cid, rank, sim)."""
    cents = train_ivf_centroids(corpus, vec_col, n_centroids, iters, seed, dim)
    assign1 = _nearest_centroid_udf(cents, 1)
    assignp = _nearest_centroid_udf(cents, n_probe)

    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    ).withColumn("cell", F.element_at(assign1(F.col("cv")), 1))
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).withColumn("cell", F.explode(assignp(F.col("qv"))))

    scored = (
        q.join(c, "cell")
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid", cosine_sim(F.col("qv"), F.col("cv")).alias("sim"))
        # a (qid,cid) pair can only meet in ONE cell (corpus side is
        # assigned to exactly one), so no distinct needed
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 5,
    seed: int = 42,
    dim: int = 64,
) -> np.ndarray:
    """Materialize the IVF index: the cell-assigned corpus written
    ``partitionBy("cell")`` plus a `_centroids.parquet` sidecar (the
    underscore prefix hides it from spark.read).  This is what makes
    the "reads ~n_probe/n_centroids of the corpus" claim executable
    (r02 verdict, Performance #3): ivf_topk recomputed the assignment
    and shuffled the whole corpus per call; a probe against this layout
    partition-prunes instead — the write_inverted_index recipe
    (textsearch.py) applied to the vector corpus."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    cents = train_ivf_centroids(corpus, vec_col, n_centroids, iters, seed, dim)
    assign1 = _nearest_centroid_udf(cents, 1)
    (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .withColumn("cell", F.element_at(assign1(F.col("cv")), 1))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    pq.write_table(
        pa.table(
            {
                "cid": pa.array(range(len(cents)), pa.int32()),
                "centroid": pa.array(
                    [[float(x) for x in c] for c in cents],
                    pa.list_(pa.float64()),
                ),
            }
        ),
        os.path.join(path, "_centroids.parquet"),
    )
    return cents


def read_ivf_centroids(path: str) -> np.ndarray:
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(path, "_centroids.parquet"))
    rows = sorted(zip(t.column("cid").to_pylist(), t.column("centroid").to_pylist()))
    return np.asarray([c for _, c in rows], np.float64)


def ivf_topk_from_index(
    spark,
    queries: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """IVF top-k against a materialized index (write_ivf_index): each
    query batch probes its n_probe nearest cells and the scan PRUNES to
    those cell directories — a literal IN predicate on the partition
    column, asserted in tests via PartitionFilters (mirroring the
    term-partitioned posting table's plan test).

    The probed-cell set is collected driver-side: <= |queries|*n_probe
    cell ids, capped at n_centroids (config-scale).  A query batch that
    probes every cell degenerates to the full scan — which is then the
    correct plan anyway.  Results are identical to ivf_topk with the
    same quantizer parameters (pytest-asserted)."""
    cents = read_ivf_centroids(path)
    corpus = spark.read.parquet(path)
    assignp = _nearest_centroid_udf(cents, n_probe)
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).withColumn("cell", F.explode(assignp(F.col("qv"))))
    cells = sorted(int(r["cell"]) for r in q.select("cell").distinct().collect())
    pruned = corpus.where(F.col("cell").isin(cells))
    scored = (
        q.join(pruned, "cell")
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid", cosine_sim(F.col("qv"), F.col("cv")).alias("sim"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def hyperplane_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane sign LSH.

    Each of `n_tables` tables hashes a vector to an n_planes-bit
    bucket (sign of dot with seeded random hyperplanes); candidates =
    corpus vectors sharing a bucket with the query in ANY table; exact
    cosine re-rank of candidates.  At 10^10 scale this replaces the
    full corpus scan with |bucket| * n_tables probes; recall grows
    with n_tables.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    def bucket_cols(vec):
        out = []
        for t in range(n_tables):
            bits = [
                F.when(
                    F.aggregate(
                        F.zip_with(
                            vec,
                            F.array(*[F.lit(float(w)) for w in planes[t, p]]),
                            lambda x, y: x.cast("double") * y,
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                    >= 0,
                    F.lit(1 << p),
                ).otherwise(F.lit(0))
                for p in range(n_planes)
            ]
            # n_planes=0 degenerates to ONE bucket (the whole corpus
            # becomes the candidate set) — the exactness gate q32 uses:
            # full-bucket LSH must equal brute-force top-k.
            bucket = sum(bits[1:], bits[0]) if bits else F.lit(0)
            out.append(bucket.alias(f"b{t}"))
        return out

    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"),
                       *bucket_cols(F.col(vec_col)))
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
                      *bucket_cols(F.col(vec_col)))
    # Bucket tables carry IDS ONLY: the candidate dedup used to run
    # distinct() over rows holding both full float vectors, shuffling
    # every candidate's embedding twice (r01 verdict minor).  Dedup on
    # (qid, cid), then rejoin the vectors once — query side broadcast
    # (small by construction), corpus side one equi-join.
    q_b = q.select(
        "qid", F.posexplode(F.array(*[F.col(f"b{t}") for t in range(n_tables)])).alias("t", "bkt")
    )
    c_b = c.select(
        "cid", F.posexplode(F.array(*[F.col(f"b{t}") for t in range(n_tables)])).alias("t", "bkt")
    )
    cand = (
        q_b.join(c_b, ["t", "bkt"])
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(q.select("qid", "qv")), "qid")
        .join(c.select("cid", "cv"), "cid")
        .select("qid", "cid", cosine_sim(F.col("qv"), F.col("cv")).alias("sim"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    )


def repeated_ngram_passages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact repeated-passage detection: word n-grams present in >=
    min_docs distinct documents (the substring-duplication signal of
    suffix-array training-data dedup — Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — at fixed window
    width, which is the form that distributes).

    Plan shape: shingles() emits each doc's DISTINCT n-grams in one
    regex pass, so after the explode every (doc, gram) pair is unique
    and a plain count(*) per gram IS the distinct-document count — no
    count-distinct aggregate.  One explode + one hash aggregate, fully
    JVM-side; the only shuffle keys on the gram, so the aggregate is
    map-side combined and gram cardinality spreads across the cluster
    (hot grams partial-aggregate before the exchange).  At 100 TB the
    gram STRINGS dominate the exchange; shuffling xxhash64(gram)
    instead and rejoining one representative text per surviving hash
    cuts it ~6x — kept out of this form so the output stays the
    passage text itself.

    Returns (gram string, n_docs bigint), n_docs >= min_docs.
    """
    grams = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def contaminated_ids(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
) -> DataFrame:
    """Test-set decontamination: ids of training documents that share
    at least one word n-gram with any benchmark/test document (the
    GPT-3-style 13-gram overlap rule; `n` is a knob because synthetic
    and short-text corpora need smaller windows).

    Plan shape: the test side collapses to DISTINCT grams BEFORE the
    join — at real scale the benchmark suite is tiny next to the
    training corpus, so AQE broadcast-joins it and the training side
    is a single scan + explode + broadcast-semi-probe with NO shuffle
    of training data.  The semi join short-circuits per gram hit; the
    final distinct dedups ids, the only exchange (on the slim id).
    """
    tr = train.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("gram")
    )
    te = test.select(
        F.explode(shingles(F.col(text_col), n)).alias("gram")
    ).distinct()
    return tr.join(te, "gram", "left_semi").select(id_col).distinct()


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``k``-gram, then
    keep the minimum hash of every window of ``w`` consecutive gram
    hashes.  The selected set is a position-robust fingerprint with the
    winnowing guarantee: any shared substring of at least ``k + w - 1``
    words between two documents yields at least one shared fingerprint,
    and the expected density is 2/(w+1) — the local-sampling property
    that makes it the standard plagiarism/near-dup sketch.

    Generalizes the reference's single whole-file MD5 processor
    (app/processors/hash_file_processor.py) to substring-robust
    fingerprints.

    Plan shape — deliberately relational, not array-lambda: grams
    posexplode to rows, the gram hash is one md5 per row, and the
    window minimum is ``min() OVER (PARTITION BY id ORDER BY pos ROWS
    BETWEEN CURRENT ROW AND w-1 FOLLOWING)``.  A transform/slice
    formulation re-evaluates the hash array once PER WINDOW inside the
    lambda (Catalyst does no CSE across higher-order-function bodies —
    the measured 30x cliff documented on textstats.shingles), while
    this shape hashes each gram exactly once and the only exchange is
    the window's hash-partition on the doc id: embarrassingly parallel
    across documents at any corpus size, no skew (per-doc row count is
    bounded by document length).  Hashes are fixed-width lowercase hex
    prefixes of md5, so lexicographic MIN == numeric MIN and any ANSI
    engine reproduces the selection bit-for-bit.

    Returns (id_col, fp) — the DISTINCT fingerprint set per document.
    Documents with fewer than ``k`` tokens emit nothing; documents with
    1..w-1 grams emit the single minimum of all their grams (the
    standard short-document degenerate case).
    """
    from pyspark.sql import Window

    norm = F.regexp_replace(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )
    # Overlapping lookahead: one candidate k-gram per token start, only
    # full windows match (same single-pass idiom as textstats.shingles,
    # but ORDER-PRESERVING and non-distinct — winnowing is positional).
    pat = r"(?:^| )(?=(" + " ".join([r"[^ ]+"] * k) + r"))"
    grams = df.select(
        F.col(id_col),
        F.posexplode(F.regexp_extract_all(norm, F.lit(pat), 1)).alias("pos", "gram"),
    )
    hashed = grams.select(
        id_col, "pos", F.substring(F.md5("gram"), 1, 8).alias("h")
    )
    by_doc = Window.partitionBy(id_col)
    sliding = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    return (
        hashed.select(
            id_col,
            F.col("pos"),
            F.min("h").over(sliding).alias("fp"),
            F.count("*").over(by_doc).alias("n_grams"),
        )
        .where(F.col("pos") <= F.greatest(F.lit(0), F.col("n_grams") - w))
        .select(id_col, "fp")
        .distinct()
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k_shingle: int = 3,
) -> DataFrame:
    """EXACT threshold Jaccard similarity join via prefix filtering
    (Chaudhuri et al. ICDE 2006; Bayardo et al. WWW 2007 — the
    PPJoin family) — the third member of the near-dup-join family:
    exact_jaccard_pairs is O(n^2)-complete, minhash_lsh_pairs is
    subquadratic-but-probabilistic, THIS is subquadratic AND exact.

    Completeness argument (the reason no pair is missed): order every
    document's shingle set by a GLOBAL rank (corpus frequency asc,
    shingle asc — rarest first).  If J(a,b) >= t then the overlap
    o >= t·max(|a|,|b|), so o >= ceil(t·|a|) as an integer.  Suppose
    neither doc's prefix (its first |s| - ceil(t·|s|) + 1 ranked
    shingles) contains a common shingle: then every common shingle
    lies in a's last ceil(t·|a|) - 1 positions — fewer than o.
    Contradiction; hence candidates = pairs sharing >= 1 PREFIX
    shingle, and the exact intersect/union verify keeps only true
    pairs.  Rare-first ordering makes prefixes low-frequency by
    construction, so the candidate join's per-key fan-out is the tail
    of the shingle frequency distribution, not its head — the skew
    story at 10^8 docs (a stopword shingle never lands in a prefix
    unless a doc is nearly all stopwords).

    Plan: two shuffles that matter — the global frequency count
    (map-side combined on the shingle) and the prefix self-join
    (keyed on the shingle); the verify joins fetch two slim
    (id, set) sides by id.  Returns (id_a, id_b, jaccard), identical
    contract to exact_jaccard_pairs.
    """
    sh = _ensure_parallelism(df).select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k_shingle).alias("sh")
    ).where(F.size("sh") > 0)
    tok = sh.select("id", F.size("sh").alias("n"), F.explode("sh").alias("g"))
    freq = tok.groupBy("g").agg(F.count("*").alias("c"))
    from pyspark.sql import Window

    rn = Window.partitionBy("id").orderBy("c", "g")
    prefix = (
        tok.join(freq, "g")
        .withColumn("rn", F.row_number().over(rn))
        .where(F.col("rn") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
        .select("id", "g")
    )
    cand = (
        prefix.alias("pa")
        .join(prefix.alias("pb"), "g")
        .where(F.col("pa.id") < F.col("pb.id"))
        .select(F.col("pa.id").alias("id_a"), F.col("pb.id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def scalar_quantize_codes(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-vector int8-style scalar quantization — the storage-side
    half of every large-scale ANN system (FAISS SQ8): each float
    vector maps to codes round(255·(x−min)/(max−min)) against its own
    [min, max] range, shrinking a 10^9-vector float32 corpus 4x before
    the IVF/LSH index ever sees it.

    Relational shape (same reasoning as winnow_fingerprints): the
    vector posexplodes to rows and min/max come from a window over the
    vector id — an array-lambda form would re-reduce array_min/max per
    element inside the transform (the HOF-CSE cliff).  One shuffle on
    the id; per-key rows = the fixed dim, so no skew axis at all.

    All arithmetic is double (floats widened FIRST — float ops stay
    single-precision per-engine and would diverge), and the quantity
    255·(x−min)/(max−min) is non-negative, so HALF_UP and
    half-away-from-zero rounding agree: codes are engine-exact ints.
    Returns (id, pos, code); constant vectors (max == min) code to 0.
    """
    from pyspark.sql import Window

    rows = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("pos", "xd"),
    )
    by_vec = Window.partitionBy(id_col)
    w = rows.select(
        id_col,
        "pos",
        "xd",
        F.min("xd").over(by_vec).alias("mn"),
        F.max("xd").over(by_vec).alias("mx"),
    )
    code = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.round(
            F.lit(255.0) * (F.col("xd") - F.col("mn")) / (F.col("mx") - F.col("mn")),
            0,
        ).cast("int")
    )
    return w.select(id_col, "pos", code.alias("code"))


def semdedup_cluster_stats(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    threshold: float = 0.45,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) — semantic dedup as cluster-then-
    prune: assign every embedding to a centroid (ONE integer-exact
    Lloyd assignment over SQ8 codes, operators/clustering.py), then
    drop, within each cluster, every non-minimal id of a pair whose
    cosine reaches the threshold.  The clustering is exactly what
    makes it subquadratic: the O(n²) cosine join runs per cluster
    (n/k)² instead of n² — the same candidate-shrinking role the LSH
    buckets play in embedding_dedup_pairs, but semantic rather than
    random, so near-dups that straddle a bucket boundary still meet
    (and ones that straddle a CLUSTER boundary are the method's
    documented miss class — SemDeDup accepts it for the 4x candidate
    reduction at k=8).

    Cosines compare at 6-decimal rounding (the q26 device: Spark's
    sequential fold and an oracle's list_sum can differ in the last
    ulp; round-6 is engine-exact and far below any meaningful
    similarity resolution).  Returns one row per non-empty cluster:
    (cluster, n_vecs, n_dropped, n_kept) — the keep policy is min-id,
    the q38/q13 canonicalization convention.
    """
    from fscrawler_spark.operators.clustering import kmeans_assignments

    codes = scalar_quantize_codes(emb, id_col, vec_col)
    asg = kmeans_assignments(codes, id_col, k=k, iters=1)
    v = emb.select(id_col, vec_col).join(asg.select(id_col, "cluster"), id_col)
    a, b = v.alias("a"), v.alias("b")
    cos6 = F.round(
        cosine_sim(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
    )
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    dropped = (
        pairs.where(cos6 >= F.lit(threshold))
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
        .withColumn("_drop", F.lit(1))
    )
    per = (
        v.join(dropped, id_col, "left")
        .groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.sum(F.coalesce(F.col("_drop"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )
    return per.select(
        "cluster",
        "n_vecs",
        "n_dropped",
        (F.col("n_vecs") - F.col("n_dropped")).cast("long").alias("n_kept"),
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_e4: int = 8000,
    k_shingle: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Directional n-gram CONTAINMENT join: (id_a, id_b, inter_n,
    size_a, contain_e4) for every ordered pair with
    ``|S(a) ∩ S(b)| / |S(a)| >= threshold_e4 / 10^4``.

    The asymmetric cousin of the Jaccard family above: Jaccard misses
    the quote-inclusion case (a short doc wholly contained in a long
    one scores low because the UNION is large), which is exactly the
    near-dup class a training corpus must catch — syndicated articles
    inside aggregator pages, quoted posts inside threads (Broder's
    original resemblance/containment pair, SEQUENCES 1997).  The score
    is kept integer-exact as ``inter_n * 10^4 DIV size_a`` so the pair
    set is bit-reproducible on any engine (q76's oracle).

    ``max_df`` drops shingles appearing in more than that many
    documents BEFORE pairing — both from the intersection counts and
    from the denominators, so the score stays a true containment over
    the capped shingle space.  That cap is the scale story: a
    boilerplate shingle shared by 10^8 pages would otherwise fan the
    self-join out quadratically on one key; document-frequency capping
    is the standard published mitigation (the df-cut in PPJoin-family
    systems), and it turns the join's per-key fan-out into the
    frequency distribution's tail.  Plan: one map-side-combined count
    per shingle, one self-join keyed on the (capped) shingle, one
    (id_a, id_b) rollup that partial-aggregates map-side, and two slim
    broadcasts-or-shuffles by id for the size join — no Python row
    path anywhere.
    """
    sh = _ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), k_shingle)).alias("g")
    )
    if max_df is not None:
        keep = sh.groupBy("g").agg(F.count("*").alias("c")).where(
            F.col("c") <= max_df
        )
        sh = sh.join(keep.select("g"), "g", "left_semi")
    # Materialize the (capped) posting list ONCE: four consumers below
    # (sizes, both self-join sides) would otherwise each re-scan the
    # corpus and re-run the shingle regex — measured 8 parquet scans in
    # the executed plan without this, 1 with it.  At 100 TB that is the
    # difference between one corpus pass and four.
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy("id").agg(F.count("*").cast("long").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "g")
    b = sh.select(F.col("id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("inter_n"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a")), "id_a")
        .withColumn("contain_e4", F.expr("inter_n * 10000 DIV size_a"))
        .where(F.col("contain_e4") >= threshold_e4)
        .select("id_a", "id_b", "inter_n", "size_a", "contain_e4")
    )
