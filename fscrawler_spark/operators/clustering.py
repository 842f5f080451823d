"""Integer-exact k-means (Lloyd's) over SQ8-quantized vectors.

The corpus-clustering stage published pipelines run between embedding
and sampling (cluster-balanced data selection, FineWeb/DCLM-style
topic buckets; SemDeDup clusters before intra-cluster dedup).  The
reference has no vector stage at all (SURVEY §2.8 builds the family
from scratch); this operator closes the gap between the repo's ANN
indexes (IVF cells are themselves a one-shot assignment) and a real
iterative clustering.

Why integer k-means: float Lloyd's can never be oracle-checked — the
centroid means depend on partition summation order.  Over SQ8 codes
(operators/similarity.scalar_quantize_codes, q53: engine-exact ints
0..255) every quantity below is int64:

- squared L2 distance  d(v,c) = Σ code² + Σ ccode² − 2·Σ code·ccode
- assignment            argmin_c (d, c)  — lexicographic, ties to the
                        smallest cluster id
- centroid update       ccode' = Σ code DIV n  (floor division; both
                        operands non-negative, so Spark's `DIV` and
                        DuckDB's `//` agree)

so assignments, centroids, and inertia are bit-identical across runs,
partitionings, AND engines — the q67 oracle unrolls the iterations as
DuckDB CTEs and hash-matches (the q42 integer-PageRank recipe).

Seeding is deterministic and engine-shared: the k vectors with the
smallest md5(CAST(id AS STRING)) (ties by id) — the same md5-order
device the q39 sampler proved out.

Scale shape (the reason for each move):
- the centroid side is k·d rows (k clusters × fixed dim) — broadcast
  by construction; the assignment join never shuffles the codes table.
- the dot product groupBy(id, cluster) partial-aggregates map-side:
  the n·d·k join fan-out collapses to n·k before the exchange.
- the centroid update groupBy(cluster, pos) is k·d output rows —
  map-side combine does all the work; no skew axis (per-key rows are
  bounded by n/k only in the pathological all-one-cluster case, which
  partial aggregation absorbs).
- each iteration ends in localCheckpoint(eager=True) — the
  connected-components plan-flatness recipe (operators/graph.py):
  otherwise T iterations stack into one Catalyst plan.
- empty clusters keep their previous centroid (left join + coalesce),
  so the cluster count is stable and the oracle needs no existence
  case-split.

At 10^9+ vectors the assignment is exactly the brute-force scan the
IVF index (operators/similarity.py) exists to avoid — there you run
ONE k-means on a sample to build cells, then assign via the index.
This operator IS that index-build step; iters and k stay small by
design (Lloyd's over a corpus sample), which is why brute-force
assignment is the honest physical plan here.

Reference parity note: FsCrawler has no clustering; this extends the
dedup family (SURVEY §2.8) the same way q38's connected components
did — cited there to ProcessedFilesFilter's intent (keep one copy per
group) at file scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_seed_centroids(codes: DataFrame, id_col: str, k: int) -> DataFrame:
    """Deterministic seeds: the k ids with the smallest
    md5(CAST(id AS STRING)) (ties by id), numbered 0..k-1 in that
    order.  Returns (cluster:long, pos, ccode:long)."""
    from pyspark.sql import Window

    ids = codes.select(id_col).distinct()
    w = Window.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    seeds = (
        ids.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(id_col, (F.col("_rk") - 1).cast("long").alias("cluster"))
    )
    return codes.join(seeds, id_col).select(
        "cluster", "pos", F.col("code").cast("long").alias("ccode")
    )


def _run_lloyd(codes: DataFrame, id_col: str, k: int, iters: int):
    """The shared Lloyd loop: returns (assign, cent) after `iters`
    rounds — assign is (id, cluster, d2) from the LAST assignment
    step, cent the centroids after the last update."""
    c = codes.select(
        F.col(id_col).alias("id"),
        F.col("pos").cast("int").alias("pos"),
        F.col("code").cast("long").alias("code"),
    ).localCheckpoint(eager=True)

    # Per-vector squared norm: computed once, reused every iteration.
    sq_v = (
        c.groupBy("id")
        .agg(F.sum(F.col("code") * F.col("code")).alias("sq_v"))
        .localCheckpoint(eager=True)
    )

    cent = kmeans_seed_centroids(
        c.select(F.col("id").alias(id_col), "pos", "code"), id_col, k
    ).localCheckpoint(eager=True)

    assign = None
    for _ in range(iters):
        sq_c = cent.groupBy("cluster").agg(
            F.sum(F.col("ccode") * F.col("ccode")).alias("sq_c")
        )
        dots = (
            c.join(F.broadcast(cent), "pos")
            .groupBy("id", "cluster")
            .agg(F.sum(F.col("code") * F.col("ccode")).alias("dot"))
        )
        dist = (
            dots.join(F.broadcast(sq_c), "cluster")
            .join(sq_v, "id")
            .select(
                "id",
                "cluster",
                (F.col("sq_v") + F.col("sq_c") - 2 * F.col("dot")).alias("d2"),
            )
        )
        assign = (
            dist.groupBy("id")
            .agg(F.min(F.struct("d2", "cluster")).alias("m"))
            .select("id", F.col("m.cluster").alias("cluster"), F.col("m.d2").alias("d2"))
            .localCheckpoint(eager=True)
        )
        sums = (
            c.join(assign.select("id", "cluster"), "id")
            .groupBy("cluster", "pos")
            .agg(F.sum("code").alias("s"), F.count("*").alias("n"))
        )
        cent = (
            cent.select("cluster", "pos", F.col("ccode").alias("prev"))
            .join(sums, ["cluster", "pos"], "left")
            .select(
                "cluster",
                "pos",
                F.coalesce(F.expr("s DIV n"), F.col("prev")).alias("ccode"),
            )
            .localCheckpoint(eager=True)
        )

    return assign, cent


def kmeans_assignments(
    codes: DataFrame, id_col: str, k: int = 8, iters: int = 1
) -> DataFrame:
    """The per-vector view of the same loop: (id_col, cluster, d2)
    from the final assignment step — with iters=1 this is the one-shot
    assignment against the md5-order seed centroids, the cluster pass
    SemDeDup-style pipelines run before intra-cluster dedup."""
    assign, _ = _run_lloyd(codes, id_col, k, iters)
    return assign.select(
        F.col("id").alias(id_col), "cluster", "d2"
    )


def kmeans_codes(
    codes: DataFrame,
    id_col: str,
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Run `iters` Lloyd iterations over integer codes (id, pos, code).

    Each iteration: assign every vector to the nearest current centroid
    (squared L2, ties to the smallest cluster id), then recompute each
    centroid as the per-position floor-mean of its members (empty
    clusters keep their previous centroid).  Returns the FINAL
    per-cluster profile — one row per cluster:

      cluster, n_vecs, sum_ids (exact member-set fingerprint),
      centroid_l1 (Σ final ccode), inertia (Σ member distances at the
      last assignment) — all int64, engine-exact.
    """
    assign, cent = _run_lloyd(codes, id_col, k, iters)

    profile = assign.groupBy("cluster").agg(
        F.count("*").alias("n_vecs"),
        F.sum("id").alias("sum_ids"),
        F.sum("d2").alias("inertia"),
    )
    l1 = cent.groupBy("cluster").agg(F.sum("ccode").alias("centroid_l1"))
    return (
        l1.join(profile, "cluster", "left")
        .select(
            "cluster",
            F.coalesce("n_vecs", F.lit(0)).cast("long").alias("n_vecs"),
            F.coalesce("sum_ids", F.lit(0)).cast("long").alias("sum_ids"),
            F.col("centroid_l1").cast("long").alias("centroid_l1"),
            F.coalesce("inertia", F.lit(0)).cast("long").alias("inertia"),
        )
    )
