"""Bandwidth-light scaling leg — the round-3 verdict's attribution
experiment ("Next round" #2).

The crawl job's N-vs-4N scaling sits at ~0.75 on this box, attributed
(via the pinned-affinity protocol, BENCH/BASELINE.md round 3) to
SHARED MEMORY BANDWIDTH: the single-VM legs contend for one memory
system, which real N and 4N executor fleets each bring in full.  That
attribution makes a testable prediction: a job with the same Spark
SHAPE (wide shuffles, hash aggregates, equi-joins, the same per-wave
job cadence) but an int/ALU-heavy working set — 8-byte hash values
instead of html/text strings, so per-core memory traffic is a small
fraction of the crawl's — should scale close to ideal on the very same
box.  If it does, the 0.75 is the box's string-bandwidth wall, not an
engine serialization; if it too plateaus, there is a real serial stage
to find.

The job, per round (mirrors one crawl wave's plan shape, stringless):
  base      range(ROWS) -> two JVM hashes per row     (the hash pass)
  agg       groupBy(pmod(h1, BUCKETS)) count+sum+xor  (wide shuffle,
                                                       partial combine)
  join      base equi-join agg on the bucket key      (shuffle join —
            broadcast is disabled so the exchange is exercised)
  verify    global xor/sum checksum                   (the collect)

Outputs are order-independent integer checksums, asserted IDENTICAL at
both parallelism levels (same determinism contract as the crawl runs).
Throughput = rows hashed+joined per second; eff = (thr_4N/thr_N)/4.

Usage:  python BENCH/scaling_alu.py [--rows 30000000] [--rounds 4]
                                    [--n-cores 2] [--cpus-per-worker 4]
Writes: BENCH/scaling_alu_result.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from fscrawler_spark.session import get_spark, stop_spark  # noqa: E402

BUCKETS = 4096


def compute_round(spark, rows: int, salt: int, chain: int) -> tuple[int, int]:
    """Compute-ONLY wave: chained hashes -> map-side partial aggregate.
    One stage, no wide exchange, no rows materialized — per-core memory
    traffic is a handful of registers per row, so under the bandwidth
    attribution this leg SHOULD scale ~ideally while the shuffle leg
    plateaus.  Same order-independent checksum contract."""
    h1 = F.col("id") + F.lit(salt)
    for _ in range(chain):
        h1 = F.xxhash64(h1)
    out = (
        spark.range(rows)
        .select(h1.alias("h1"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("h1") % F.lit(1 << 31)).alias("ck"),
        )
        .collect()[0]
    )
    return int(out["cnt"]), int(out["ck"])


def alu_round(spark, rows: int, salt: int, chain: int = 1) -> tuple[int, int]:
    """One stringless wave: hash -> wide agg -> shuffle join -> checksum.
    Returns (row_count, checksum) — both parallelism-independent.

    chain: number of CHAINED xxhash64 applications per row.  chain=1 is
    the movement-heavy control (~24 B/row through the shuffle, a few ns
    of ALU — per byte moved it is MORE bandwidth-bound than the crawl);
    chain>=16 multiplies ALU work per row with ZERO extra bytes moved,
    giving the compute-dominated leg the bandwidth attribution predicts
    should scale: cores bring their own ALUs, the box shares one
    memory system."""
    h1 = F.col("id") + F.lit(salt)
    for _ in range(chain):
        h1 = F.xxhash64(h1)
    base = spark.range(rows).select(
        h1.alias("h1"),
        F.hash((F.col("id") * 2 + F.lit(salt)).cast("long")).cast("long").alias("h2"),
        F.col("id"),
    )
    agg = base.groupBy(F.pmod("h1", F.lit(BUCKETS)).alias("b")).agg(
        F.count("*").alias("n"),
        F.sum("h2").alias("s2"),
    )
    joined = base.withColumn("b", F.pmod("h1", F.lit(BUCKETS))).join(agg, "b")
    out = joined.select(
        F.count("*").alias("cnt"),
        # xor-fold is order-independent: identical at any parallelism
        F.sum(F.xxhash64("h1", "h2", "n", "s2") % F.lit(1 << 31)).alias("ck"),
    ).collect()[0]
    return int(out["cnt"]), int(out["ck"])


def run_at(
    cores: int, rows: int, rounds: int, cpus_per_worker: int, chain: int,
    mode: str = "shuffle",
) -> dict:
    stop_spark()
    if cpus_per_worker:
        os.sched_setaffinity(0, set(range(cores * cpus_per_worker)))
    conf = {
        "spark.local.dir": f"/dev/shm/fsc_alu_tmp_{cores}",
        # force the join's exchange: a broadcast would skip the shuffle
        # this experiment is shaped to exercise
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # task counts must exceed cores at BOTH levels (same rationale
        # as scaling.py): pin the shuffle width well above 4N
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(4 * 1024 * 1024),
        "spark.default.parallelism": "64",
    }
    spark = get_spark(
        app_name=f"fsc_alu_{cores}", cores=cores, shuffle_partitions=64,
        extra_conf=conf,
    )
    spark.range(10_000).agg(F.sum("id")).collect()  # warmup
    fn = compute_round if mode == "compute" else alu_round
    t0 = time.time()
    checks = [fn(spark, rows, salt, chain) for salt in range(rounds)]
    secs = time.time() - t0
    stop_spark()
    total_rows = rows * rounds
    return {
        "cores": cores,
        "mode": mode,
        "chain": chain,
        "seconds": round(secs, 1),
        "rows": total_rows,
        "rows_per_sec": round(total_rows / secs, 0),
        "checksums": checks,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=30_000_000)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--n-cores", type=int, default=2)
    ap.add_argument("--cpus-per-worker", type=int, default=0)
    ap.add_argument("--chain", type=int, default=1,
                    help="chained hash ops per row (1 = movement-heavy"
                         " control; >=16 = compute-dominated leg)")
    ap.add_argument("--mode", choices=("shuffle", "compute"),
                    default="shuffle",
                    help="shuffle = wide agg + shuffle join (movement leg);"
                         " compute = single-stage chained-hash aggregate"
                         " (pure-ALU leg, no wide exchange)")
    args = ap.parse_args()

    rN = run_at(args.n_cores, args.rows, args.rounds,
                args.cpus_per_worker, args.chain, args.mode)
    r4N = run_at(4 * args.n_cores, args.rows, args.rounds,
                 args.cpus_per_worker, args.chain, args.mode)
    assert rN["checksums"] == r4N["checksums"], "nondeterministic checksums!"
    eff = (r4N["rows_per_sec"] / rN["rows_per_sec"]) / 4
    result = {"N": rN, "fourN": r4N, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))
    out = f"scaling_alu_result_{args.mode}_c{args.chain}.json"
    with open(os.path.join(REPO, "BENCH", out), "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
