"""Per-host politeness / priority window (SURVEY §2.5).

The reference serializes work through a bounded queue + thread throttle
(app/observers/queue_observer.py:33-42 backpressure;
app/crawling_queue_consumer.py:174-178 in-flight cap).  The Spark-native
equivalent is a rank-and-budget window: take the k highest-priority URLs
per host per wave; the rest stay QUEUED and compete next wave.

Skew: one hot host can hold ~30% of the frontier (fixtures model this),
so a naive ``row_number().over(partitionBy(host))`` funnels that host
into a single task.  We pre-truncate with a salted two-phase top-k:
rank within (host, salt) keeping <=budget rows per salt bucket, THEN
rank within host.  Phase 1 spreads the hot host over S tasks and caps
phase 2's input at S*budget rows per host — exact, not approximate
(each salt bucket keeps its own k smallest keys, which is a superset
of the global k smallest).  This is the "explicit salting of hot
hosts" clause of the north rule.

Determinism: rank key is (priority, url) — a total order, no ties —
so the scheduled set is identical at any parallelism (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 32


def politeness_take(
    frontier: DataFrame,
    default_budget: int,
    host_budgets: DataFrame | None = None,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    global_cap: int | None = None,
) -> DataFrame:
    """Mark each row scheduled (rank <= per-host budget) or deferred.

    frontier: rows with (url, host, priority, ...).
    host_budgets: optional small dim (host, tokens) overriding the
    default — broadcast-joined (robots crawl_delay_tokens analog).
    Returns the input plus ``host_rank`` and ``scheduled`` columns.
    """
    df = frontier
    if host_budgets is not None:
        df = df.join(
            F.broadcast(host_budgets.select("host", "tokens")), "host", "left"
        )
        budget_col = F.coalesce(F.col("tokens"), F.lit(default_budget))
    else:
        budget_col = F.lit(default_budget)
    df = df.withColumn("_budget", budget_col).drop("tokens")

    # Phase 1 — salted partial top-k: cap each (host, salt) bucket.
    # Skipped when salt_buckets<=1 (adaptive small-wave path: the extra
    # shuffle costs more than the skew it prevents).
    #
    # Rows beyond the per-bucket cap cannot be in their host's global
    # top-budget (each bucket keeps its own budget-smallest keys — a
    # superset of the host's top-budget), so they are deferred, not
    # scheduled.  They MUST remain in the returned frame as
    # scheduled=false: the caller derives the next wave's frontier from
    # the unscheduled rows, so filtering them out silently lost them
    # from the crawl (round-1 advisory bug).  Kept in ONE plan — a
    # filter+union of two branches re-executes the entire un-persisted
    # upstream wave pipeline once per branch (measured +37% on the
    # scaling run's 4N leg).
    trunc = F.lit(False)
    if salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
        w1 = Window.partitionBy("host", "_salt").orderBy("priority", "url")
        df = df.withColumn("_salt", salt).withColumn(
            "_r1", F.row_number().over(w1)
        )
        trunc = F.col("_r1") > F.col("_budget")

    # Phase 2 — exact per-host rank over SURVIVORS ONLY.  The window
    # partition key splits each host: survivors rank together in
    # (host, -1) — bounded at <= salt_buckets*budget rows by phase 1,
    # which is the whole point of the salt — while truncated rows stay
    # spread across their (host, salt) buckets (they need no rank:
    # host_rank is NULL and any host that truncated kept >= budget
    # survivors, so a truncated row is provably past the budget).
    # Ranking truncated rows through the host-wide window re-created
    # the hot-host single-task skew the salt exists to prevent (r02
    # advisory); the key split keeps it one plan — no filter+union
    # branch re-executing the un-persisted upstream.
    df = df.withColumn("_trunc", trunc.cast("int"))
    if salt_buckets > 1:
        part2 = F.when(F.col("_trunc") == 1, F.col("_salt")).otherwise(F.lit(-1))
        df = df.drop("_r1")
    else:
        part2 = F.lit(-1)
    w2 = Window.partitionBy("host", part2).orderBy("priority", "url")
    df = df.withColumn("_hr", F.row_number().over(w2))
    if salt_buckets > 1:
        df = df.drop("_salt")
    df = df.withColumn(
        "host_rank",
        F.when(F.col("_trunc") == 1, F.lit(None).cast("int")).otherwise(
            F.col("_hr")
        ),
    )
    df = df.withColumn(
        "scheduled", (F.col("_trunc") == 0) & (F.col("_hr") <= F.col("_budget"))
    ).drop("_budget", "_trunc", "_hr")

    if global_cap is not None:
        # Global wave cap (bounded-queue maxsize analog, config.py:129-131):
        # rank the scheduled set by (priority, host, url) — distributed via
        # range partitioning, never a single-task global window — and keep
        # the first global_cap rows.
        from fscrawler_spark.operators.topk import global_row_number

        capped = global_row_number(
            df.where("scheduled"), ["priority", "host", "url"], "_g"
        )
        df = (
            df.where(~F.col("scheduled"))
            .unionByName(
                capped.withColumn("scheduled", F.col("_g") <= F.lit(global_cap)).drop(
                    "_g"
                )
            )
        )
    return df


def wave_rank(scheduled: DataFrame, small: bool = False) -> DataFrame:
    """Global deterministic rank of the scheduled set within a wave:
    (priority, host, url) lexicographic — the ordering contract the
    crawl-order test asserts (SURVEY §7.3).

    small=False: distributed range-partitioned rank (scale path).
    small=True: single-partition window (adaptive path for waves known
    to be small — one task, but skips the sampling + count jobs).
    Both produce identical output (same total-order key)."""
    if small:
        w = Window.partitionBy(F.lit(0)).orderBy("priority", "host", "url")
        return scheduled.withColumn("rank_in_wave", F.row_number().over(w))
    from fscrawler_spark.operators.topk import global_row_number

    return global_row_number(scheduled, ["priority", "host", "url"], "rank_in_wave")


def waterfill_budget(
    demands: DataFrame,
    key_cols: list[str],
    demand_col: str,
    budget: int,
) -> DataFrame:
    """Max-min fair (water-filling) split of one global fetch budget
    across hosts: input (key_cols..., demand) -> output with an added
    integer ``alloc`` column, ``sum(alloc) <= budget``.

    The step ABOVE ``politeness_take``: that operator caps each host at
    a given per-host budget; this one COMPUTES those budgets from a
    single global number (a wave's total fetch capacity) so small hosts
    are fully satisfied and the surplus is split evenly among the big
    ones — the progressive-filling allocation (max-min fairness,
    Bertsekas & Gallager, "Data Networks" §6.5.2), which a production
    crawler uses so one mega-host cannot starve the long tail.

    Exact integer semantics (engine-reproducible, q78's oracle):
    every host with demand <= L gets its demand; every other host gets
    L, where L is the unique integer water level with
    ``sum(min(demand, L)) <= budget < sum(min(demand, L + 1))``
    (all-satisfied if total demand <= budget).  The sub-level
    remainder — strictly fewer tokens than there are unsatisfied
    hosts — is deliberately left unallocated (next wave's carryover)
    so no global per-host ranking is ever needed.

    Scale shape: the level search runs on the DISTINCT demand values
    (at 10^8 hosts that is at most ~10^5 distinct counts — host-size
    distributions are heavy-tailed), so the only single-partition
    window in the plan sorts that tiny value table; hosts themselves
    are touched by exactly two shuffle-free-after-AQE passes: one
    map-side-combined groupBy(demand) count and one broadcast join of
    the (one-row) level against the host table.  int64 headroom:
    demand * n_hosts <= 9.2e18 holds through 10^10 x 10^8.
    """
    d = F.col(demand_col).cast("long")
    per_val = (
        demands.groupBy(d.alias("_d"))
        .agg(F.count("*").cast("long").alias("_cnt"))
    )
    wcum = Window.orderBy("_d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("_d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_val.select(
        "_d",
        F.sum(F.col("_d") * F.col("_cnt")).over(wcum).alias("_cum_mass"),
        F.sum("_cnt").over(wcum).alias("_cum_cnt"),
        F.sum("_cnt").over(wall).alias("_n"),
    )
    # largest distinct demand whose full satisfaction fits the budget:
    # mass(<= d) + d * (hosts above d) <= budget
    level = cum.select(
        F.max(
            F.when(
                F.col("_cum_mass")
                + F.col("_d") * (F.col("_n") - F.col("_cum_cnt"))
                <= F.lit(int(budget)),
                F.col("_d"),
            )
        ).alias("_dstar_raw"),
        F.max(
            F.when(
                F.col("_cum_mass")
                + F.col("_d") * (F.col("_n") - F.col("_cum_cnt"))
                <= F.lit(int(budget)),
                F.struct("_d", "_cum_mass", "_cum_cnt"),
            )
        ).alias("_s"),
        F.max("_n").alias("_n0"),
    ).select(
        F.coalesce("_dstar_raw", F.lit(-1)).cast("long").alias("_dstar"),
        F.when(
            F.col("_n0") > F.coalesce(F.col("_s._cum_cnt"), F.lit(0)),
            F.expr(
                f"(CAST({int(budget)} AS BIGINT)"
                " - coalesce(_s._cum_mass, CAST(0 AS BIGINT)))"
                " DIV (_n0 - coalesce(_s._cum_cnt, CAST(0 AS BIGINT)))"
            ),
        )
        .cast("long")
        .alias("_level"),
    )
    out = demands.crossJoin(F.broadcast(level))
    return out.select(
        *key_cols,
        d.alias(demand_col),
        F.when(d <= F.col("_dstar"), d)
        .otherwise(F.least(d, F.col("_level")))
        .cast("long")
        .alias("alloc"),
    )
