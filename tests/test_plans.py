"""Physical-plan regression tests — the `.explain` audits the build
brief demands, pinned as assertions so they cannot silently rot:
predicate pushdown + column pruning reach the parquet scans, small
sides broadcast, aggregates use partial+final combine."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_pushdown_pruning_partial_agg(spark):
    plan = plan_of(E.q01_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 11-column table is read as 6 columns
    assert "l_comment" not in plan or "ReadSchema" not in plan.split("l_comment")[0]
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "partial_sum" in plan  # map-side combine before the exchange


def test_q08_filter_chain_pushdown(spark):
    plan = plan_of(E.q08_filter_chain(spark, SF))
    # the sargable conjuncts reach the scan
    assert "GreaterThanOrEqual(n_chars,100" in plan
    assert "LessThanOrEqual(n_chars,800" in plan
    assert "Not(EqualTo(source,src3))" in plan


def test_q10_anti_join_is_broadcast(spark):
    plan = plan_of(E.q10_empty_groups(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_fetch_join_broadcasts_scheduled_side(spark, pages_df):
    """The wave loop's fetch join must broadcast the bounded scheduled
    set and probe the pages scan in place — html never shuffles."""
    scheduled = pages_df.select("url").limit(50)
    fetched = pages_df.join(F.broadcast(scheduled), "url", "inner")
    plan = plan_of(fetched.select("url", F.md5("html").alias("m")))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fetch_join_guard_both_regimes(spark, pages_df):
    """r01 verdict: the fetch-join broadcast is a HARD hint — above
    broadcast_wave_threshold it must fall back to a plain equi-join
    (AQE decides) instead of OOMing the driver.  Assert both regimes of
    the actual wave-loop helper pick the intended physical join."""
    from fscrawler_spark.plans.wave_loop import fetch_join

    sched = pages_df.select("url").limit(50)
    probe = lambda df: plan_of(df.select("url", F.md5("html").alias("m")))
    bcast_plan = probe(fetch_join(pages_df, sched, can_broadcast=True))
    assert "BroadcastHashJoin" in bcast_plan
    assert "SortMergeJoin" not in bcast_plan
    # Model the too-big-to-broadcast regime by turning the size-based
    # auto-broadcast off: the HARD hint would still force a broadcast
    # (first assertion — exactly why the guard exists), while the
    # guarded plain join lets the optimizer pick a shuffle join.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        forced = probe(fetch_join(pages_df, sched, can_broadcast=True))
        assert "BroadcastHashJoin" in forced, "broadcast() must be a hard hint"
        plain_plan = probe(fetch_join(pages_df, sched, can_broadcast=False))
        assert "SortMergeJoin" in plain_plan or "ShuffledHashJoin" in plain_plan
        assert "BroadcastHashJoin" not in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_crawl_identical_without_broadcast(
    spark, pages_df, robots_df, tiny, tmp_path_factory
):
    """Large-wave regime e2e: broadcast_wave_threshold=0 forces the
    plain-join path for every wave — results must be byte-identical to
    the broadcast regime (the simulator order/seen)."""
    from fscrawler_spark.plans.job import CrawlJob
    from fscrawler_spark.plans.simulator import simulate_crawl
    from fscrawler_spark.plans.wave_loop import run_crawl
    from tests.test_crawl_e2e import JOB

    sim = simulate_crawl(tiny["pages"], tiny["seeds"], JOB, tiny["robots"])
    job = CrawlJob(**{**JOB.__dict__, "broadcast_wave_threshold": 0})
    ckpt = str(tmp_path_factory.mktemp("ckpt_nobcast"))
    res = run_crawl(
        spark, pages_df, tiny["seeds"], job, robots=robots_df, checkpoint_dir=ckpt
    )
    order = {
        r["url"]: (r["wave"], r["rank_in_wave"])
        for r in res.results(spark).where("stage = 'EXTRACTED'").collect()
    }
    assert order == sim.order
    assert {r["url"] for r in res.seen(spark).collect()} == sim.seen


def test_politeness_has_no_global_window(spark):
    """The politeness window partitions by host (+salt) — never a bare
    global window over the frontier."""
    from fscrawler_spark.operators.politeness import politeness_take

    df = spark.createDataFrame(
        [(f"http://h{i%5}.x/p{i}", f"h{i%5}.x", 0, 0) for i in range(100)],
        "url string, host string, depth int, priority int",
    )
    plan = plan_of(politeness_take(df, 4, salt_buckets=8))
    # window partition keys present -> hash exchange, not SinglePartition
    assert "hashpartitioning(host" in plan
    assert "SinglePartition" not in plan


def test_textstats_whole_stage_codegen(spark):
    """Text analytics must stay JVM-side: no Python/Arrow eval nodes."""
    plan = plan_of(E.q16_text_stats(spark, SF))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # (AQE's pre-execution formatted plan hides WholeStageCodegen spans;
    # absence of Python eval nodes is the property that matters)


def test_minhash_uses_hash_aggregate(spark):
    from fscrawler_spark.functions.textstats import shingles
    from fscrawler_spark.operators.similarity import minhash_bands_agg

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sh = docs.select(F.col("doc_id").alias("id"), shingles(F.col("text")).alias("sh"))
    plan = plan_of(minhash_bands_agg(sh, "id", F.col("sh"), 32, 16))
    assert "HashAggregate" in plan and "partial_min" in plan


def test_similarity_scale_paths_have_no_cross_product(spark):
    """The LSH-bucketed paths must plan as equi-joins on bucket keys —
    a CartesianProduct/nested-loop anywhere means the O(n^2) path
    leaked back in."""
    from fscrawler_spark.functions.textstats import tokens
    from fscrawler_spark.operators.similarity import (
        embedding_dedup_pairs,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    d = spark.read.parquet(f"{SF}/documents.parquet")
    plans = {
        "embedding_lsh": plan_of(embedding_dedup_pairs(e, threshold=0.9, method="lsh")),
        "minhash": plan_of(minhash_lsh_pairs(d, "doc_id", "text", 0.8)),
        "simhash": plan_of(
            simhash_pairs(
                d.select("doc_id", tokens(F.lower(F.col("text"))).alias("tk")),
                "doc_id", F.col("tk"),
            )
        ),
    }
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
