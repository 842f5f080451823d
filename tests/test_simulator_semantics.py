"""Pure-Python semantic tests of the frontier simulator — the oracle
itself must honor the reference's composition semantics (SURVEY §2.2)
before it is trusted to judge the engine.  No SparkSession needed."""

from __future__ import annotations

from fscrawler_spark.datagen import generate_pages
from fscrawler_spark.filters import ExtensionFilter, PatternFilter, SizeFilter
from fscrawler_spark.plans.job import CrawlJob, accept_seeds
from fscrawler_spark.plans.simulator import simulate_crawl

PAGES, SEEDS, ROBOTS = generate_pages("tiny", 42)


def run(job, robots=ROBOTS):
    return simulate_crawl(PAGES, SEEDS, job, robots)


def test_invert_selects_complement():
    """Invert mode crawls ONLY filtered-out pages (fast_crawler.py:96-113
    delete-list mode).  Blanket negation means seeds themselves must be
    in the complement for traversal to start — use a host-complement
    pattern so the inverted crawl is non-trivial."""
    base = CrawlJob(politeness_budget=50, max_waves=3,
                    skip_filters=(PatternFilter(authorized_pattern="h0.example"),))
    inv = CrawlJob(**{**base.__dict__, "invert": True})
    normal = run(base)
    inverted = run(inv)
    assert normal.order and inverted.order
    assert all("h0.example" in u for u in normal.order)
    assert all("h0.example" not in u for u in inverted.order)
    # complement within the examined universe: no url fetched by both
    assert not (set(normal.order) & set(inverted.order))
    # blanket negation starves traversal when seeds pass the filters
    # (the seeds get skipped, nothing expands) — pinned behavior:
    starved = run(CrawlJob(politeness_budget=50, max_waves=3, invert=True,
                           skip_filters=(ExtensionFilter(
                               excluded=frozenset({"tmp", "log"})),)))
    assert starved.order == {}


def test_wave_cap_defers_by_global_rank():
    uncapped = run(CrawlJob(politeness_budget=50, max_waves=1))
    capped = run(CrawlJob(politeness_budget=50, max_waves=1, wave_cap=2))
    assert len(capped.order) == 2
    # the kept 2 are the globally first-ranked of the uncapped wave
    first_two = sorted(uncapped.order.items(), key=lambda kv: kv[1])[:2]
    assert {u for u, _ in first_two} == set(capped.order)


def test_politeness_zero_budget_starves():
    # robots off: otherwise h2's crawl_delay_tokens=2 would legitimately
    # override the zero default budget for that host
    res = run(CrawlJob(politeness_budget=0, max_waves=3, respect_robots=False))
    assert res.order == {}  # nothing ever scheduled
    assert res.seen == set()  # deferred rows are not 'seen'


def test_robots_tokens_override_default_budget():
    res = run(CrawlJob(politeness_budget=0, max_waves=2))
    # only h2 (crawl_delay_tokens=2) may schedule anything
    assert res.order and all(u.startswith("http://h2.example") for u in res.order)


def test_robots_off_fetches_denied_subtree():
    on = run(CrawlJob(politeness_budget=50, max_waves=4))
    off = run(CrawlJob(politeness_budget=50, max_waves=4, respect_robots=False))
    denied_on = {u for u, s in on.statuses.items() if s == "ROBOTS_DENIED"}
    assert denied_on
    assert all(off.statuses.get(u) != "ROBOTS_DENIED" for u in denied_on)
    assert len(off.order) > len(on.order)


def test_notify_gate_filters_results_not_traversal():
    base = CrawlJob(politeness_budget=50, max_waves=3)
    gated = CrawlJob(**{**base.__dict__,
                        "notify_filters": (PatternFilter(authorized_pattern="h0.example"),)})
    a, b = run(base), run(gated)
    # traversal identical (notify does NOT prune, file_system_crawler.py:462-468)
    assert a.order == b.order and a.seen == b.seen
    # results restricted to the notified subset
    urls_b = {r["url"] for r in b.results if r["stage"] == "EXTRACTED"}
    assert urls_b and all("h0.example" in u for u in urls_b)
    urls_a = {r["url"] for r in a.results if r["stage"] == "EXTRACTED"}
    assert urls_b < urls_a


def test_size_filter_prunes_expansion():
    """A page denied by size never contributes outlinks (subtree prune)."""
    small_only = run(CrawlJob(politeness_budget=50, max_waves=4,
                              skip_filters=(SizeFilter(1, 2500),)))
    open_run = run(CrawlJob(politeness_budget=50, max_waves=4))
    big = {u for u, s in small_only.statuses.items() if s == "SKIPPED"}
    assert big, "size filter must skip some pages"
    assert len(small_only.order) < len(open_run.order)


def test_seed_overlap_rule_both_directions():
    seeds = [
        {"url": "http://a.x", "seed_id": 0},
        {"url": "http://a.x/sub", "seed_id": 1},   # child of accepted -> reject
        {"url": "http://b.x/deep", "seed_id": 2},
        {"url": "http://b.x", "seed_id": 3},        # parent of accepted -> reject
        {"url": "http://c.x", "seed_id": 4},
    ]
    got = [s["url"] for s in accept_seeds(seeds)]
    assert got == ["http://a.x", "http://b.x/deep", "http://c.x"]
