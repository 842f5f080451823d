"""robots.txt parser (functions/robots.py) + integration with the wave
loop's deny/budget gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from fscrawler_spark.functions.robots import parse_robots

ROBOTS_A = """
# comments ignored
User-agent: *
Disallow: /private
Allow: /private/ok
Crawl-delay: 10

User-agent: evilbot
Disallow: /
"""

ROBOTS_B = """
User-agent: googlebot
User-agent: fscrawler
Disallow: /nofs
User-agent: otherbot
Disallow: /
"""

ROBOTS_C = """
User-agent: somebot
Disallow: /
"""


def _rules(spark, agent="fscrawler"):
    df = spark.createDataFrame(
        [("a.x", ROBOTS_A), ("b.x", ROBOTS_B), ("c.x", ROBOTS_C), ("d.x", None)],
        "host string, body string",
    )
    return parse_robots(df, agent=agent).collect()


def test_star_group_applies(spark):
    rules = [r for r in _rules(spark) if r["host"] == "a.x"]
    got = {(r["path_prefix"], r["allow"]): r for r in rules}
    assert ("/private", False) in got  # Disallow from the * group
    assert ("/private/ok", True) in got  # Allow kept
    # evilbot's Disallow:/ must NOT leak to us
    assert ("/", False) not in got
    # crawl-delay 10s -> floor(60/10)=6 tokens
    delay = [r for r in rules if r["crawl_delay_tokens"] is not None]
    assert len(delay) == 1 and delay[0]["crawl_delay_tokens"] == 6


def test_named_agent_and_shared_ua_lines(spark):
    rules = [r for r in _rules(spark) if r["host"] == "b.x"]
    got = {(r["path_prefix"], r["allow"]) for r in rules}
    # consecutive UA lines share one group: googlebot+fscrawler -> /nofs
    assert ("/nofs", False) in got
    # otherbot's blanket deny does not apply to us
    assert ("/", False) not in got


def test_inapplicable_and_empty_hosts_produce_no_rules(spark):
    rules = _rules(spark)
    assert not [r for r in rules if r["host"] in ("c.x", "d.x")]


def test_parsed_rules_gate_the_crawl(spark, pages_df, tiny, tmp_path_factory):
    """End-to-end: a raw robots.txt denying h1's /s1 subtree produces the
    same pruning the hand-built rules table does."""
    from fscrawler_spark.plans.job import CrawlJob
    from fscrawler_spark.plans.wave_loop import run_crawl

    body = "User-agent: *\nDisallow: /s1\n"
    robots_txt = spark.createDataFrame([("h1.example", body)], "host string, body string")
    rules = parse_robots(robots_txt)
    job = CrawlJob(politeness_budget=20, max_waves=3)
    res = run_crawl(
        spark, pages_df, tiny["seeds"], job, robots=rules,
        checkpoint_dir=str(tmp_path_factory.mktemp("rb")),
    )
    fetched = [r["url"] for r in res.results(spark).where("stage='EXTRACTED'").collect()]
    assert fetched
    assert not any(u.startswith("http://h1.example/s1") for u in fetched)
    seen = {r["url"] for r in res.seen(spark).collect()}
    assert not any(u.startswith("http://h1.example/s1/") for u in seen)


def test_rep_longest_match_allow_overrides_deny(spark, pages_df, tiny, tmp_path_factory):
    """REP precedence (r01 advisory): 'Disallow: /' + 'Allow: /s0' must
    keep the /s1 subtree crawlable (longest matching prefix wins; an
    allow beats a deny of equal length) — engine and simulator agree."""
    from fscrawler_spark.plans.job import CrawlJob
    from fscrawler_spark.plans.simulator import simulate_crawl
    from fscrawler_spark.plans.wave_loop import run_crawl

    body = "User-agent: *\nDisallow: /\nAllow: /s1\n"
    robots_txt = spark.createDataFrame(
        [("h0.example", body)], "host string, body string"
    )
    rules = parse_robots(robots_txt)
    rule_rows = [r.asDict() for r in rules.collect()]
    job = CrawlJob(politeness_budget=20, max_waves=3)
    res = run_crawl(
        spark, pages_df, tiny["seeds"], job, robots=rules,
        checkpoint_dir=str(tmp_path_factory.mktemp("rep")),
    )
    fetched = [
        r["url"]
        for r in res.results(spark).where("stage='EXTRACTED'").collect()
    ]
    h0 = [u for u in fetched if u.startswith("http://h0.example")]
    # the root itself (path '') matches only 'Disallow: /'? no — '' does
    # not start with '/', so the root is ungoverned and crawlable; its
    # /s0 children must survive, other subtrees must not
    assert any(u.startswith("http://h0.example/s1") for u in h0), h0
    assert not any(
        u.startswith("http://h0.example/") and not u.startswith("http://h0.example/s1")
        for u in h0
    ), h0
    sim = simulate_crawl(tiny["pages"], tiny["seeds"], job, rule_rows)
    eng_order = {
        r["url"]: (r["wave"], r["rank_in_wave"])
        for r in res.results(spark).where("stage = 'EXTRACTED'").collect()
    }
    assert eng_order == sim.order


def test_extract_sitemap_urls_protocol_rules(spark):
    """Sitemap directives are global (inside or outside UA groups),
    case-insensitive, comment-stripped, deduplicated; absent -> none."""
    from fscrawler_spark.functions.robots import extract_sitemap_urls

    bodies = [
        ("h1", "User-agent: x\nDisallow: /\nSitemap: http://h1/s.xml"),
        ("h2", "SITEMAP:   http://h2/a.xml  # c\n\nsitemap: http://h2/b.xml\n"
               "Sitemap: http://h2/a.xml"),       # dup collapses
        ("h3", "User-agent: *\nDisallow:\n"),     # none
        ("h4", None),
        ("h5", "NotSitemap: http://h5/x.xml\n# Sitemap: http://h5/c.xml"),
    ]
    df = spark.createDataFrame(bodies, "host string, body string")
    got = sorted(
        (r["host"], r["loc"]) for r in extract_sitemap_urls(df).collect()
    )
    assert got == [
        ("h1", "http://h1/s.xml"),
        ("h2", "http://h2/a.xml"),
        ("h2", "http://h2/b.xml"),
    ]
