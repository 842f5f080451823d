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
