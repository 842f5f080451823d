"""CLI option precedence (r03 advisory): an explicitly passed flag
beats the config value, which beats the default — plus the argparse
wiring that makes "not given" distinguishable (default=None)."""

from __future__ import annotations

from fscrawler_spark.cli import _flag_over_config, main


def test_flag_beats_config_beats_default():
    cfg = {"frontier_checkpoint": "full"}
    # flag given -> flag wins over config
    assert _flag_over_config(cfg, "frontier_checkpoint", "delta", "delta") == "delta"
    # flag not given -> config wins over default
    assert _flag_over_config(cfg, "frontier_checkpoint", None, "delta") == "full"
    # neither -> default
    assert _flag_over_config({}, "frontier_checkpoint", None, "delta") == "delta"


def test_frontier_flag_default_is_none_marker(monkeypatch):
    """--frontier must default to None so cmd_crawl can tell 'not
    given' from an explicit choice (the precedence above relies on it)."""
    captured = {}

    def fake_cmd_crawl(args):
        captured["frontier"] = args.frontier

    monkeypatch.setattr("fscrawler_spark.cli.cmd_crawl", fake_cmd_crawl)
    base = ["crawl", "--pages", "p.parquet", "--checkpoint", "/tmp/ck"]
    main(base)
    assert captured["frontier"] is None
    main(base + ["--frontier", "full"])
    assert captured["frontier"] == "full"


def test_budget_waves_bloom_flags_are_none_markers(monkeypatch):
    """--budget/--waves/--bloom must also default to None (r03 advisory
    applied to every flag with a config twin): explicit flags win over
    config, and --no-bloom is distinguishable from 'not given'."""
    captured = {}
    monkeypatch.setattr(
        "fscrawler_spark.cli.cmd_crawl", lambda a: captured.update(vars(a))
    )
    base = ["crawl", "--pages", "p.parquet", "--checkpoint", "/tmp/ck"]
    main(base)
    assert captured["budget"] is None
    assert captured["waves"] is None
    assert captured["bloom"] is None
    main(base + ["--waves", "3", "--budget", "2", "--bloom"])
    assert (captured["waves"], captured["budget"], captured["bloom"]) == (3, 2, True)
    main(base + ["--no-bloom"])
    assert captured["bloom"] is False
    # an explicit False flag must beat a True config value
    assert _flag_over_config({"use_bloom": True}, "use_bloom", False, False) is False
    # and config still beats the default when no flag is given
    assert _flag_over_config({"max_waves": 7}, "max_waves", None, 50) == 7
