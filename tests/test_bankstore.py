"""Storage-resident prefilter bank (operators/bankstore.py) — the
round-4 closure of "the bank transits the driver every wave":

* probe parity: the table-scan-fed cogroup probe classifies exactly
  like the in-memory banks (two-tier correctness vs the exact join);
* O(touched) maintenance: a delta merge writes ONLY the touched
  shards' blobs to the new version dir and leaves every other shard's
  file untouched on disk;
* plan pruning: a shard-restricted bank read pushes the shard filter
  into the parquet scan;
* the driver never holds payload bytes (meta.json is ints only);
* wave-loop e2e parity + resume-reload (no rebuild) + cohort aging.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.operators.bankstore import StoredBank
from fscrawler_spark.operators.dedup import anti_join_seen
from fscrawler_spark.plans.job import CrawlJob
from fscrawler_spark.plans.wave_loop import run_crawl


def _urls(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("http://h"), (F.col("id") % 50).cast("string"),
                 F.lit("/p"), F.col("id").cast("string")).alias("url")
    )


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_stored_probe_two_tier_parity(spark, tmp_path, kind):
    seen = _urls(spark, 0, 600)
    cand = _urls(spark, 300, 900)
    bank = StoredBank.build(
        seen, "url", str(tmp_path / "bank"), kind=kind, n_items=2400, n_shards=8
    )
    exact = {r["url"] for r in anti_join_seen(cand, seen).collect()}
    stored = {
        r["url"] for r in anti_join_seen(cand, seen, bloom=bank).collect()
    }
    assert stored == exact
    # the prefilter must pass every truly-seen url to the exact tier:
    # no true-seen candidate may be tagged definitely-unseen
    tagged = bank.probe(cand, "url")
    missed = (
        tagged.where(~F.col("_maybe_seen"))
        .join(seen, "url", "left_semi")
        .count()
    )
    assert missed == 0


def test_stored_merge_touches_only_delta_shards(spark, tmp_path):
    seen = _urls(spark, 0, 500)
    bank = StoredBank.build(
        seen, "url", str(tmp_path / "bank"), kind="bloom", n_items=4000, n_shards=8
    )
    v0 = os.path.join(bank.path, "v0")
    v0_state = {
        f: os.path.getmtime(os.path.join(v0, f))
        for f in os.listdir(v0)
        if f.endswith(".parquet")
    }
    delta = _urls(spark, 500, 503)  # 3 urls -> at most 3 of 8 shards
    expected_shards = {
        int(r["_s"])
        for r in delta.select(
            F.pmod(F.xxhash64("url"), F.lit(8)).cast("int").alias("_s")
        ).distinct().collect()
    }
    bank.merge_delta(delta, "url", "insert")
    v1 = os.path.join(bank.path, "v1")
    written = {
        int(r["shard"]) for r in spark.read.parquet(v1).select("shard").collect()
    }
    assert written == expected_shards  # O(touched shards), not O(bank)
    assert len(written) < 8, "delta touched every shard; test fixture too big"
    # untouched shards' blobs were not rewritten
    assert v0_state == {
        f: os.path.getmtime(os.path.join(v0, f))
        for f in os.listdir(v0)
        if f.endswith(".parquet")
    }
    # manifest repointed exactly the touched shards
    for s, v in bank.shard_versions.items():
        assert v == (1 if s in written else 0)
    # merged rows now probe as seen; two-tier stays exact
    all_seen = seen.unionByName(delta)
    cand = _urls(spark, 400, 700)
    exact = {r["url"] for r in anti_join_seen(cand, all_seen).collect()}
    stored = {
        r["url"] for r in anti_join_seen(cand, all_seen, bloom=bank).collect()
    }
    assert stored == exact


def test_bank_df_pushes_shard_filter_into_scan(spark, tmp_path):
    bank = StoredBank.build(
        _urls(spark, 0, 400), "url", str(tmp_path / "bank"),
        kind="bloom", n_items=1600, n_shards=8,
    )
    one = bank.bank_df(spark, shards=[3])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "shard" in plan
    rows = one.select("shard").collect()
    assert {int(r["shard"]) for r in rows} <= {3}


def test_driver_holds_no_payload_bytes(spark, tmp_path):
    bank = StoredBank.build(
        _urls(spark, 0, 2000), "url", str(tmp_path / "bank"),
        kind="cuckoo", n_items=8000, n_shards=8,
    )
    # the handle object carries no payload
    for v in vars(bank).values():
        assert not isinstance(v, (bytes, bytearray))
        if isinstance(v, dict):
            assert all(not isinstance(x, (bytes, bytearray)) for x in v.values())
    # meta.json is ints/strings only, and the blobs live on storage
    with open(os.path.join(bank.path, "meta.json")) as fh:
        meta = json.load(fh)
    assert "payload" not in json.dumps(meta)
    assert bank.total_bytes() > 0  # measured from file sizes, not reads


def test_auto_compaction_bounds_versions_and_keeps_parity(spark, tmp_path):
    seen = _urls(spark, 0, 300)
    bank = StoredBank.build(
        seen, "url", str(tmp_path / "bank"), kind="bloom",
        n_items=8000, n_shards=4,
    )
    bank.compact_span = 3
    total = seen
    for i in range(6):
        d = _urls(spark, 300 + i * 25, 325 + i * 25)
        bank.merge_delta(d, "url", "insert")
        total = total.unionByName(d)
    live = set(bank.shard_versions.values())
    assert len(live) <= 3
    # version dirs no shard references anymore were GC'd from disk
    on_disk = {d for d in os.listdir(bank.path) if d.startswith("v")}
    assert on_disk == {f"v{v}" for v in live}
    # an explicit snapshot compaction collapses to one live version
    bank.compact(spark)
    assert len(set(bank.shard_versions.values())) == 1
    assert {d for d in os.listdir(bank.path) if d.startswith("v")} == {
        f"v{next(iter(bank.shard_versions.values()))}"
    }
    cand = _urls(spark, 200, 600)
    exact = {r["url"] for r in anti_join_seen(cand, total).collect()}
    stored = {
        r["url"] for r in anti_join_seen(cand, total, bloom=bank).collect()
    }
    assert stored == exact
    # a reopened handle sees the same state (meta round-trip)
    re = StoredBank.open(bank.path)
    stored2 = {
        r["url"] for r in anti_join_seen(cand, total, bloom=re).collect()
    }
    assert stored2 == exact


def test_stored_cuckoo_delete_ages_cohort(spark, tmp_path):
    keep = _urls(spark, 0, 400)
    cohort = _urls(spark, 400, 600)
    bank = StoredBank.build(
        keep.unionByName(cohort), "url", str(tmp_path / "bank"),
        kind="cuckoo", n_items=4000, n_shards=8,
    )
    bank.merge_delta(cohort, "url", "delete")
    # deletion contract: the cohort left the exact table in the same
    # move — the two-tier result vs the post-aging seen table is exact
    cand = _urls(spark, 300, 700)
    exact = {r["url"] for r in anti_join_seen(cand, keep).collect()}
    stored = {
        r["url"] for r in anti_join_seen(cand, keep, bloom=bank).collect()
    }
    assert stored == exact
    # and the filter really forgot most of the cohort (not pass-through)
    tagged = bank.probe(cohort, "url")
    forgotten = tagged.where(~F.col("_maybe_seen")).count()
    assert forgotten > 0
    # retained urls keep their fingerprints (multiset-safe delete)
    still = bank.probe(keep, "url").where(~F.col("_maybe_seen")).count()
    assert still == 0


def test_bloom_delete_raises(spark, tmp_path):
    bank = StoredBank.build(
        _urls(spark, 0, 100), "url", str(tmp_path / "bank"),
        kind="bloom", n_items=400, n_shards=4,
    )
    with pytest.raises(ValueError):
        bank.merge_delta(_urls(spark, 0, 10), "url", "delete")


# --------------------------------------------------------------------------
# wave-loop e2e


def _order(res, spark):
    return {
        (r["url"], r["wave"], r["rank_in_wave"])
        for r in res.results(spark).collect()
    }


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_crawl_stored_bank_e2e_parity(
    spark, pages_df, robots_df, tiny, tmp_path, kind
):
    base = dict(politeness_budget=4, max_waves=4, use_bloom=True, seen_filter=kind)
    r_mem = run_crawl(
        spark, pages_df, tiny["seeds"], CrawlJob(**base, prefilter_store="memory"),
        robots=robots_df, checkpoint_dir=str(tmp_path / "mem"),
    )
    r_tab = run_crawl(
        spark, pages_df, tiny["seeds"], CrawlJob(**base, prefilter_store="table"),
        robots=robots_df, checkpoint_dir=str(tmp_path / "tab"),
    )
    assert _order(r_mem, spark) == _order(r_tab, spark)
    # the bank table lives inside the checkpoint dir and was
    # incrementally maintained (one build + per-wave delta merges)
    assert StoredBank.exists(str(tmp_path / "tab" / "prefilter"))
    probe_actions = [t.get("prefilter", {}).get("action") for t in r_tab.timings]
    assert probe_actions.count("full_build") == 1
    upd = [t["prefilter_update"] for t in r_tab.timings if "prefilter_update" in t]
    assert upd and all(u["action"] == "delta_merge" for u in upd)


def test_crawl_stored_bank_resume_reloads_not_rebuilds(
    spark, pages_df, robots_df, tiny, tmp_path
):
    base = dict(
        politeness_budget=4, use_bloom=True, prefilter_store="table",
    )
    ck = str(tmp_path / "ck")
    run_crawl(
        spark, pages_df, tiny["seeds"], CrawlJob(**base, max_waves=2),
        robots=robots_df, checkpoint_dir=ck,
    )
    r2 = run_crawl(
        spark, pages_df, tiny["seeds"], CrawlJob(**base, max_waves=5),
        robots=robots_df, checkpoint_dir=ck, resume=True,
    )
    actions = [t.get("prefilter", {}).get("action") for t in r2.timings]
    assert actions[0] == "loaded", f"resume rebuilt the bank: {actions}"
    assert "full_build" not in actions
    # resumed run == one uninterrupted run
    r_full = run_crawl(
        spark, pages_df, tiny["seeds"], CrawlJob(**base, max_waves=5),
        robots=robots_df, checkpoint_dir=str(tmp_path / "full"),
    )
    assert _order(r2, spark) == _order(r_full, spark)


def test_crawl_stored_bank_reload_replays_missed_delta(
    spark, pages_df, robots_df, tiny, tmp_path
):
    """Crash between wave commit and bank save: the bank's merged_upto
    lags the committed waves; the resume reconcile replays the missing
    seen-delta before probing."""
    base = dict(politeness_budget=4, use_bloom=True, prefilter_store="table")
    ck = str(tmp_path / "ck")
    run_crawl(
        spark, pages_df, tiny["seeds"], CrawlJob(**base, max_waves=3),
        robots=robots_df, checkpoint_dir=ck,
    )
    # simulate the crash window: roll merged_upto back one wave
    bank = StoredBank.open(os.path.join(ck, "prefilter"))
    assert bank.merged_upto == 2
    bank.merged_upto = 1
    bank.save()
    r2 = run_crawl(
        spark, pages_df, tiny["seeds"], CrawlJob(**base, max_waves=5),
        robots=robots_df, checkpoint_dir=ck, resume=True,
    )
    first = next(t["prefilter"] for t in r2.timings if "prefilter" in t)
    assert first["action"] == "loaded"
    # the replayed delta re-inserts wave 2's cohort (idempotent for the
    # filter: double-inserted fingerprints only cost false-positive rate)
    assert first["rows_hashed"] > 0
    r_full = run_crawl(
        spark, pages_df, tiny["seeds"], CrawlJob(**base, max_waves=5),
        robots=robots_df, checkpoint_dir=str(tmp_path / "full"),
    )
    assert _order(r2, spark) == _order(r_full, spark)


def test_crawl_stored_cuckoo_horizon_aging_parity(
    spark, pages_df, robots_df, tiny, tmp_path
):
    base = dict(politeness_budget=4, max_waves=6, seen_horizon_waves=2)
    r_exact = run_crawl(
        spark, pages_df, tiny["seeds"], CrawlJob(**base, use_bloom=False),
        robots=robots_df, checkpoint_dir=str(tmp_path / "ex"),
    )
    r_tab = run_crawl(
        spark, pages_df, tiny["seeds"],
        CrawlJob(
            **base, use_bloom=True, seen_filter="cuckoo",
            prefilter_store="table",
            prefilter_capacity_factor=40.0, cuckoo_age_load=0.01,
        ),
        robots=robots_df, checkpoint_dir=str(tmp_path / "tab"),
    )
    assert _order(r_exact, spark) == _order(r_tab, spark)
    evicted = [
        w
        for t in r_tab.timings
        for w in t.get("prefilter_update", {}).get("evicted_cohorts", [])
    ]
    assert evicted, f"no cohort eviction recorded: {r_tab.timings}"


def test_crawl_full10_regime_parity(
    spark, pages_df, robots_df, tiny, tmp_path
):
    """The COMPLETE 10^10-URL knob set, on together (VERDICT r3 #6):
    stored bloom bank + forced routed probe + horizon aging machinery +
    flip-gated exact resolution + delta frontier.  With the horizon ==
    max_waves no cohort ages out inside the run, so the schedule must
    equal the all-defaults crawl exactly."""
    base = dict(politeness_budget=4, max_waves=4)
    r_def = run_crawl(
        spark, pages_df, tiny["seeds"], CrawlJob(**base),
        robots=robots_df, checkpoint_dir=str(tmp_path / "def"),
    )
    r_f10 = run_crawl(
        spark, pages_df, tiny["seeds"],
        CrawlJob(
            **base, use_bloom=True, seen_filter="bloom",
            prefilter_store="table", probe_mode="routed",
            seen_horizon_waves=4, frontier_checkpoint="delta",
        ),
        robots=robots_df, checkpoint_dir=str(tmp_path / "f10"),
    )
    assert _order(r_def, spark) == _order(r_f10, spark)
    # every feature actually engaged
    assert StoredBank.exists(str(tmp_path / "f10" / "prefilter"))
    assert {t.get("frontier_kind") for t in r_f10.timings} == {"delta"}
    upd = [t for t in r_f10.timings if "prefilter_update" in t]
    assert upd, "stored bank never delta-merged"


def test_merge_delta_meta_updates_single_atomic_save(spark, tmp_path, monkeypatch):
    """Crawl lineage (merged_upto/cohorts/n_added) must land in the
    SAME meta.json write that repoints the payloads — a crash between
    two separate saves would let a resume replay the delta (double-
    insert; double-DELETE on the aging path would create cuckoo false
    negatives).  merge_delta(meta_updates=...) does exactly one save,
    and a reopened bank sees payloads and lineage together."""
    seen = _urls(spark, 0, 300)
    bank = StoredBank.build(
        seen, "url", str(tmp_path / "bank"), kind="cuckoo",
        n_items=4000, n_shards=4,
    )
    saves = []
    orig = StoredBank.save

    def spy(self):
        saves.append((self.merged_upto, dict(self.cohorts), self.n_added))
        orig(self)

    monkeypatch.setattr(StoredBank, "save", spy)
    delta = _urls(spark, 300, 360)
    bank.merge_delta(
        delta, "url", "insert",
        meta_updates={"n_added": 360, "cohorts": {3: 60}, "merged_upto": 3},
    )
    assert len(saves) == 1
    assert saves[0] == (3, {3: 60}, 360)  # lineage inside THE save
    monkeypatch.setattr(StoredBank, "save", orig)

    reopened = StoredBank.open(str(tmp_path / "bank"))
    assert reopened.merged_upto == 3
    assert reopened.cohorts == {3: 60}
    assert reopened.n_added == 360
    # and the payload repoint is in the same meta: the delta's urls
    # now probe maybe-seen through the reopened handle
    tagged = reopened.probe(delta, "url")
    assert tagged.where(~F.col("_maybe_seen")).count() == 0

    # an EMPTY delta still advances the lineage atomically
    empty = _urls(spark, 0, 0)
    reopened.merge_delta(
        empty, "url", "insert",
        meta_updates={"merged_upto": 4, "cohorts": {3: 60, 4: 0}},
    )
    again = StoredBank.open(str(tmp_path / "bank"))
    assert again.merged_upto == 4 and again.cohorts == {3: 60, 4: 0}
