"""CrawlJob — the declarative crawl plan (SURVEY §3.1 stage 1).

The reference's "planning" is constructing a live object graph of
crawler + filters + observers + processors (app/crawler_entry_point.py:
56-128).  Here the plan is a frozen config dataclass; the wave loop
interprets it and Catalyst owns the physical plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from fscrawler_spark.filters.builders import FilterSpec


@dataclass(frozen=True)
class CrawlJob:
    """Everything that defines a crawl run.

    skip_filters — AND chain, deny prunes the subtree (no link expansion
        from a denied URL): file_system_crawler.py:447-460 semantics.
    notify_filters — OR chain deciding which fetched pages land in
        results; empty = all (file_system_crawler.py:462-468).
    invert — select only filtered-out paths (fast_crawler.py:96-113).
    politeness_budget — default max fetches per host per wave; robots
        crawl_delay_tokens overrides per host.
    wave_cap — optional global scheduled-URL cap per wave (bounded
        queue maxsize analog, app/config/config.py:129-131).
    use_bloom — two-tier seen-set probe (operators/dedup.py).
    respect_robots — apply robots deny prefixes before scheduling.
    """

    politeness_budget: int = 8
    max_waves: int = 50
    wave_cap: int | None = None
    # Optional global per-wave fetch capacity, water-filled across
    # hosts (max-min fair integer level, operators/politeness.py
    # waterfill_budget) and applied as each host's budget for the
    # wave; per-host demand is pre-capped at the politeness /
    # crawl-delay budget so allocations are always spendable.  Differs
    # from wave_cap (a post-rank truncation by global priority): the
    # water level preserves small hosts' service when one mega-host
    # dominates the frontier.  None = off.
    global_wave_budget: int | None = None
    # With carryover on, a wave's unspent global budget (sub-level
    # waterfill remainder + under-demand slack) rolls into the next
    # wave's capacity, token-bucket style with burst capped at one
    # extra wave's budget (eff <= 2*global_wave_budget) — so a quiet
    # frontier banks at most one wave of credit.  Off (default) keeps
    # each wave's capacity exact.  The carry counter is driver state,
    # reset on resume (documented; the budget is a rate control, not
    # an exactness invariant).
    global_budget_carryover: bool = False
    skip_filters: tuple[FilterSpec, ...] = field(default_factory=tuple)
    notify_filters: tuple[FilterSpec, ...] = field(default_factory=tuple)
    invert: bool = False
    use_bloom: bool = False
    # "bloom" | "cuckoo" — which membership pre-filter accelerates the
    # seen anti-join when use_bloom is set (cuckoo supports deletion —
    # the aging/spill path; see operators/dedup.py)
    seen_filter: str = "bloom"
    bloom_fpp: float = 0.01
    respect_robots: bool = True
    salt_buckets: int = 32
    # Waves whose pending frontier is below this row count take the
    # small-wave physical path (no salt phase, single-window rank) —
    # identical results, fewer shuffles.  At cluster scale leave as is;
    # the crossover only matters for job-overhead-dominated waves.
    small_wave_threshold: int = 100_000
    # Broadcast the scheduled set into the fetch join (and the rank map
    # back over the extracted cache) only when the wave's SCHEDULED set
    # is below this row count; above it the broadcast would be a hard
    # hint that OOMs the driver (10^8 hosts x budget rows), so the plan
    # falls back to a plain equi-join and AQE picks the strategy.  ~2M
    # slim rows (url+4 ints, <200 B) ~ 400 MB on the driver — the safe
    # edge for the default 8g driver; raise on bigger drivers.  (r02
    # advisory: the guard keys off the scheduled bound — wave_cap, then
    # the exact ranked count — not the pending frontier size, so a huge
    # frontier with a tight budget keeps the fast broadcast path.)
    broadcast_wave_threshold: int = 2_000_000
    # Flip the EXACT tier of the seen anti-join to the seen-scan-only
    # broadcast semi/anti pair (dedup._flip_resolve) only when the seen
    # table is at least this many times the pending frontier.  Above
    # the ratio the plain left_anti sort-merge re-shuffles a seen side
    # far bigger than the candidates (the 10^10-seen regime — the flip
    # removes that entirely); below it the two sides are comparable, a
    # same-size SMJ is cheap, and two per-wave driver broadcasts are
    # pure overhead (measured: +67% plan_build on the 4N scaling leg
    # when flipping at seen:frontier ~ 2:1).  The frontier must also be
    # under broadcast_wave_threshold for the flip to be safe.
    flip_seen_factor: float = 4.0
    # Seen-prefilter probe routing (operators/dedup.py anti_join_seen):
    # "auto" broadcasts small banks and shard-routes big ones; "routed"
    # / "broadcast" force a path (tests / known deployments).
    probe_mode: str = "auto"
    # The prefilter bank is built once sized for factor x current seen
    # count, then maintained incrementally from per-wave deltas; a full
    # rebuild happens only when the count outgrows capacity (geometric
    # doubling -> O(log n) rebuilds over a crawl, amortized O(n)).
    prefilter_capacity_factor: float = 8.0
    # Where the prefilter bank lives.  "memory": driver-held
    # ShardedBloom/ShardedCuckoo — fastest for small crawls (no table
    # IO per wave) but the bank transits the driver on every merge and
    # probe.  "table": parquet table of shard blobs inside the
    # checkpoint dir (operators/bankstore.StoredBank) — build, delta
    # merge and probe are executor-side jobs touching O(|delta| +
    # touched shards) bytes, the driver never holds a payload, and a
    # resumed crawl reloads the bank instead of rebuilding it.  The
    # 10^10 deployment setting (a ~12 GB bank neither fits nor should
    # transit the driver).
    prefilter_store: str = "memory"
    # Re-crawl horizon: a URL seen in wave w blocks re-scheduling for
    # the next seen_horizon_waves waves, then ages out of BOTH the
    # exact seen table and the prefilter (cuckoo: incremental cohort
    # delete; bloom: dropped at the next rebuild).  None = never
    # re-crawl (reference semantics).
    seen_horizon_waves: int | None = None
    # Load fraction of prefilter capacity above which expired cohorts
    # are evicted from the cuckoo bank (aging is lazy: stale filter
    # positives are safe — they just fall through to the exact join).
    cuckoo_age_load: float = 0.7
    # Repartition+persist the pages table by url once before the loop
    # so non-broadcast fetch joins never re-shuffle the html side (the
    # bucketed-table analog; r02 advisory on wave_loop fetch_join).
    prepartition_pages: bool = False
    # Frontier checkpoint layout.  "full" rewrites the entire pending
    # frontier every wave — simple, read == write, but O(|frontier|)
    # write volume per wave: at the 10^10-row frontier the north star
    # targets that is ~1 TB of object-store writes per wave while the
    # actual change is ~1000x smaller (hosts x budget consumed rows +
    # the wave's children).  "delta" writes only the wave's discovered
    # children (the consumed rows are already recorded in the seen
    # delta — no second copy) plus a full compaction snapshot every
    # frontier_compact_every waves: the Iceberg merge-on-read model.
    # In-loop lineage is truncated with localCheckpoint (executor-local
    # blocks, released at each compaction); resume replays the last
    # snapshot + deltas + per-wave seen anti-joins (exact under
    # seen_horizon_waves aging too, because the replay applies the same
    # horizon-filtered seen view wave by wave).  Delta is the default —
    # outputs are identical (pytest-pinned), it measured 25-30% faster
    # wall on deferred-dominated crawls and neutral otherwise
    # (BENCH/BASELINE.md round-3 A/B) — "full" remains for debugging
    # and for stores where read-simplicity beats write volume.
    frontier_checkpoint: str = "delta"
    frontier_compact_every: int = 8
    # Parquet codec for the per-wave checkpoint writes (storage.py;
    # lz4_raw = the parquet-standard LZ4 frame, readable by DuckDB/Arrow
    # — Spark's plain "lz4" writes hadoop-framed files they reject).
    # Checkpoints are write-once/read-once: lz4 halves encode CPU vs
    # snappy at ~5-10% bigger files.  Use zstd when checkpoints land on
    # remote object storage and network bytes dominate.
    checkpoint_codec: str = "lz4_raw"


def accept_seeds(seed_rows: list[dict]) -> list[dict]:
    """Sequential root-overlap dedup (S4): iterate seeds in seed_id
    order; reject any seed that is a URL-prefix of, or prefixed by, an
    already-accepted seed (file_system_crawler.py:203-228, prefix test
    both directions at :212-218).  Seeds are config-scale (a handful of
    rows — the reference holds them in a dict), so this runs driver-side;
    the engine and the simulator share this exact function.
    """
    accepted: list[dict] = []
    for row in sorted(seed_rows, key=lambda r: r["seed_id"]):
        url = row["url"]
        if any(
            url.startswith(a["url"]) or a["url"].startswith(url) for a in accepted
        ):
            continue
        accepted.append(row)
    return accepted
