"""Single-threaded scalar frontier simulator — the ordering/seen-set
oracle (SURVEY §5.3, §7.3).

This is the executable stand-in for FsCrawler's deterministic traversal
of a tree it can see (app/crawler/file_system_crawler.py:482-488): a
plain-Python implementation of the EXACT wave semantics of
plans/wave_loop.py, sharing the same FilterSpec.authorize() scalar
predicates, the same accept_seeds() root dedup, and the same
extract_*_py scalar processors — one code path, two engines.  The
e2e test asserts the Spark engine reproduces the simulator's
(url -> wave, rank_in_wave) map and URL-seen set exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from fscrawler_spark.functions.extract import (
    extract_hrefs_py,
    extract_text_py,
    keywords_py,
    md5_hex_py,
    rating_py,
    sniff_mime_py,
)
from fscrawler_spark.functions.urls import (
    _EXT_MIME,
    url_depth_py,
    url_extension_py,
    url_host_py,
    url_name_py,
    url_normalize_py,
    url_path_py,
    url_resolve_py,
)
from fscrawler_spark.plans.job import CrawlJob, accept_seeds


@dataclass
class SimResult:
    # url -> (wave, rank_in_wave) for every scheduled (fetched) url
    order: dict[str, tuple[int, int]] = field(default_factory=dict)
    seen: set[str] = field(default_factory=set)
    results: list[dict] = field(default_factory=list)
    statuses: dict[str, str] = field(default_factory=dict)
    waves_run: int = 0
    metrics: list[dict] = field(default_factory=list)


def simulate_crawl(
    pages: list[dict],
    seed_rows: list[dict],
    job: CrawlJob,
    robots: list[dict] | None = None,
) -> SimResult:
    pages_by_url = {p["url"]: p for p in pages}
    # (host, prefix, allow) path rules — REP longest-match, allow wins
    # length ties (mirrors wave_loop's struct-max gate exactly)
    path_rules: list[tuple[str, str, bool]] = []
    tokens: dict[str, int] = {}
    if robots and job.respect_robots:
        for r in robots:
            if r.get("crawl_delay_tokens") is not None:
                if r["allow"]:
                    h = r["host"]
                    tokens[h] = min(tokens.get(h, 1 << 30), r["crawl_delay_tokens"])
                continue
            path_rules.append((r["host"], r["path_prefix"], r["allow"]))

    def budget(host: str) -> int:
        return tokens.get(host, job.politeness_budget)

    def skip_authorize(row: dict) -> bool:
        ok = all(f.authorize(row) for f in job.skip_filters)
        return (not ok) if job.invert else ok

    def notify_authorize(row: dict) -> bool:
        if not job.notify_filters:
            return True
        return any(f.authorize(row) for f in job.notify_filters)

    res = SimResult()
    frontier: dict[str, tuple[int, int, int]] = {}  # url -> (depth, priority, seed_id)
    for s in accept_seeds(seed_rows):
        u = url_normalize_py(s["url"])
        d = url_depth_py(s["url"])
        key = (d, d, s["seed_id"])
        if u not in frontier or key < frontier[u]:
            frontier[u] = key

    gwb_carry = 0
    for wave in range(job.max_waves):
        if not frontier:
            break
        res.waves_run = wave + 1
        new = {u: k for u, k in frontier.items() if u not in res.seen}

        missing, present = [], []
        for u, (depth, priority, seed_id) in new.items():
            page = pages_by_url.get(u)
            row = {
                "url": u,
                "host": url_host_py(u),
                "depth": depth,
                "priority": priority,
                "seed_id": seed_id,
            }
            if page is None:
                missing.append(row)
            else:
                row["size"] = len(page["html"])
                row["warc_ts"] = page["warc_ts"]
                present.append(row)

        authorized = [r for r in present if skip_authorize(r)]
        skipped = [r for r in present if not skip_authorize(r)]

        robots_denied = []
        if path_rules:
            still = []
            for r in authorized:
                path = url_path_py(r["url"])
                best: tuple[int, bool] | None = None
                for h, p, a in path_rules:
                    if h == r["host"] and path.startswith(p):
                        key = (len(p), a)
                        if best is None or key > best:
                            best = key
                if best is not None and not best[1]:
                    robots_denied.append(r)
                else:
                    still.append(r)
            authorized = still

        # politeness: per-host rank by (priority, url), take <=budget
        by_host: dict[str, list[dict]] = {}
        for r in authorized:
            by_host.setdefault(r["host"], []).append(r)
        # optional global-budget tier: max-min fair water level over
        # demand capped at each host's own budget (wave_loop.py twin);
        # with carryover, unspent capacity rolls forward token-bucket
        # style, burst capped at one extra wave's budget
        alloc: dict[str, int] | None = None
        gwb_eff = None
        if job.global_wave_budget is not None:
            dem = {
                h: min(len(rows), budget(h)) for h, rows in by_host.items()
            }
            gwb_eff = job.global_wave_budget + (
                gwb_carry if job.global_budget_carryover else 0
            )
            b = gwb_eff
            if sum(dem.values()) <= b:
                alloc = dict(dem)
            else:
                lvl = 0
                while sum(min(d, lvl + 1) for d in dem.values()) <= b:
                    lvl += 1
                alloc = {h: min(d, lvl) for h, d in dem.items()}
        scheduled, deferred = [], []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (r["priority"], r["url"]))
            k = alloc[host] if alloc is not None else budget(host)
            scheduled.extend(rows[:k])
            deferred.extend(rows[k:])
        if job.wave_cap is not None:
            scheduled.sort(key=lambda r: (r["priority"], r["host"], r["url"]))
            deferred.extend(scheduled[job.wave_cap:])
            scheduled = scheduled[: job.wave_cap]
        if gwb_eff is not None and job.global_budget_carryover:
            gwb_carry = min(
                job.global_wave_budget, max(0, gwb_eff - len(scheduled))
            )

        # wave rank: (priority, host, url) lexicographic
        scheduled.sort(key=lambda r: (r["priority"], r["host"], r["url"]))
        children: dict[str, tuple[int, int, int]] = {}
        sched_bytes = 0
        for rank, r in enumerate(scheduled, start=1):
            u = r["url"]
            page = pages_by_url[u]
            res.order[u] = (wave, rank)
            res.statuses[u] = "FETCHED"
            sched_bytes += len(page["html"])
            name = url_name_py(u)
            if notify_authorize(r):
                res.results.append(
                    {
                        "url": u,
                        "host": r["host"],
                        "depth": r["depth"],
                        "wave": wave,
                        "rank_in_wave": rank,
                        "size": len(page["html"]),
                        "md5_hex": md5_hex_py(page["html"]),
                        "text": extract_text_py(page["html"]),
                        "extension": url_extension_py(u),
                        "mime": sniff_mime_py((page["html"] or b"")[:64])
                        or _EXT_MIME.get(url_extension_py(u) or ""),
                        "keywords": keywords_py(name),
                        "rating": rating_py(name, u),
                        "stage": "EXTRACTED",
                    }
                )
            for href in extract_hrefs_py(page["html"]):
                cu = url_resolve_py(u, href)
                if cu is None:
                    continue
                cu = url_normalize_py(cu)
                if not (cu.startswith("http://") or cu.startswith("https://")):
                    continue
                key = (r["depth"] + 1, r["depth"] + 1, r["seed_id"])
                if cu not in children or key < children[cu]:
                    children[cu] = key

        for r in skipped:
            res.statuses[r["url"]] = "SKIPPED"
        for r in robots_denied:
            res.statuses[r["url"]] = "ROBOTS_DENIED"
        for r in missing:
            res.statuses[r["url"]] = "ERROR"
            res.results.append(
                {"url": r["url"], "host": r["host"], "depth": r["depth"],
                 "wave": wave, "stage": "ERROR"}
            )

        res.seen |= {r["url"] for r in scheduled + skipped + missing + robots_denied}
        res.metrics.append(
            {
                "wave": wave,
                "scheduled_n": len(scheduled),
                "scheduled_bytes": sched_bytes,
                "skipped_n": len(skipped),
                "missing_n": len(missing),
                "robots_denied_n": len(robots_denied),
                "deferred_n": len(deferred),
            }
        )

        merged = dict(children)
        for r in deferred:
            key = (r["depth"], r["priority"], r["seed_id"])
            u = r["url"]
            if u not in merged or key < merged[u]:
                merged[u] = key
        frontier = merged

    return res
