"""Deterministic synthetic fixtures: pages / seeds / robots_rules.

No wall-clock, no randomness beyond a fixed-seed PCG64 — the same call
always produces byte-identical tables (FIXTURES.md §1-§4).  The pages
table is the sandbox's "fetchable web" (BASELINE.json input_hint):
per-host link trees (the web analog of the directory trees FsCrawler
walks, app/crawler/file_system_crawler.py:482-488) plus cross-host
edges, duplicate edges, back-edges and dangling links (dedup/error-path
targets), and one hot host holding ~30% of all URLs so the skew/salting
path is observable.

``text`` ground truth is produced by the SAME ``extract_text_py`` the
engine's pandas UDF wraps — the byte-identical invariant holds by
construction and the tests then prove the vectorized path agrees.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fscrawler_spark.functions.extract import extract_text_py

_BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

_VOCAB = (
    "web crawl frontier fetch parse index rank spider queue filter host page "
    "link graph shard wave depth seed robots token bucket hash text lang "
    "alpha beta gamma delta epsilon zeta eta theta"
).split()

# content + junk extensions; junk list drawn from the reference's deny-list
# style (app/crawler_entry_point.py:92-99 ignores tmp/log/bak/pyc-ish files).
_CONTENT_EXTS = ["html", "html", "html", "htm", "txt", "pdf"]
_JUNK_EXTS = ["tmp", "log", "bak", "pyc"]

SCALES = {
    # name: (n_hosts, pages_per_cold_host).  Hot host 0 gets ~30% of total.
    # tiny ~0.5k pages (unit/ordering tests), small ~60k (correctness +
    # single-node bench), bench ~600k (two-parallelism scaling run).
    "tiny": (5, 80),
    "small": (50, 840),
    "bench": (500, 840),
    "bench2": (2000, 840),
}


def host_name(h: int) -> str:
    return f"h{h}.example"


def host_root(h: int) -> str:
    return f"http://{host_name(h)}"


def _page_name(rng: np.random.Generator, i: int, is_leaf: bool) -> str:
    """Deterministic segment name; some leaves carry keyword brackets and
    '+'-run rating markers so the C5/C6 extractors have live targets."""
    if not is_leaf:
        return f"s{i}"
    r = rng.integers(0, 10)
    ext = _CONTENT_EXTS[int(rng.integers(0, len(_CONTENT_EXTS)))]
    if r == 0:
        ext = _JUNK_EXTS[int(rng.integers(0, len(_JUNK_EXTS)))]
    stem = f"s{i}"
    if r == 1:
        w1, w2 = rng.choice(len(_VOCAB), 2)
        stem = f"s{i}[{_VOCAB[w1]}_{_VOCAB[w2]}]"
    elif r == 2:
        stem = f"s{i}" + "+" * int(rng.integers(1, 7))
    return f"{stem}.{ext}"


def iter_host_pages(scale: str = "tiny", seed: int = 42):
    """Yield one host's page-record list at a time — bounded memory even
    at the 600k-page bench scale (write_fixture streams these chunks).

    Pages per host form a heap-shaped tree with branching factor 2-4;
    node i's parent is (i-1)//b.  Outlinks embedded in html anchor tags:
    children + parent back-edge + duplicate first-child edge + periodic
    cross-host and dangling links.  Html weight is log-normal around a
    few KB with a heavy tail (web-realistic page sizes — this is what
    makes the extraction stage compute-bound at bench scale).
    """
    n_hosts, per_host = SCALES[scale]
    for h in range(n_hosts):
        yield gen_host(scale, h, seed)


def gen_host(scale: str, h: int, seed: int = 42) -> list[dict]:
    """One host's pages — independently computable (per-host RNG stream
    seeded as f(seed, host)), so fixture generation parallelizes across
    processes and any host is reproducible in isolation."""
    n_hosts, per_host = SCALES[scale]
    rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + h))
    total_cold = n_hosts * per_host
    # hot host: ~30% of all pages (FIXTURES §1 hot-host clause)
    hot_pages = int(0.3 / 0.7 * total_cold)

    if True:  # (indentation kept aligned with the historical loop body)
        pages = []
        n = hot_pages if h == 0 else per_host
        b = int(rng.integers(2, 5))  # branching factor for this host's tree
        root = host_root(h)
        # node 0 is the host root itself
        paths = [""]
        names = ["" for _ in range(n)]
        is_leaf = [(i * b + 1) >= n for i in range(n)]
        for i in range(1, n):
            names[i] = _page_name(rng, i, is_leaf[i])
            parent = (i - 1) // b
            paths.append(paths[parent] + "/" + names[i])
        for i in range(n):
            url = root + paths[i]
            children = [
                root + paths[c] for c in range(i * b + 1, min(i * b + b + 1, n))
            ]
            hrefs: list[str] = list(children)
            if children:
                hrefs.append(children[0])  # duplicate edge (dedup target)
            if i > 0:
                hrefs.append(root + paths[(i - 1) // b])  # back edge
            if i % 7 == 0:
                # cross-host edge; varied targets so host coverage grows
                # exponentially with BFS depth (a chain h->h+1 would make
                # reaching H hosts take H waves)
                hrefs.append(host_root((h + 1 + (i * 13) % 97) % n_hosts))
            if i % 11 == 0:
                hrefs.append(f"{root}/missing/m{i}.html")  # dangling
            n_words = int(rng.integers(40, 400))
            body_words = rng.choice(len(_VOCAB), n_words)
            body = " ".join(_VOCAB[w] for w in body_words)
            # log-normal page weight with a heavy tail, realized as
            # TAG-DENSE markup (~1 tag per 30 bytes, like real html) —
            # not opaque byte runs, so extraction cost is regex work,
            # not a pure memory copy
            fill_len = int(min(np.exp(rng.normal(7.0, 1.2)), 200_000))
            filler = "".join(
                f'<span class="w{j % 7}">{_VOCAB[j % len(_VOCAB)]}</span> '
                for j in range(fill_len // 30)
            )
            links_html = "\n".join(f'<a href="{u}">l</a>' for u in hrefs)
            html = (
                f"<html><head><title>{names[i] or host_name(h)}</title>"
                f'<style>p {{ color: red; }}</style></head><body>\n'
                f'<script>var junk = "<p>not text</p>";</script>\n'
                f"<p>{body} &amp; more</p>\n{links_html}\n"
                f"<div>{filler}</div></body></html>"
            ).encode("utf-8")
            pages.append(
                {
                    "url": url,
                    "warc_ts": _BASE_TS + timedelta(
                        seconds=int(rng.integers(0, 365 * 86400))
                    ),
                    "html": html,
                    "text": extract_text_py(html),
                    "lang": ["en", "fr", "de"][int(rng.integers(0, 3))],
                }
            )
        return pages


def generate_pages(
    scale: str = "tiny", seed: int = 42
) -> tuple[list[dict], list[dict], list[dict]]:
    """Materialized (pages, seeds, robots) record lists — for tests and
    small scales; write_fixture streams iter_host_pages at bench scale."""
    pages = [p for chunk in iter_host_pages(scale, seed) for p in chunk]
    seeds, robots = generate_seeds_robots(scale)
    return pages, seeds, robots


def generate_seeds_robots(scale: str) -> tuple[list[dict], list[dict]]:
    n_hosts, _ = SCALES[scale]
    # enough seeds that wave sizes reach compute-dominated scale quickly
    # on the big fixtures (tiny keeps 4 — the unit tests pin its shape)
    n_seeds = min(n_hosts, max(4, n_hosts // 10))
    seeds = [
        {
            "url": host_root(h),
            "seed_id": h,
            "category": ["documents", "media", "apps", "misc"][h % 4],
            "min_age": [3, 7, 12, 16, 18][h % 5],
            "target_table": f"path_cat{h % 4}",
        }
        for h in range(n_seeds)
    ]
    # overlapping seed — subpath of h1's root; rejected by root-overlap
    # dedup (file_system_crawler.py:212-218 analog, S4)
    seeds.append(
        {
            "url": host_root(1) + "/s1",
            "seed_id": 100,
            "category": "documents",
            "min_age": 3,
            "target_table": "path_cat0",
        }
    )

    robots = []
    for h in range(n_hosts):
        robots.append(
            {
                "host": host_name(h),
                "path_prefix": "/",
                "allow": True,
                "crawl_delay_tokens": 2 if h == 2 else None,
            }
        )
    # host 1 denies its /s1 subtree (subtree-pruning assertion, FIXTURES §4)
    if n_hosts > 1:
        robots.append(
            {
                "host": host_name(1),
                "path_prefix": "/s1",
                "allow": False,
                "crawl_delay_tokens": None,
            }
        )
    return seeds, robots


_PAGES_PA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)
_SEEDS_PA = pa.schema(
    [
        ("url", pa.string()),
        ("seed_id", pa.int32()),
        ("category", pa.string()),
        ("min_age", pa.int32()),
        ("target_table", pa.string()),
    ]
)
_ROBOTS_PA = pa.schema(
    [
        ("host", pa.string()),
        ("path_prefix", pa.string()),
        ("allow", pa.bool_()),
        ("crawl_delay_tokens", pa.int32()),
    ]
)


def _records_table(records: list[dict], schema: pa.Schema) -> pa.Table:
    cols = {f.name: [r[f.name] for r in records] for f in schema}
    return pa.Table.from_pydict(cols, schema=schema)


def _gen_host_star(scale: str, seed: int, h: int) -> list[dict]:
    return gen_host(scale, h, seed)


def write_fixture(out_dir: str, scale: str = "tiny", seed: int = 42) -> str:
    """Write pages/seeds/robots parquet under out_dir; idempotent cache —
    returns out_dir unchanged if the marker file already exists.

    Pages are streamed host-by-host through one ParquetWriter in ~20k-row
    row groups, so peak memory stays bounded at bench scale (600k pages
    x several KB of html each)."""
    marker = os.path.join(out_dir, f"_fixture_{scale}_{seed}.done")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    # per-host RNG streams are independent, so generation fans out
    # across processes; results written in host order (deterministic file)
    import multiprocessing as mp
    from functools import partial

    n_hosts, _ = SCALES[scale]
    buf: list[dict] = []
    with pq.ParquetWriter(os.path.join(out_dir, "pages.parquet"), _PAGES_PA) as w:
        with mp.Pool(min(16, max(1, (os.cpu_count() or 2) - 2))) as pool:
            for host_pages in pool.imap(
                partial(_gen_host_star, scale, seed), range(n_hosts), chunksize=4
            ):
                buf.extend(host_pages)
                if len(buf) >= 20_000:
                    w.write_table(_records_table(buf, _PAGES_PA))
                    buf = []
        if buf:
            w.write_table(_records_table(buf, _PAGES_PA))

    seeds, robots = generate_seeds_robots(scale)
    pq.write_table(_records_table(seeds, _SEEDS_PA),
                   os.path.join(out_dir, "seeds.parquet"))
    pq.write_table(_records_table(robots, _ROBOTS_PA),
                   os.path.join(out_dir, "robots.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir
