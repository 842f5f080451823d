"""Structured Streaming pipeline (SURVEY §2.9): the streaming extraction
must produce per-row outputs identical to the batch processors (shared
expressions), dedup duplicate urls via state, and aggregate windowed
host counts with a watermark."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fscrawler_spark import schemas
from fscrawler_spark.functions.extract import (
    extract_text_py,
    md5_hex_py,
    sniff_mime_py,
)
from fscrawler_spark.streaming.pipeline import (
    extract_stream,
    host_window_counts,
    read_pages_stream,
    run_to_memory,
)


@pytest.fixture(scope="module")
def pages_dir(spark, tiny, tmp_path_factory):
    """Pages laid out as multiple parquet files (a file-arrival stream),
    including a duplicated url across files (dedup-state target)."""
    d = str(tmp_path_factory.mktemp("stream_pages"))

    def _df(slice_):
        rows = [tuple(r.get(f.name) for f in schemas.PAGES.fields) for r in slice_]
        return spark.createDataFrame(rows, schemas.PAGES)

    _df(tiny["pages"][:100]).write.mode("overwrite").parquet(os.path.join(d, "batch0"))
    # second batch re-delivers 20 of the same urls; third delivers 100 new
    _df(tiny["pages"][:20]).write.mode("overwrite").parquet(os.path.join(d, "batch1"))
    _df(tiny["pages"][100:200]).write.mode("overwrite").parquet(os.path.join(d, "batch2"))
    return d


def test_streaming_extract_matches_batch(spark, pages_dir, tiny):
    stream = read_pages_stream(spark, f"{pages_dir}/*", max_files_per_trigger=1)
    q = run_to_memory(extract_stream(stream), "extracted_stream")
    out = spark.sql("SELECT * FROM extracted_stream").collect()
    q.stop()

    by_url = {p["url"]: p for p in tiny["pages"]}
    # dedup: each url exactly once despite the re-delivered batch
    urls = [r["url"] for r in out]
    assert len(urls) == len(set(urls))
    assert len(urls) == 200  # 100 + 100 new (20 dups dropped)
    for r in out:
        page = by_url[r["url"]]
        assert r["md5_hex"] == md5_hex_py(page["html"])
        assert r["text"] == extract_text_py(page["html"])  # byte-identical
        assert r["size"] == len(page["html"])
        assert r["mime"] == (
            sniff_mime_py((page["html"] or b"")[:64]) or r["mime"]
        )  # streaming mime matches the scalar sniffer (ext fallback else)


def test_streaming_window_counts(spark, pages_dir, tiny):
    stream = read_pages_stream(spark, f"{pages_dir}/batch0", max_files_per_trigger=1)
    q = run_to_memory(
        host_window_counts(stream, window="1 day", watermark="0 seconds")
        .select("win", "host", "pages", "bytes"),
        "host_counts",
        mode="complete",  # emit full state incl. final un-flushed windows
    )
    out = spark.sql("SELECT host, sum(pages) AS p FROM host_counts GROUP BY host").collect()
    q.stop()
    got = {r["host"]: r["p"] for r in out}
    expect: dict[str, int] = {}
    first100 = tiny["pages"][:100]
    from fscrawler_spark.functions.urls import url_host_py

    for p in first100:
        h = url_host_py(p["url"])
        expect[h] = expect.get(h, 0) + 1
    assert got == expect


def test_stateful_host_ledger(spark, pages_dir, tiny):
    """applyInPandasWithState: per-host running totals accumulate across
    micro-batches; the final state equals the batch ground truth."""
    from fscrawler_spark.functions.urls import url_host_py
    from fscrawler_spark.streaming.pipeline import host_crawl_state

    stream = read_pages_stream(spark, f"{pages_dir}/batch0", max_files_per_trigger=1)
    q = run_to_memory(host_crawl_state(stream), "host_state", mode="update")
    # update mode emits one row per host per touching batch; the LAST
    # emission per host carries the final running totals
    out = spark.sql(
        "SELECT host, max(total_pages) p, max(total_bytes) b FROM host_state GROUP BY host"
    ).collect()
    q.stop()
    got = {r["host"]: (r["p"], r["b"]) for r in out}
    expect: dict[str, list[int]] = {}
    for page in tiny["pages"][:100]:
        h = url_host_py(page["url"])
        e = expect.setdefault(h, [0, 0])
        e[0] += 1
        e[1] += len(page["html"])
    assert got == {h: tuple(v) for h, v in expect.items()}


def test_streaming_session_windows_match_batch(spark, pages_dir, tiny):
    """host_session_windows: stream (availableNow, complete mode) ==
    the identical expression over the same files as a batch read —
    row-for-row, the St4 gap-session state machinery verified against
    the stateless batch plan."""
    from fscrawler_spark.streaming.pipeline import host_session_windows

    stream = read_pages_stream(spark, f"{pages_dir}/batch0", max_files_per_trigger=1)
    # Session windows DROP late rows before merging (unlike the tumbling
    # complete-mode test above) and per-file triggers deliver timestamps
    # out of order, so the parity run needs a watermark wider than the
    # fixture's time span — nothing is "late", every session merges.
    q = run_to_memory(
        host_session_windows(stream, gap="30 minutes", watermark="3650 days"),
        "host_sessions",
        mode="complete",
    )
    got = {
        (r["host"], r["session_start"], r["pages"], r["bytes"])
        for r in spark.sql("SELECT * FROM host_sessions").collect()
    }
    q.stop()
    batch = spark.read.schema(
        spark.read.parquet(f"{pages_dir}/batch0").schema
    ).parquet(f"{pages_dir}/batch0")
    want = {
        (r["host"], r["session_start"], r["pages"], r["bytes"])
        for r in host_session_windows(batch).collect()
    }
    assert got == want and len(want) > 0


def test_checkpointed_parquet_sink_exactly_once(spark, pages_dir, tiny, tmp_path):
    """Stop/arrive/restart with one checkpoint: the second run consumes
    ONLY the newly arrived files — no re-processing, no dup rows."""
    import shutil

    from fscrawler_spark.streaming.pipeline import run_to_parquet

    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    shutil.copytree(f"{pages_dir}/batch0", src)
    stream1 = read_pages_stream(spark, src).select("url", "warc_ts")
    run_to_parquet(stream1, out, ckpt).stop()
    n1 = spark.read.parquet(out).count()
    assert n1 == 100

    # new files arrive; a fresh query on the SAME checkpoint resumes
    for f in __import__("os").listdir(f"{pages_dir}/batch2"):
        if f.endswith(".parquet") and not f.startswith("."):
            shutil.copy(f"{pages_dir}/batch2/{f}", f"{src}/late_{f}")
    stream2 = read_pages_stream(spark, src).select("url", "warc_ts")
    run_to_parquet(stream2, out, ckpt).stop()
    final = spark.read.parquet(out)
    assert final.count() == 200
    assert final.select("url").distinct().count() == 200  # no dups


def test_streaming_sketch_maintenance_matches_batch(spark, tmp_path):
    """Incremental HLL and CMS maintenance over a multi-batch stream
    equals the one-shot batch sketch of all rows — the mergeability
    contract, end-to-end through foreachBatch versioned state."""
    from functools import partial

    from fscrawler_spark.functions.sketch import (
        cms_build,
        cms_merge,
        hll_finalize,
        hll_merge,
        hll_sketch,
    )
    from fscrawler_spark.streaming.pipeline import (
        maintain_sketch_stream,
        read_sketch_state,
    )

    src = str(tmp_path / "rows")
    all_rows = [("g", (i * 7) % 400) for i in range(1200)]
    # Four separate files -> four micro-batches at maxFilesPerTrigger=1.
    for part in range(4):
        spark.createDataFrame(
            all_rows[part * 300 : (part + 1) * 300], "g string, k long"
        ).coalesce(1).write.mode("append").parquet(src)

    batch_df = spark.createDataFrame(all_rows, "g string, k long")

    stream = (
        spark.readStream.schema("g string, k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    maintain_sketch_stream(
        stream,
        partial(hll_sketch, group_cols=["g"], key_col="k"),
        partial(hll_merge, group_cols=["g"]),
        str(tmp_path / "hll_state"),
        str(tmp_path / "hll_ckpt"),
    )
    got = hll_finalize(
        read_sketch_state(spark, str(tmp_path / "hll_state")), ["g"]
    ).collect()[0]
    want = hll_finalize(hll_sketch(batch_df, ["g"], "k"), ["g"]).collect()[0]
    assert (got["n_hit"], got["s_scaled"], got["est_distinct"]) == (
        want["n_hit"],
        want["s_scaled"],
        want["est_distinct"],
    )

    stream2 = (
        spark.readStream.schema("g string, k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    maintain_sketch_stream(
        stream2,
        partial(cms_build, key_col="k"),
        cms_merge,
        str(tmp_path / "cms_state"),
        str(tmp_path / "cms_ckpt"),
    )
    got_cms = {
        (r["row_j"], r["idx"]): r["c"]
        for r in read_sketch_state(spark, str(tmp_path / "cms_state")).collect()
    }
    want_cms = {
        (r["row_j"], r["idx"]): r["c"] for r in cms_build(batch_df, "k").collect()
    }
    assert got_cms == want_cms


def test_streaming_sketch_restart_exactly_once(spark, tmp_path):
    """Stop/arrive/restart on the SAME checkpoint: the resumed stream
    consumes only the new files, and the merged state still equals the
    batch sketch of everything — no double-counting across restarts."""
    from functools import partial

    from fscrawler_spark.functions.sketch import cms_build, cms_merge
    from fscrawler_spark.streaming.pipeline import (
        maintain_sketch_stream,
        read_sketch_state,
    )

    src = str(tmp_path / "rows")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    first = [("g", (i * 3) % 200) for i in range(600)]
    later = [("g", (i * 11) % 350) for i in range(400)]

    spark.createDataFrame(first, "g string, k long").coalesce(2).write.mode(
        "append"
    ).parquet(src)

    def run():
        stream = (
            spark.readStream.schema("g string, k long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        maintain_sketch_stream(
            stream, partial(cms_build, key_col="k"), cms_merge, state, ckpt
        )

    run()  # drain the first arrivals, then "stop"
    mid = {
        (r["row_j"], r["idx"]): r["c"]
        for r in read_sketch_state(spark, state).collect()
    }
    want_mid = {
        (r["row_j"], r["idx"]): r["c"]
        for r in cms_build(
            spark.createDataFrame(first, "g string, k long"), "k"
        ).collect()
    }
    assert mid == want_mid

    spark.createDataFrame(later, "g string, k long").coalesce(2).write.mode(
        "append"
    ).parquet(src)
    run()  # restart on the same checkpoint
    got = {
        (r["row_j"], r["idx"]): r["c"]
        for r in read_sketch_state(spark, state).collect()
    }
    want = {
        (r["row_j"], r["idx"]): r["c"]
        for r in cms_build(
            spark.createDataFrame(first + later, "g string, k long"), "k"
        ).collect()
    }
    assert got == want


def test_streaming_canonical_dedup_collapses_aliases(spark, tmp_path):
    """canonical_dedup_stream: alias spellings (tracking params, param
    order, fragments) of one page are ONE output row even when the
    aliases arrive in later files; genuinely distinct params survive."""
    import os as _os

    from fscrawler_spark.functions.urls import canonicalize_url_py
    from fscrawler_spark.streaming.pipeline import (
        canonical_dedup_stream,
        read_pages_stream,
        run_to_memory,
    )

    d = str(tmp_path / "pages")

    def _write(name, urls):
        rows = [
            {"url": u, "warc_ts": None, "html": b"<html></html>",
             "text": "", "lang": "en"}
            for u in urls
        ]
        spark.createDataFrame(
            [tuple(r.get(f.name) for f in schemas.PAGES.fields) for r in rows],
            schemas.PAGES,
        ).write.mode("overwrite").parquet(_os.path.join(d, name))

    batch0 = [
        "http://a.example/p?b=2&a=1",
        "http://a.example/q",
    ]
    batch1 = [  # all aliases of batch0 rows -> zero new output
        "http://a.example/p?a=1&b=2&utm_source=x",
        "http://a.example/p?a=1&b=2#frag",
        "http://a.example/q?gclid=z",
    ]
    batch2 = [  # a genuinely different param set -> one new row
        "http://a.example/p?a=1&b=2&c=3",
    ]
    _write("b0", batch0)
    _write("b1", batch1)
    _write("b2", batch2)

    stream = read_pages_stream(spark, f"{d}/*", max_files_per_trigger=1)
    q = run_to_memory(canonical_dedup_stream(stream), "canon_stream")
    out = spark.sql("SELECT canonical_url FROM canon_stream").collect()
    q.stop()
    got = sorted(r["canonical_url"] for r in out)
    want = sorted(
        {canonicalize_url_py(u) for u in batch0 + batch1 + batch2}
    )
    assert got == want
    assert len(got) == 3


def test_streaming_sitemap_ingest_matches_batch(spark, tmp_path):
    """parse_sitemaps is a stateless projection, so it runs unchanged
    on a file STREAM of sitemap bodies — discovered URL rows equal the
    batch parse of the same files (the live-discovery ingest path)."""
    import os as _os

    from fscrawler_spark.sources.sitemap import parse_sitemaps
    from fscrawler_spark.streaming.pipeline import run_to_memory

    d = str(tmp_path / "maps")
    bodies = []
    for i in range(3):
        body = "<urlset>" + "".join(
            f"<url><loc>http://h{i}.example/p{j}</loc>"
            + (f"<lastmod>2026-0{j+1}-01</lastmod>" if j % 2 == 0 else "")
            + "</url>"
            for j in range(4)
        ) + "</urlset>"
        bodies.append((f"h{i}", body))
        spark.createDataFrame([bodies[-1]], "site string, body string") \
            .write.parquet(_os.path.join(d, f"b{i}"))

    batch = parse_sitemaps(
        spark.read.parquet(f"{d}/*"), "body", keep_cols=["site"]
    )
    want = sorted((r["site"], r["loc"], r["lastmod"]) for r in batch.collect())

    stream = spark.readStream.schema("site string, body string").option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{d}/*")
    q = run_to_memory(
        parse_sitemaps(stream, "body", keep_cols=["site"]), "sitemap_stream"
    )
    got = sorted(
        (r["site"], r["loc"], r["lastmod"])
        for r in spark.sql("SELECT * FROM sitemap_stream").collect()
    )
    q.stop()
    assert got == want and len(got) == 12
