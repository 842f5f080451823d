"""End-to-end tour: WARC archive in -> crawl -> curate -> pack -> WARC out.

The switching-user demo: every stage a FsCrawler user runs today, on
Spark, in one script —

  1. an input WARC archive (here: synthesized pages, written with the
     engine's own distributed WARC sink, then read back with its source)
  2. the wave-loop crawl over those pages (politeness + robots +
     water-filled global budget, checkpointed/resumable)
  3. curation: yield funnel -> MinHash near-dup pairs -> cluster ->
     canonical keep
  4. training-sequence packing of the surviving text
  5. the fetched pages re-archived as WARC segments

Run:  python examples/end_to_end.py [workdir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fscrawler_spark import schemas
from fscrawler_spark.datagen import generate_pages
from fscrawler_spark.operators.graph import dedup_clusters
from fscrawler_spark.operators.prep import pack_sequences, yield_funnel
from fscrawler_spark.operators.similarity import minhash_lsh_pairs
from fscrawler_spark.plans.job import CrawlJob
from fscrawler_spark.plans.wave_loop import run_crawl
from fscrawler_spark.session import get_spark
from fscrawler_spark.sources.warc import read_warc, write_warc_segments


def main(workdir: str | None = None) -> dict:
    work = workdir or tempfile.mkdtemp(prefix="fsc_tour_")
    spark = get_spark("fscrawler_tour", cores="8")

    # 1 — the input archive
    pages, seeds, robots = generate_pages("tiny", seed=42)
    rows = [tuple(r.get(f.name) for f in schemas.PAGES.fields) for r in pages]
    raw = spark.createDataFrame(rows, schemas.PAGES)
    in_dir = os.path.join(work, "warc_in")
    write_warc_segments(raw, in_dir).collect()
    archived = read_warc(spark, f"{in_dir}/*.warc.gz")

    # 2 — the crawl
    robots_df = spark.createDataFrame(
        [tuple(r.get(f.name) for f in schemas.ROBOTS.fields) for r in robots],
        schemas.ROBOTS,
    )
    job = CrawlJob(
        politeness_budget=50, max_waves=4,
        global_wave_budget=400, global_budget_carryover=True,
    )
    res = run_crawl(
        spark, archived, seeds, job, robots=robots_df,
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    fetched = res.results(spark).where("stage='EXTRACTED'")

    # 3 — curation
    docs = fetched.select(
        F.monotonically_increasing_id().alias("doc_id"), "url", "text"
    ).persist()
    funnel = {
        r["stage"]: r["n_docs"]
        for r in yield_funnel(docs, "doc_id", "text", min_tokens=3).collect()
    }
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.7)
    clusters = dedup_clusters(docs, "doc_id", pairs)
    kept = docs.join(
        clusters.where("is_canonical").select("doc_id"), "doc_id", "left_semi"
    )

    # 4 — packing
    packed = pack_sequences(kept, "doc_id", "text", cap=128, n_buckets=8)

    # 5 — the output archive
    out_dir = os.path.join(work, "warc_out")
    out_pages = fetched.select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col("text").cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )
    segs = write_warc_segments(out_pages, out_dir).collect()

    summary = {
        "workdir": work,
        "pages_archived_in": raw.count(),
        "pages_crawled": fetched.count(),
        "funnel": funnel,
        "docs_kept_after_dedup": kept.count(),
        "training_sequences": packed.count(),
        "warc_out_segments": len(segs),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
