"""fscrawler_spark — a from-scratch PySpark-native crawl-frontier engine.

Generalizes the semantics of the reference (ManuelLang/FsCrawler — a
single-machine, queue-driven filesystem crawler) into a URL-frontier +
fetch-scheduler over Parquet/Iceberg tables of Common-Crawl-style web
pages.  Nothing here is a port: the reference's queue-driven traversal,
filter-chain predicates, processor pipeline, seen-set dedup, staged
lifecycle and metrics are re-expressed on DataFrame/SQL/Catalyst
primitives (see SURVEY.md for the full semantic mapping, with
file:line citations into /root/reference).

Layout:
    schemas        — StructType single source of truth (SURVEY §1.3)
    datagen        — deterministic synthetic pages/seeds/robots fixtures
    functions/     — URL parsing, extraction (hash/text/links/keywords/
                     rating), text analytics; scalar oracle + pandas UDF
                     share one code path (byte-identical invariant)
    filters/       — PathFilter chain as Column builders (SURVEY §2.2)
    operators/     — dedup (seen-set, minhash/simhash/embedding),
                     politeness window, link expansion, top-k, similarity
    plans/         — CrawlJob config, wave-loop driver, checkpoint store,
                     scalar frontier simulator (ordering oracle)
    streaming/     — Structured Streaming variant of the extract pipeline
"""

__version__ = "0.1.0"
