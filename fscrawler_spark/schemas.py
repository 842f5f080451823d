"""StructType single source of truth for every engine table.

The reference maintains its schema twice (Python attrs at
app/models/path.py:34-106 and DDL at
app/database/create_tables_postgres.sql:105-146) with runtime hasattr
drift checks.  Here there is exactly one definition per table; nothing
is ever schema-inferred (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# pages — the fetchable web (BASELINE.json input_hint).  The sandbox analog
# of the filesystem the reference can already see (app/fast_crawler.py:204):
# a "fetch" is an equi-join of scheduled URLs against this table.
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# seeds — crawl roots; generalizes the roots dict
# (app/crawler/file_system_crawler.py:39-57,372-377).
SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("seed_id", T.IntegerType(), False),
        T.StructField("category", T.StringType(), True),
        T.StructField("min_age", T.IntegerType(), True),
        T.StructField("target_table", T.StringType(), True),
    ]
)

# frontier — generalizes _paths_to_crawl + the bounded event queue
# (app/crawler/file_system_crawler.py:57, app/crawler_entry_point.py:103).
# status lifecycle mirrors PathStage (app/models/path_stage.py:7-17).
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("seed_id", T.IntegerType(), True),
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),  # QUEUED|SCHEDULED|FETCHED|SKIPPED|ERROR
    ]
)

# seen — exact URL dedup set; generalizes _crawled_paths / path_exists
# (app/crawler/file_system_crawler.py:70,412-415; data_manager.py:85-87).
SEEN = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

# results — extracted output; generalizes the upsert `path` table
# (app/database/data_manager.py:393-436).
RESULTS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("md5_hex", T.StringType(), True),
        T.StructField("xxhash", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("extension", T.StringType(), True),
        T.StructField("keywords", T.ArrayType(T.StringType()), True),
        T.StructField("rating", T.IntegerType(), True),
        T.StructField("n_links", T.IntegerType(), True),
        T.StructField("stage", T.StringType(), False),
        T.StructField("target_table", T.StringType(), True),
    ]
)

# metrics — per-wave counters; generalizes the crawler stats block
# (file_system_crawler.py:59-79) + MetricsObserver
# (app/observers/metrics_observer.py:28-179).
METRICS = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.LongType(), False),
    ]
)

# robots_rules — per-host allow/deny prefixes + politeness token budget.
# Analog of the .crawlerignore deny-list (app/config/.crawlerignore) and the
# consumer throttle (app/crawling_queue_consumer.py:174-178).
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("path_prefix", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
        T.StructField("crawl_delay_tokens", T.IntegerType(), True),
    ]
)
