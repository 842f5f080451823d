"""File-layout data skipping: writing results SORTED BY SURT key makes
per-file (and per-row-group) min/max footer stats tight, so a
host-prefix predicate prunes almost every file — the layout story for
a 10^10-row frontier/results table (Iceberg/Trino skip at file level
from exactly these stats; Spark's parquet reader row-group-skips from
the same stats via pushed filters).  Measured here from the actual
parquet footers, not asserted rhetorically."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from fscrawler_spark.functions.urls import surt_key


def _file_ranges(path_glob, col):
    out = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(col).statistics
            assert stats is not None and stats.has_min_max
            lo = stats.min if lo is None else min(lo, stats.min)
            hi = stats.max if hi is None else max(hi, stats.max)
        out.append((lo, hi))
    return out


def test_surt_sorted_layout_prunes_files(spark, tmp_path):
    d = spark.range(0, 4000).select(
        F.concat(
            F.lit("http://h"), (F.col("id") % 40).cast("string"),
            F.lit(".example/p"), F.col("id").cast("string"),
        ).alias("url")
    ).select("url", surt_key(F.col("url")).alias("surt"))

    sorted_dir = str(tmp_path / "sorted")
    scattered_dir = str(tmp_path / "scattered")
    (d.orderBy("surt")
      .coalesce(1)
      .write.option("maxRecordsPerFile", 400).parquet(sorted_dir))
    (d.orderBy(F.md5("url"))  # deterministic scatter
      .coalesce(1)
      .write.option("maxRecordsPerFile", 400).parquet(scattered_dir))

    # surt is column index 1 in both layouts
    ranges_sorted = _file_ranges(f"{sorted_dir}/*.parquet", 1)
    ranges_scattered = _file_ranges(f"{scattered_dir}/*.parquet", 1)
    assert len(ranges_sorted) >= 8 and len(ranges_scattered) >= 8

    # point-host prefix predicate: surt in [p, p + '0xFF')
    p = "example,h7)/"
    hi = p + "\xff"
    hit_sorted = sum(1 for lo, mx in ranges_sorted if not (mx < p or lo >= hi))
    hit_scattered = sum(
        1 for lo, mx in ranges_scattered if not (mx < p or lo >= hi)
    )
    # sorted: the host's 100 rows live in <= 2 consecutive files;
    # scattered: every file's range spans the whole keyspace
    assert hit_sorted <= 2, (hit_sorted, ranges_sorted)
    assert hit_scattered == len(ranges_scattered), hit_scattered

    # and the predicate actually reaches the scan on the Spark side
    q = spark.read.parquet(sorted_dir).where(
        (F.col("surt") >= p) & (F.col("surt") < hi)
    )
    assert q.count() == 100
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(surt" in plan
