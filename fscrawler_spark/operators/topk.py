"""Top-k / global ranking utilities (SURVEY §2.5-§2.6).

The reference hand-rolls bounded top-k dicts (app/observers/
metrics_observer.py:50-77,127-133) and sorted-slice reports
(app/crawler_entry_point.py:293-314).  Spark gives `TakeOrderedAndProject`
for orderBy+limit; what it does NOT give scale-safe is a *global
row_number* (a bare ``Window.orderBy`` funnels every row through one
task).  ``global_row_number`` distributes it: range-repartition on the
sort keys, rank inside each range, add per-range offsets (one tiny
count collect) — O(rows/partitions) per task instead of O(rows) on one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, keys: list[str], out: str = "rank", num_partitions: int | None = None
) -> DataFrame:
    """Deterministic 1-based global row number by `keys` (must be a total
    order — no ties — for run-to-run determinism).

    Scale-safe: rows are range-partitioned by the sort keys, ranked
    locally, and shifted by cumulative partition counts.  The only
    driver data is one (partition_id, count) row per partition.

    The input is evaluated twice (count pass + rank pass) — callers in a
    loop should persist `df` first; both passes are deterministic either
    way.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    key_cols = [F.col(k) for k in keys]
    parted = df.repartitionByRange(num_partitions, *key_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = parted.groupBy("_pid").count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["count"]
    if offsets:
        omap = F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        )
        offset_col = F.coalesce(omap[F.col("_pid")], F.lit(0))
    else:
        offset_col = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*key_cols)
    out_df = parted.withColumn(
        out, (F.row_number().over(w) + offset_col).cast("int")
    ).drop("_pid")
    return out_df


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list, k: int, rank_col: str = "_rk"
) -> DataFrame:
    """A7/A8 — k best rows per group (metrics_observer.py:50-77 analog)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
        .drop(rank_col)
    )


def top_k_global(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """O3/O5 — sorted head; Catalyst compiles to TakeOrderedAndProject
    (per-partition heap + driver merge — no global sort)."""
    return df.orderBy(*order_cols).limit(k)
