"""Staged post-processing pipeline (D2 / SURVEY §3.3).

The reference's stage machine (app/models/path_stage.py:7-17:
CRAWLED -> ATTRIBUTES_EXTRACTED -> HASH_COMPUTED -> TEXT_EXTRACTED ->
THUMBNAIL_GENERATED -> INDEXED, errors -> PATH_DELETED) is driven by a
2000-row polling loop (app/index_files.py:53-79).  In Spark the entire
poll loop is ONE declarative transform per stage transition: select the
rows at a stage, apply the processors, advance the stage, tag failures
instead of dropping them — partitions replace the LIMIT loop.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# transition order mirrors path_stage.py:7-17 (web-relevant subset)
STAGES = ["CRAWLED", "HASH_COMPUTED", "TEXT_EXTRACTED", "INDEXED"]
ERROR_STAGE = "ERROR"


def advance_stage(
    df: DataFrame,
    from_stage: str,
    to_stage: str,
    transforms: dict[str, Column],
    ok_pred: Column | None = None,
) -> DataFrame:
    """Rows at `from_stage` get `transforms` applied and move to
    `to_stage`; rows failing `ok_pred` move to ERROR instead (error
    containment D4 — tagged, never dropped).  Other rows pass through
    unchanged — the whole table stays one DataFrame, no polling."""
    at_stage = F.col("stage") == from_stage
    out = df
    for name, expr in transforms.items():
        prev = F.col(name) if name in df.columns else F.lit(None)
        out = out.withColumn(name, F.when(at_stage, expr).otherwise(prev))
    ok = ok_pred if ok_pred is not None else F.lit(True)
    out = out.withColumn(
        "stage",
        F.when(at_stage & F.coalesce(ok, F.lit(False)), F.lit(to_stage))
        .when(at_stage, F.lit(ERROR_STAGE))
        .otherwise(F.col("stage")),
    )
    return out


def run_pipeline(
    df: DataFrame,
    steps: list[tuple[str, str, dict[str, Column], Column | None]],
) -> DataFrame:
    """Chain stage transitions; each step = (from, to, transforms, ok)."""
    out = df
    for from_stage, to_stage, transforms, ok in steps:
        out = advance_stage(out, from_stage, to_stage, transforms, ok)
    return out


def standard_pipeline(df: DataFrame) -> DataFrame:
    """The index_files.py processor set re-expressed: hash -> text ->
    indexed flag, each one whole-table declarative pass."""
    from fscrawler_spark.functions.extract import extract_text_udf
    from fscrawler_spark.functions.urls import url_extension

    return run_pipeline(
        df,
        [
            (
                "CRAWLED",
                "HASH_COMPUTED",
                {
                    "md5_hex": F.md5("html"),
                    "xxhash": F.xxhash64("html"),
                    "extension": url_extension(F.col("url")),
                },
                F.col("html").isNotNull(),
            ),
            (
                "HASH_COMPUTED",
                "TEXT_EXTRACTED",
                {"text": extract_text_udf(F.col("html"))},
                None,
            ),
            ("TEXT_EXTRACTED", "INDEXED", {}, F.col("text").isNotNull()),
        ],
    )


def upsert_by_key(existing: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE-shape upsert (S8, data_manager.py:393-436 ON CONFLICT DO
    UPDATE): updates win on key collision, everything else kept.  On
    Iceberg this is literally `MERGE INTO ... WHEN MATCHED UPDATE SET *
    WHEN NOT MATCHED INSERT *`; the Parquet fallback is anti-join+union."""
    kept = existing.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates, allowMissingColumns=True)
