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


# ---------------------------------------------------------------------------
# D3 — copy/delete side-effect semantics as an executable MERGE-action
# operator.  Reference: copy_path_processor.py:54-72 (same-size target ->
# skip, different-size -> replace, missing -> copy) and
# delete_path_processor.py:21-70 (rows gone from the source are moved to
# a trash table; name collisions in the trash get a " (i)" suffix, i up
# to 10, then error — C14).

ACTION_INSERT = "insert"
ACTION_SKIP = "skip_same_size"
ACTION_REPLACE = "replace_diff_size"
ACTION_SOFT_DELETE = "soft_delete"

MAX_RENAME_ATTEMPTS = 10  # delete_path_processor.py:54-63 cap


def merge_actions(
    dest: DataFrame, incoming: DataFrame, key: str = "url", size_col: str = "size"
) -> DataFrame:
    """Tag every key with its MERGE action (one full-outer equi-join):

      in incoming only            -> insert
      in both, same size          -> skip_same_size
      in both, different size     -> replace_diff_size
      in dest only                -> soft_delete

    Returns (key, dest_size, incoming_size, action).  Pure decision
    table — ``apply_merge`` executes it."""
    d = dest.select(F.col(key), F.col(size_col).alias("dest_size"))
    i = incoming.select(F.col(key), F.col(size_col).alias("incoming_size"))
    action = (
        F.when(F.col("dest_size").isNull(), F.lit(ACTION_INSERT))
        .when(F.col("incoming_size").isNull(), F.lit(ACTION_SOFT_DELETE))
        .when(F.col("dest_size") == F.col("incoming_size"), F.lit(ACTION_SKIP))
        .otherwise(F.lit(ACTION_REPLACE))
    )
    return i.join(d, key, "full_outer").select(
        key, "dest_size", "incoming_size", action.alias("action")
    )


def apply_merge(
    dest: DataFrame,
    incoming: DataFrame,
    trash: DataFrame | None = None,
    key: str = "url",
    size_col: str = "size",
) -> tuple[DataFrame, DataFrame]:
    """Execute ``merge_actions``: returns (new_dest, new_trash).

    new_dest keeps skip rows from dest (untouched, the same-size
    short-circuit) and takes incoming rows for insert/replace.
    Soft-deleted dest rows move to the trash table; a key already
    present in the trash (or deleted twice) gets the reference's
    " (i)" suffix via a per-key occurrence window — attempts beyond
    MAX_RENAME_ATTEMPTS are tagged stage=ERROR instead of silently
    overwriting (C14).  All joins are key-equi (shuffle or broadcast,
    AQE decides); nothing is driver-side."""
    acts = merge_actions(dest, incoming, key, size_col)
    keep_keys = acts.where(F.col("action") == ACTION_SKIP).select(key)
    take_keys = acts.where(
        F.col("action").isin(ACTION_INSERT, ACTION_REPLACE)
    ).select(key)
    del_keys = acts.where(F.col("action") == ACTION_SOFT_DELETE).select(key)

    new_dest = dest.join(keep_keys, key, "left_semi").unionByName(
        incoming.join(take_keys, key, "left_semi"), allowMissingColumns=True
    )

    victims = dest.join(del_keys, key, "left_semi").withColumn(
        "_occ_base", F.lit(1)
    )
    prior = (
        trash.select(F.col(key)).withColumn("_occ_base", F.lit(0))
        if trash is not None
        else None
    )
    pool = victims.select(F.col(key), "_occ_base")
    if prior is not None:
        pool = pool.unionByName(prior)
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy("_occ_base")
    occ = (
        pool.withColumn("_occ", F.row_number().over(w) - 1)
        .where(F.col("_occ_base") == 1)
        .select(F.col(key), "_occ")
    )
    renamed = (
        victims.drop("_occ_base")
        .join(occ, key)
        .withColumn(
            "trash_key",
            F.when(F.col("_occ") == 0, F.col(key)).otherwise(
                F.concat(F.col(key), F.lit(" ("), F.col("_occ"), F.lit(")"))
            ),
        )
        .withColumn(
            "stage",
            F.when(
                F.col("_occ") > MAX_RENAME_ATTEMPTS, F.lit(ERROR_STAGE)
            ).otherwise(F.lit("DELETED")),
        )
        .drop("_occ")
    )
    new_trash = (
        trash.unionByName(renamed, allowMissingColumns=True)
        if trash is not None
        else renamed
    )
    return new_dest, new_trash


def upsert_by_key(existing: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE-shape upsert (S8, data_manager.py:393-436 ON CONFLICT DO
    UPDATE): updates win on key collision, everything else kept.  On
    Iceberg this is literally `MERGE INTO ... WHEN MATCHED UPDATE SET *
    WHEN NOT MATCHED INSERT *`; the Parquet fallback is anti-join+union."""
    kept = existing.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates, allowMissingColumns=True)
