"""The corpus-prep composition — the standard published-pipeline
recipe (Gopher-rule quality filter → exact near-dup canonicalization →
deterministic sample) as one reusable, declaratively-composed plan.

Each stage is the engine-exact machinery of a standalone operator
(textsearch.repetition_stats / textstats.fingerprint /
sampling.hash_sample), chained WITHOUT materialization so Catalyst
optimizes the whole: the keep-filter semi-join prunes documents before
fingerprinting ever runs, and the sample predicate is a plain scan
filter on the surviving rows.  Exposed on the CLI as ``text --op
prep`` and oracle-checked end-to-end as q57.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fscrawler_spark.functions.textstats import fingerprint
from fscrawler_spark.operators.sampling import hash_sample
from fscrawler_spark.operators.textsearch import (
    build_inverted_index,
    repetition_stats,
)


def corpus_prep(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sample_fraction: float = 0.5,
    salt: str = "corpusv1",
) -> DataFrame:
    """Filter → canonicalize → sample; returns the surviving rows of
    ``df`` (all original columns).  Canonicalization keeps the MINIMUM
    id per normalized-text md5 fingerprint — deterministic on any
    engine and partitioning."""
    idx = build_inverted_index(df, id_col, text_col)
    kept_ids = repetition_stats(idx).where(F.col("keep")).select(
        F.col("doc_id").alias(id_col)
    )
    kept = df.join(kept_ids, id_col, "left_semi")
    fp = kept.withColumn("_fp", fingerprint(F.col(text_col)))
    canon = fp.withColumn(
        "_canon", F.min(id_col).over(Window.partitionBy("_fp"))
    ).where(F.col(id_col) == F.col("_canon"))
    return hash_sample(canon, id_col, sample_fraction, salt=salt).drop(
        "_fp", "_canon"
    )
