"""Category taxonomy dimension + age gating (SURVEY §1.1 data-model
surface; reference app/models/taxnomy.py:10-77).

The reference builds a live object tree (name, parent, color, PEGI
min_age) and walks it per render with inherited age gating
(should_render, taxnomy.py:55-63).  Here the taxonomy is a tiny
DIMENSION TABLE: resolution (path, depth, effective min_age with
nearest-ancestor inheritance) happens driver-side — the tree is
config-scale, the same altitude call as ``accept_seeds`` — and the
resolved dimension broadcasts into any join that needs gating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PATH_SEPARATOR = "/"  # taxnomy.py TAXOMONY_PATH_SEPARATOR

_SCHEMA = (
    "name string, parent string, path string, depth int, "
    "min_age int, effective_min_age int"
)


def build_taxonomy(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """rows: [{name, parent (None for roots), min_age (optional)}] ->
    dimension (name, parent, path, depth, min_age, effective_min_age).

    path/depth mirror taxnomy.py:24-37 (root depth = 1);
    effective_min_age is the node's min_age, inherited from the nearest
    ancestor that has one when unset (should_render's recursion),
    NULL = unrestricted.  Raises on unknown parents or cycles."""
    by_name = {r["name"]: r for r in rows}
    if len(by_name) != len(rows):
        raise ValueError("duplicate taxonomy node names")

    resolved: dict[str, tuple[str, int, int | None]] = {}

    def resolve(name: str, trail: tuple[str, ...] = ()) -> tuple[str, int, int | None]:
        if name in resolved:
            return resolved[name]
        if name in trail:
            raise ValueError(f"taxonomy cycle through {name!r}")
        r = by_name.get(name)
        if r is None:
            raise ValueError(f"unknown taxonomy parent {name!r}")
        parent = r.get("parent")
        if parent is None:
            out = (r["name"], 1, r.get("min_age"))
        else:
            ppath, pdepth, page = resolve(parent, trail + (name,))
            own = r.get("min_age")
            out = (
                f"{ppath}{PATH_SEPARATOR}{r['name']}",
                pdepth + 1,
                own if own is not None else page,
            )
        resolved[name] = out
        return out

    data = []
    for r in rows:
        path, depth, eff = resolve(r["name"])
        data.append(
            (r["name"], r.get("parent"), path, depth, r.get("min_age"), eff)
        )
    return spark.createDataFrame(data, _SCHEMA)


def age_gate(
    df: DataFrame,
    taxonomy: DataFrame,
    max_age: int,
    category_col: str = "category",
) -> DataFrame:
    """Keep rows whose category's effective_min_age <= max_age;
    uncategorized rows and unrestricted categories pass (taxnomy.py
    should_render semantics).  Broadcast join — the taxonomy is a
    config-scale dimension."""
    dim = F.broadcast(
        taxonomy.select(
            F.col("name").alias(category_col),
            F.col("effective_min_age").alias("_min_age"),
        )
    )
    return (
        df.join(dim, category_col, "left")
        .where(F.col("_min_age").isNull() | (F.col("_min_age") <= max_age))
        .drop("_min_age")
    )


def age_gate_results(
    results: DataFrame,
    seed_dim: DataFrame,
    taxonomy: DataFrame,
    max_age: int,
) -> DataFrame:
    """Gate crawl results by their seed's category (SEEDS carries
    category per root): seed_id -> category -> taxonomy min_age."""
    cats = F.broadcast(seed_dim.select("seed_id", "category"))
    return age_gate(
        results.join(cats, "seed_id", "left"), taxonomy, max_age
    )
