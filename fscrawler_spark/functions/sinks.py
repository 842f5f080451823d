"""Small sink/format helpers completing the SURVEY §2 inventory:

  S12 — XSPF playlist sink (app/processors/playlist_generator.py:7-51):
        URL-escape paths and wrap them in an XML tracklist.  Here a
        Column pipeline + one driver-side concat of the (small,
        already-filtered) track list.
  C10 — percent-encoding chain (playlist_generator.py:13-19): the
        reference chains .replace() calls; one regexp-free Column
        translate/when chain reproduces the same byte mapping.
  C11 — JSON serialization of result rows (helpers/serializationHelper
        .py:10-49) -> `to_json(struct(...))`, native.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the reference escapes exactly these characters (playlist_generator.py:13-19)
_ESCAPES = [
    ("%", "%25"),  # must run first, like the reference's chain order
    (" ", "%20"),
    ("'", "%27"),
    ("&", "%26"),
    ('"', "%22"),
    ("<", "%3C"),
    (">", "%3E"),
]


def url_escape(col: Column) -> Column:
    """C10 — chained percent-encoding, same order as the reference
    (escaping '%' first keeps the chain idempotent-safe)."""
    out = col
    for ch, rep in _ESCAPES:
        out = F.replace(out, F.lit(ch), F.lit(rep))
    return out


def xspf_tracks(df: DataFrame, url_col: str = "url", title_col: str | None = None) -> DataFrame:
    """Per-row XSPF <track> elements as a Column (S12)."""
    title = F.col(title_col) if title_col else F.element_at(
        F.split(F.col(url_col), "/"), -1
    )
    track = F.concat(
        F.lit("    <track><location>"),
        url_escape(F.col(url_col)),
        F.lit("</location><title>"),
        url_escape(title),
        F.lit("</title></track>"),
    )
    return df.select(track.alias("track"), F.col(url_col).alias("_u")).orderBy("_u").drop("_u")


def to_xspf(df: DataFrame, url_col: str = "url", title_col: str | None = None) -> str:
    """Render the playlist document (driver-side concat of the small,
    already-filtered track list — the reference builds the same string
    in memory, playlist_generator.py:21-41)."""
    rows = xspf_tracks(df, url_col, title_col).collect()
    body = "\n".join(r["track"] for r in rows)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<playlist version="1" xmlns="http://xspf.org/ns/0/">\n'
        "  <trackList>\n"
        f"{body}\n"
        "  </trackList>\n"
        "</playlist>"
    )


def results_to_json(df: DataFrame, cols: list[str]) -> DataFrame:
    """C11 — row -> JSON string via native to_json(struct(...))."""
    return df.select(F.to_json(F.struct(*[F.col(c) for c in cols])).alias("json"))
