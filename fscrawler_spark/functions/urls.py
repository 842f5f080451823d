"""URL parsing as native Column expressions (JVM-side, codegen'd).

Mirrors the reference's path-string helpers — extension normalization
(app/models/path.py:108-133), relative-path stripping (path.py:39-47),
name/stem parsing (path.py:65,84-86) — re-targeted from filesystem paths
to URLs.  Everything here is a pure ``Column -> Column`` function; no
Python executes per row.

Scalar twins (``*_py``) implement identical semantics for the
single-threaded frontier simulator (SURVEY §7.3) and unit tests.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^[a-z][a-z0-9+.-]*://"


def url_host(url: Column) -> Column:
    """Host part of an absolute URL ('' if relative)."""
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)


def url_path(url: Column) -> Column:
    """Path part including leading '/' ('' for bare host)."""
    return F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://[^/]+", "")


def url_depth(url: Column) -> Column:
    """Number of non-empty path segments; bare host -> 0.

    The URL analog of DepthFilter's parts-count
    (app/filters/depth_filter.py:28-30, len of relative parts).
    """
    p = F.regexp_replace(url_path(url), r"^/+|/+$", "")
    return F.when(p == "", F.lit(0)).otherwise(F.size(F.split(p, "/+")))


def url_name(url: Column) -> Column:
    """Final PATH segment (the analog of Path.name, path.py:65).
    Bare-host URLs have no path -> '' (like Path('/').name) — the host
    must never leak in as a pseudo-filename (else 'http://a.example'
    would grow extension 'example')."""
    stripped = F.regexp_replace(url_path(url), r"/+$", "")
    return F.element_at(F.split(stripped, "/"), -1)


def url_extension(url: Column) -> Column:
    """Lowercased extension of the final segment, no dot; null when the
    segment has no dot or the candidate exceeds 12 chars — the exact
    length-cap-12 rule of ExtensionFilter (app/filters/extension_filter.py:46-49).
    """
    ext = F.regexp_extract(url_name(url), r"\.([A-Za-z0-9_]{1,12})$", 1)
    return F.when(ext == "", F.lit(None).cast("string")).otherwise(F.lower(ext))


def url_parent(url: Column) -> Column:
    """Parent URL (one path level up); host root is its own parent stop."""
    return F.regexp_replace(url, r"/[^/]+/?$", "")


def url_normalize(url: Column) -> Column:
    """Canonical form used for frontier identity: lowercase scheme+host,
    strip fragment, strip trailing slash (except bare host kept bare),
    collapse duplicate slashes in the path.

    Identity normalization is what makes the seen-set (J2) exact; the
    reference normalizes with Path.resolve (file_system_crawler.py:411-415).
    """
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    # lowercase scheme://host
    head = F.lower(F.regexp_extract(u, r"^([a-z][a-z0-9+.-]*://[^/]+)", 1))
    tail = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://[^/]+", "")
    tail = F.regexp_replace(tail, r"/{2,}", "/")
    tail = F.regexp_replace(tail, r"/+$", "")
    return F.when(head == "", u).otherwise(F.concat(head, tail))


def url_resolve(base: Column, href: Column) -> Column:
    """Resolve an href against a base page URL (subset of RFC 3986 the
    link extractor needs): absolute http(s) hrefs pass through;
    host-relative '/x' joins scheme+host; relative 'x' joins the base's
    parent directory.  Other schemes -> null (dropped by the caller)."""
    scheme_host = F.regexp_extract(base, r"^([a-z][a-z0-9+.-]*://[^/]+)", 1)
    base_dir = F.regexp_replace(base, r"[^/]*$", "")  # up to last '/'
    base_dir = F.when(
        F.regexp_count(base_dir, F.lit("/")) < F.lit(3), F.concat(scheme_host, F.lit("/"))
    ).otherwise(base_dir)
    return (
        F.when(href.rlike(r"^https?://"), href)
        .when(href.startswith("//"), F.concat(F.lit("http:"), href))
        .when(href.startswith("/"), F.concat(scheme_host, href))
        .when(href.rlike(r"^[a-z][a-z0-9+.-]*:"), F.lit(None).cast("string"))
        .when(href == "", F.lit(None).cast("string"))
        .otherwise(F.concat(base_dir, href))
    )


_EXT_MIME = {
    "html": "text/html", "htm": "text/html", "txt": "text/plain",
    "pdf": "application/pdf", "jpg": "image/jpeg", "png": "image/png",
    "gif": "image/gif", "mp3": "audio/mpeg", "wav": "audio/wav",
    "mp4": "video/mp4", "mkv": "video/x-matroska", "zip": "application/zip",
    "gz": "application/gzip",
}


def mime_type(url: Column) -> Column:
    """Extension -> MIME (the header-less analog of libmagic sniffing,
    extended_attributes_file_processor.py:28-45)."""
    ext = url_extension(url)
    expr = F.lit(None).cast("string")
    for e, m in _EXT_MIME.items():
        expr = F.when(ext == e, F.lit(m)).otherwise(expr)
    return expr


def content_family(mime: Column) -> Column:
    """C3 — mime -> ContentFamily prefix/substring decision tree
    (app/models/path.py:171-208): audio/video/image prefixes, pdf and
    text map to DOCUMENT, archive formats to ARCHIVE, else APPLICATION;
    unknown mime -> null."""
    return (
        F.when(mime.isNull(), F.lit(None).cast("string"))
        .when(mime.startswith("audio"), F.lit("AUDIO"))
        .when(mime.startswith("video"), F.lit("VIDEO"))
        .when(mime.startswith("image"), F.lit("PICTURE"))
        .when(mime.startswith("text") | mime.contains("pdf"), F.lit("DOCUMENT"))
        .when(mime.contains("zip") | mime.contains("gzip"), F.lit("ARCHIVE"))
        .otherwise(F.lit("APPLICATION"))
    )


def format_size(size: Column) -> Column:
    """C9 — human-readable size at 1000 steps (filesize_helper.py:4-41:
    o/Ko/Mo/Go/To) — display-only helper."""
    return (
        F.when(size.isNull(), F.lit(None).cast("string"))
        .when(size < 1000, F.concat(size.cast("long").cast("string"), F.lit(" o")))
        .when(size < 10**6, F.concat(F.round(size / 1e3, 1).cast("string"), F.lit(" Ko")))
        .when(size < 10**9, F.concat(F.round(size / 1e6, 1).cast("string"), F.lit(" Mo")))
        .when(size < 10**12, F.concat(F.round(size / 1e9, 1).cast("string"), F.lit(" Go")))
        .otherwise(F.concat(F.round(size / 1e12, 1).cast("string"), F.lit(" To")))
    )


# ---------------------------------------------------------------------------
# Scalar twins (oracle/simulator code path) — semantics must match the
# Column versions bit-for-bit; unit-tested against each other.

def url_host_py(url: str) -> str:
    m = re.match(r"^[a-z][a-z0-9+.-]*://([^/]+)", url)
    return m.group(1) if m else ""


def url_path_py(url: str) -> str:
    return re.sub(r"^[a-z][a-z0-9+.-]*://[^/]+", "", url)


def url_depth_py(url: str) -> int:
    p = re.sub(r"^/+|/+$", "", url_path_py(url))
    return 0 if p == "" else len(re.split(r"/+", p))


def url_name_py(url: str) -> str:
    return re.sub(r"/+$", "", url_path_py(url)).split("/")[-1]


def url_extension_py(url: str) -> str | None:
    m = re.search(r"\.([A-Za-z0-9_]{1,12})$", url_name_py(url))
    return m.group(1).lower() if m else None


def url_normalize_py(url: str) -> str:
    u = re.sub(r"#.*$", "", url)
    m = re.match(r"^([a-z][a-z0-9+.-]*://[^/]+)", u)
    if not m:
        return u
    head = m.group(1).lower()
    tail = re.sub(r"^[a-z][a-z0-9+.-]*://[^/]+", "", u)
    tail = re.sub(r"/{2,}", "/", tail)
    tail = re.sub(r"/+$", "", tail)
    return head + tail


def url_resolve_py(base: str, href: str) -> str | None:
    if re.match(r"^https?://", href):
        return href
    if href.startswith("//"):
        return "http:" + href
    m = re.match(r"^([a-z][a-z0-9+.-]*://[^/]+)", base)
    scheme_host = m.group(1) if m else ""
    if href.startswith("/"):
        return scheme_host + href
    if re.match(r"^[a-z][a-z0-9+.-]*:", href) or href == "":
        return None
    base_dir = re.sub(r"[^/]*$", "", base)
    if base_dir.count("/") < 3:
        base_dir = scheme_host + "/"
    return base_dir + href


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the Common
    Crawl / Internet Archive canonical form: scheme stripped, host
    lower-cased and dot-reversed with commas, ')' then the path.
    ``http://www.example.com/a/b`` -> ``com,example,www)/a/b``.

    Sorting by this key clusters every URL of a registered domain (and
    its subdomains) adjacently — the locality key CDX indexes and WARC
    shard layouts sort by, and the natural range-partitioning key for
    a 10^10-row frontier (one domain's crawl state lands in one
    partition range instead of scattering by hostname string order).
    Pure codegen: one regex host extract, one split/reverse/join, one
    concat."""
    host = F.lower(url_host(url))
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        url_path(url),
    )


_TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|phpsessid|jsessionid|sessionid)(=|$)"


def canonicalize_url(url: Column) -> Column:
    """Canonical URL form for alias collapse — the normalization tier
    ABOVE url_normalize: fragment stripped, scheme+host lower-cased,
    tracking / session query params removed (utm_*, gclid, fbclid,
    msclkid, *sessionid), and the surviving params BYTE-SORTED so
    param order never splits a page into two frontier rows.

    The production-crawler step between link extraction and URL-seen
    probing: without it, ?utm_source variants of one page each consume
    a fetch slot and a seen-set entry (at 10^10 URLs, tracking-param
    aliases are a double-digit percentage of the raw link stream).
    Everything is one codegen'd projection — regex splits, a
    higher-order ``filter`` on the param array, ``array_sort`` (binary
    collation, engine-shared), ``array_join`` — no Python per row
    (q81's oracle restates it in DuckDB list functions)."""
    nofrag = F.regexp_replace(url, r"#.*$", "")
    head = F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(nofrag, F.length(head) + 1, F.length(nofrag))
    path = F.regexp_replace(rest, r"\?.*$", "")
    query = F.when(
        F.locate("?", rest) > 0, F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    params = F.when(query == "", F.array().cast("array<string>")).otherwise(
        F.split(query, "&")
    )
    kept = F.filter(params, lambda p: ~F.lower(p).rlike(_TRACKING_RE))
    q2 = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        F.lower(head),
        path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )


def canonicalize_url_py(url: str) -> str:
    """Scalar twin of canonicalize_url (simulator / property tests)."""
    nofrag = re.sub(r"#.*$", "", url)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", nofrag)
    head = m.group(1) if m else ""
    rest = nofrag[len(head):]
    path = re.sub(r"\?.*$", "", rest)
    query = re.sub(r"^[^?]*\?", "", rest) if "?" in rest else ""
    params = query.split("&") if query else []
    kept = [p for p in params if not re.match(_TRACKING_RE, p.lower())]
    q2 = "&".join(sorted(kept))
    return head.lower() + path + (("?" + q2) if q2 else "")
