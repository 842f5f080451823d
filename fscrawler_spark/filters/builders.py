"""Filter chain — every reference PathFilter as a declarative spec that
renders to BOTH a Catalyst ``Column`` predicate (the engine hot path,
JVM-side, pushed down by Catalyst) and a scalar ``authorize(row)``
(the single-threaded simulator / oracle path).  One parameter set, two
renderings — so engine and oracle can never drift.

Composition semantics preserved from the reference
(SURVEY §2.2; file:line into /root/reference):
  - skip chain = AND with short-circuit, deny prunes the subtree
    (app/crawler/file_system_crawler.py:447-460 — the `break` at :452;
    pruning because recursion at :482-488 is never reached)
  - notify chain = OR, empty chain allows all (:462-468)
  - invert mode selects only filtered-out paths (app/fast_crawler.py:96-113)
  - OrFilter combinator (app/filters/or_filter.py:15-30)

Edge behaviors preserved bit-exactly (tested in tests/test_filters.py):
extension length-cap 12 (extension_filter.py:46-49), PatternFilter
substring-not-glob (path_pattern_filter.py:54-62), regex literal-substring
fallback (path_regex_pattern_filter.py:64), depth "<=0 disables"
(depth_filter.py:30), inclusive size bounds (size_filter.py:33),
missing-date passes (date_filter.py:50-51), no-stat denies size
(size_filter.py:46-49).

Rows seen by ``authorize`` are mappings with keys
``url, size, warc_ts, depth`` (missing keys = null column).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime
from functools import reduce
from typing import Any, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from fscrawler_spark.functions.urls import (
    url_depth,
    url_depth_py,
    url_extension,
    url_extension_py,
    url_name,
    url_name_py,
)

Row = Mapping[str, Any]


class FilterSpec:
    """Base: a predicate over frontier rows. ``column()`` -> Catalyst
    predicate on columns (url, size, warc_ts, depth); ``authorize(row)``
    -> bool, the scalar twin (IFilter.authorize contract,
    app/interfaces/iFilter.py:13-40)."""

    def column(self) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def authorize(self, row: Row) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError


def _depth_of(row: Row) -> int:
    d = row.get("depth")
    return d if d is not None else url_depth_py(row["url"])


@dataclass(frozen=True)
class SizeFilter(FilterSpec):
    """F1 — inclusive min<=size<=max; unknown size denies
    (size_filter.py:33 inclusive bounds; :46-49 no-stat => deny)."""

    min_size: int = 0
    max_size: int = 2**62

    def column(self) -> Column:
        return F.col("size").between(F.lit(self.min_size), F.lit(self.max_size))

    def authorize(self, row: Row) -> bool:
        size = row.get("size")
        return size is not None and self.min_size <= size <= self.max_size


@dataclass(frozen=True)
class DepthFilter(FilterSpec):
    """F2 — deny iff 0 < max_depth < depth; max_depth<=0 disables
    (depth_filter.py:30)."""

    max_depth: int = 0

    def column(self) -> Column:
        if self.max_depth <= 0:
            return F.lit(True)
        d = F.coalesce(F.col("depth"), url_depth(F.col("url")))
        return d <= F.lit(self.max_depth)

    def authorize(self, row: Row) -> bool:
        if self.max_depth <= 0:
            return True
        return _depth_of(row) <= self.max_depth


@dataclass(frozen=True)
class ExtensionFilter(FilterSpec):
    """F3 — ext = lowercase after last dot of final segment, None when no
    dot or candidate >12 chars (extension_filter.py:46-49).  Deny if ext
    in excluded; when authorized nonempty, deny unless ext in it."""

    excluded: frozenset[str] = frozenset()
    authorized: frozenset[str] = frozenset()

    def column(self) -> Column:
        ext = url_extension(F.col("url"))
        pred = F.lit(True)
        if self.excluded:
            pred = pred & ~F.coalesce(ext.isin(*self.excluded), F.lit(False))
        if self.authorized:
            pred = pred & F.coalesce(ext.isin(*self.authorized), F.lit(False))
        return pred

    def authorize(self, row: Row) -> bool:
        ext = url_extension_py(row["url"])
        if self.excluded and ext in self.excluded:
            return False
        if self.authorized and ext not in self.authorized:
            return False
        return True


@dataclass(frozen=True)
class PatternFilter(FilterSpec):
    """F4 — substring containment, NOT glob/regex
    (path_pattern_filter.py:54-62, '"NOT a regex" :18-19')."""

    excluded_pattern: str | None = None
    authorized_pattern: str | None = None

    def column(self) -> Column:
        pred = F.lit(True)
        if self.excluded_pattern:
            pred = pred & ~F.col("url").contains(self.excluded_pattern)
        if self.authorized_pattern:
            pred = pred & F.col("url").contains(self.authorized_pattern)
        return pred

    def authorize(self, row: Row) -> bool:
        url = row["url"]
        if self.excluded_pattern and self.excluded_pattern in url:
            return False
        if self.authorized_pattern and self.authorized_pattern not in url:
            return False
        return True


def _literal_of(pattern: str) -> str:
    # path_regex_pattern_filter.py:64 — the "literal" fallback is the
    # pattern with backslashes removed, matched as a plain substring.
    return pattern.replace("\\", "")


@dataclass(frozen=True)
class RegexPatternFilter(FilterSpec):
    """F5 — compiled regex, case-insensitive by default
    (path_regex_pattern_filter.py:31-34); deny if excluded regex matches
    OR the backslash-stripped literal is a substring (:64); require the
    authorized regex match or literal substring (:68-71)."""

    excluded_pattern: str | None = None
    authorized_pattern: str | None = None
    case_insensitive: bool = True

    def _rx(self, pattern: str) -> str:
        return ("(?i)" if self.case_insensitive else "") + pattern

    def column(self) -> Column:
        url = F.col("url")
        pred = F.lit(True)
        if self.excluded_pattern:
            pred = pred & ~(
                url.rlike(self._rx(self.excluded_pattern))
                | url.contains(_literal_of(self.excluded_pattern))
            )
        if self.authorized_pattern:
            pred = pred & (
                url.rlike(self._rx(self.authorized_pattern))
                | url.contains(_literal_of(self.authorized_pattern))
            )
        return pred

    def authorize(self, row: Row) -> bool:
        url = row["url"]
        flags = re.IGNORECASE if self.case_insensitive else 0
        if self.excluded_pattern:
            if re.search(self.excluded_pattern, url, flags) or _literal_of(
                self.excluded_pattern
            ) in url:
                return False
        if self.authorized_pattern:
            if not (
                re.search(self.authorized_pattern, url, flags)
                or _literal_of(self.authorized_pattern) in url
            ):
                return False
        return True


@dataclass(frozen=True)
class NameFilter(FilterSpec):
    """F6 — exact set membership of the final path segment
    (path_name_ignore_filter.py:29-32)."""

    excluded_names: frozenset[str] = frozenset()

    def column(self) -> Column:
        if not self.excluded_names:
            return F.lit(True)
        return ~F.coalesce(
            url_name(F.col("url")).isin(*self.excluded_names), F.lit(False)
        )

    def authorize(self, row: Row) -> bool:
        return url_name_py(row["url"]) not in self.excluded_names


@dataclass(frozen=True)
class FilePatternFilter(FilterSpec):
    """F7 — PatternFilter applied to leaf-like URLs only; non-leaves
    always pass (file_pattern_filter.py:24-25,34-35 — directories bypass).
    Web analog of "file": the URL has an extension."""

    excluded_pattern: str | None = None
    authorized_pattern: str | None = None

    def _inner(self) -> PatternFilter:
        return PatternFilter(self.excluded_pattern, self.authorized_pattern)

    def column(self) -> Column:
        is_leaf = url_extension(F.col("url")).isNotNull()
        return F.when(is_leaf, self._inner().column()).otherwise(F.lit(True))

    def authorize(self, row: Row) -> bool:
        if url_extension_py(row["url"]) is None:
            return True
        return self._inner().authorize(row)


@dataclass(frozen=True)
class DateFilter(FilterSpec):
    """F8 — deny if warc_ts < min_date or > max_date; missing timestamp
    passes (date_filter.py:50-51 allow-on-missing, :54-62 bounds)."""

    min_date: datetime | None = None
    max_date: datetime | None = None

    def column(self) -> Column:
        ts = F.col("warc_ts")
        pred = F.lit(True)
        if self.min_date is not None:
            pred = pred & (ts >= F.lit(self.min_date))
        if self.max_date is not None:
            pred = pred & (ts <= F.lit(self.max_date))
        return F.coalesce(pred, F.lit(True))

    def authorize(self, row: Row) -> bool:
        ts = row.get("warc_ts")
        if ts is None:
            return True
        if self.min_date is not None and ts < self.min_date:
            return False
        if self.max_date is not None and ts > self.max_date:
            return False
        return True


@dataclass(frozen=True)
class OrFilter(FilterSpec):
    """F9 — any sub-filter authorizes (or_filter.py:27 ``any()``)."""

    filters: tuple[FilterSpec, ...] = ()

    def column(self) -> Column:
        if not self.filters:
            return F.lit(True)
        return reduce(Column.__or__, (f.column() for f in self.filters))

    def authorize(self, row: Row) -> bool:
        return any(f.authorize(row) for f in self.filters) if self.filters else True


@dataclass(frozen=True)
class AndFilter(FilterSpec):
    """Skip-chain conjunction — empty chain allows all
    (file_system_crawler.py:447-460)."""

    filters: tuple[FilterSpec, ...] = ()

    def column(self) -> Column:
        if not self.filters:
            return F.lit(True)
        return reduce(Column.__and__, (f.column() for f in self.filters))

    def authorize(self, row: Row) -> bool:
        return all(f.authorize(row) for f in self.filters)


@dataclass(frozen=True)
class NotFilter(FilterSpec):
    """Invert mode — select only filtered-out paths
    (fast_crawler.py:96-113, flag :109-110)."""

    inner: FilterSpec = field(default_factory=AndFilter)

    def column(self) -> Column:
        # Column three-valued logic: ~null is null which where() drops —
        # matching scalar "not authorize" only if we null-coalesce first.
        return ~F.coalesce(self.inner.column(), F.lit(False))

    def authorize(self, row: Row) -> bool:
        return not self.inner.authorize(row)


def and_all(filters: Sequence[FilterSpec]) -> Column:
    return AndFilter(tuple(filters)).column()


def or_any(filters: Sequence[FilterSpec]) -> Column:
    return OrFilter(tuple(filters)).column()


# ---------------------------------------------------------------------------
# Filter factory — name->builder dispatch, the analog of
# app/helpers/filterFactory.py:12-35 + the YAML config source
# (app/process_files.py:20-64, config.yml).  Accepts plain dicts so the
# same specs load from YAML (if pyyaml is present) or JSON.

_FACTORY: dict[str, type[FilterSpec]] = {
    "SizeFilter": SizeFilter,
    "DepthFilter": DepthFilter,
    "ExtensionFilter": ExtensionFilter,
    "PatternFilter": PatternFilter,
    "RegexPatternFilter": RegexPatternFilter,
    "NameFilter": NameFilter,
    "FilePatternFilter": FilePatternFilter,
    "DateFilter": DateFilter,
}

_SET_FIELDS = {"excluded", "authorized", "excluded_names"}


def build_filter(name: str, args: Mapping[str, Any]) -> FilterSpec:
    if name == "OrFilter":
        return OrFilter(tuple(build_filters(args["filters"])))
    if name == "AndFilter":
        return AndFilter(tuple(build_filters(args["filters"])))
    if name == "NotFilter":
        return NotFilter(build_filter(args["name"], args.get("args", {})))
    cls = _FACTORY.get(name)
    if cls is None:
        raise KeyError(f"unknown filter: {name}")
    kwargs = {
        k: (frozenset(v) if k in _SET_FIELDS else v) for k, v in args.items()
    }
    return cls(**kwargs)


def build_filters(specs: Sequence[Mapping[str, Any]]) -> list[FilterSpec]:
    """[{'name': 'SizeFilter', 'args': {...}}, ...] -> [FilterSpec, ...]"""
    return [build_filter(s["name"], s.get("args", {})) for s in specs]


def load_yaml_filters(path: str) -> list[FilterSpec]:
    """YAML config source (S5).  Schema: {filters: [{name, args}, ...]}."""
    import yaml  # optional dep, present in most Spark images

    with open(path) as fh:
        doc = yaml.safe_load(fh)
    return build_filters(doc.get("filters", []))
