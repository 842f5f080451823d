"""PathFilter chain as Catalyst predicates (SURVEY §2.2)."""

from fscrawler_spark.filters.builders import (  # noqa: F401
    AndFilter,
    DateFilter,
    DepthFilter,
    ExtensionFilter,
    FilePatternFilter,
    FilterSpec,
    NameFilter,
    NotFilter,
    OrFilter,
    PatternFilter,
    RegexPatternFilter,
    SizeFilter,
    and_all,
    build_filter,
    build_filters,
    or_any,
)
