"""Z-order (Morton) layout keys — the multi-dimensional clustering
transform lakehouses use for data skipping (Delta OPTIMIZE ZORDER,
Iceberg's sort-order z-curves): interleaving the bits of two columns
makes one sort order serve range predicates on EITHER column, so a
frontier laid out by zorder(host_bucket, depth) prunes files for
per-host scans AND per-depth scans from the same layout.

The bit spread is the classic mask-doubling sequence; everything is
int64 `& | <<` arithmetic, so the SAME SQL text evaluates identically
on Spark (F.expr) and any ANSI engine with bitwise operators — the
oracle runs the identical string, there is no twin to drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPREAD_STEPS = [
    (8, 16711935),    # 0x00FF00FF
    (4, 252645135),   # 0x0F0F0F0F
    (2, 858993459),   # 0x33333333
    (1, 1431655765),  # 0x55555555
]


def spread16_sql(expr: str) -> str:
    """SQL text spreading the low 16 bits of ``expr`` to even bit
    positions (b15..b0 -> bit 30,28,..,0)."""
    v = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _SPREAD_STEPS:
        v = f"(({v} | ({v} << {shift})) & {mask})"
    return v


def zorder2_sql(x_expr: str, y_expr: str) -> str:
    """SQL text for the 32-bit Morton interleave of two 16-bit values:
    x takes even bits, y odd bits."""
    return f"({spread16_sql(x_expr)} | ({spread16_sql(y_expr)} << 1))"


def zorder2(x_expr: str, y_expr: str) -> Column:
    """The same interleave as a Spark Column (F.expr over the shared
    SQL text — byte-identical semantics to the oracle by construction)."""
    return F.expr(zorder2_sql(x_expr, y_expr))
