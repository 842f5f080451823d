"""PII masking (functions/pii.py): byte-exact vs a Python ``re``
reference, mask ordering, count semantics, and the codegen-only plan
guarantee (no Python eval, no shuffle)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions import pii

# The Python-re reference applies the same patterns in the same
# normative order.  ``re`` is a backtracking engine like Java regex;
# the module docstring's determinism argument is what makes this also
# predict the RE2/DuckDB result (checked end-to-end by the q41 oracle).


def _ref_redact(s: str) -> str:
    s = re.sub(pii.EMAIL_RE, pii.EMAIL_TOKEN, s)
    s = re.sub(pii.IPV4_RE, pii.IPV4_TOKEN, s)
    s = re.sub(pii.PHONE_RE, pii.PHONE_TOKEN, s)
    return s


CASES = [
    "plain text with no pii at all",
    "mail me at first.last+tag@sub.example.co.uk today",
    "user123@example.com then +1 555 0100 calls",      # digits in email != phone
    "a@b.co trailing dot a@b.com. and a@b.comX runs",
    "server at 10.0.0.7, bad 1234.1.1.1, chain 1.2.3.4.5",
    "+49 172 3456 ok, +1 555 01008392 too long, raw 5550100 ignored",
    "edge +1 555 0100",                                # phone at end of string
    "dates 2024-01-02 and prices 1,555 000 survive",
    "",
]


def test_redact_matches_python_re(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i long, t string")
    got = {
        r["i"]: r["red"]
        for r in df.select("i", pii.redact_pii(F.col("t")).alias("red")).collect()
    }
    for i, s in enumerate(CASES):
        assert got[i] == _ref_redact(s), f"case {i}: {s!r}"


def test_counts_match_python_re(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i long, t string")
    got = {
        r["i"]: (r["e"], r["ip"], r["ph"])
        for r in df.select(
            "i",
            pii.email_count(F.col("t")).alias("e"),
            pii.ipv4_count(F.col("t")).alias("ip"),
            pii.phone_count(F.col("t")).alias("ph"),
        ).collect()
    }
    for i, s in enumerate(CASES):
        masked = re.sub(pii.EMAIL_RE, pii.EMAIL_TOKEN, s)
        want = (
            len(re.findall(pii.EMAIL_RE, s)),
            len(re.findall(pii.IPV4_RE, s)),
            len(re.findall(pii.PHONE_RE, masked)),
        )
        assert got[i] == want, f"case {i}: {s!r}"


def test_mask_order_email_before_phone(spark):
    # The digits of an email's local part must never surface as a
    # phone fragment; ordering is normative (pii.py docstring #3).
    s = "+15551234567user@x.io"  # email local part starts with +digits
    df = spark.createDataFrame([(s,)], "t string")
    out = df.select(pii.redact_pii(F.col("t")).alias("r")).first()["r"]
    assert out == _ref_redact(s)
    assert "<EMAIL>" in out and "<PHONE>" not in out


def test_redact_plan_is_codegen_only(spark, tmp_path):
    p = str(tmp_path / "d.parquet")
    spark.createDataFrame([(1, "a@b.co x 1.2.3.4")], "k long, t string").write.parquet(p)
    out = spark.read.parquet(p).select(pii.redact_pii(F.col("t")).alias("r"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_text_redacts_to_null(spark):
    df = spark.createDataFrame([(1, None)], "k long, t string")
    assert df.select(pii.redact_pii(F.col("t")).alias("r")).first()["r"] is None
