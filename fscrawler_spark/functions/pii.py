"""PII masking for web-text corpora — pure JVM-side regex Columns.

Every large public web-text pipeline (C4, Dolma, RefinedWeb, FineWeb)
masks personally-identifiable strings before training: email
addresses, IPv4 addresses, phone numbers.  The reference crawler has
no analog (it indexes filesystem metadata, not page text), so this
module follows the published pipeline recipes instead; it is part of
the LLM-training-data operator family (SURVEY §2.10) alongside
dedup/decontamination.

Design constraints, in order:

1. **Codegen only.** Masking runs over every byte of a 100 TB corpus;
   a Python UDF here would dominate the whole pipeline.  Everything
   below is ``regexp_replace`` / ``regexp_count`` Columns — Catalyst
   fuses the three passes into one WholeStageCodegen projection, no
   shuffle, no Arrow transfer.
2. **Engine-portable patterns.** The correctness oracle (q41) re-runs
   the same masking in DuckDB and compares ``md5`` of the redacted
   text byte-for-byte.  Java regex (Spark) backtracks leftmost-first,
   RE2 (DuckDB) is leftmost-longest; the two agree only when no
   alternation/quantifier choice can produce different match spans.
   All three patterns below are chosen to be deterministic under both
   disciplines: character classes + bounded counted repeats, no
   alternation whose branches can match prefixes of each other, no
   lookaround (RE2 has none), ASCII ``\\d`` in both engines.
3. **Replacement ordering is part of the spec.** Emails are masked
   before IPs and phones so the digits inside ``user123@host`` can
   never be re-matched as a phone fragment; the composed
   ``redact_pii`` fixes the order email -> ipv4 -> phone and tests
   pin it.

The phone pattern is deliberately conservative (E.164-ish: ``+CC``
prefix with separated 3/4-digit groups).  Published pipelines make
the same trade — a greedy "any 7+ digits" pattern destroys dates,
ids, and prices, which is far worse for a training corpus than
missing unformatted numbers.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Patterns shared verbatim by the Spark Columns below and the DuckDB
# oracle SQL (__spark_entry__.py q41) — keep the two in sync through
# these constants only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}[ -]\d{3}[ -]\d{3,4}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def email_count(text: Column) -> Column:
    """Number of email addresses in ``text`` (INT, codegen)."""
    return F.regexp_count(text, F.lit(EMAIL_RE)).cast("int")


def ipv4_count(text: Column) -> Column:
    """Number of dotted-quad IPv4 literals in ``text`` (INT, codegen)."""
    return F.regexp_count(text, F.lit(IPV4_RE)).cast("int")


def phone_count(text: Column) -> Column:
    """Number of E.164-ish phone numbers in ``text`` (INT, codegen).

    Counted on the email-masked text (see ``redact_pii`` ordering) so
    digits inside addresses are never double-counted: callers who
    want counts consistent with the redaction should count on
    ``mask_emails(text)``; this helper does that internally.
    """
    return F.regexp_count(mask_emails(text), F.lit(PHONE_RE)).cast("int")


def mask_emails(text: Column, token: str = EMAIL_TOKEN) -> Column:
    return F.regexp_replace(text, EMAIL_RE, token)


def mask_ipv4(text: Column, token: str = IPV4_TOKEN) -> Column:
    return F.regexp_replace(text, IPV4_RE, token)


def mask_phones(text: Column, token: str = PHONE_TOKEN) -> Column:
    return F.regexp_replace(text, PHONE_RE, token)


def redact_pii(text: Column) -> Column:
    """Mask emails, then IPv4s, then phones — one fused projection.

    The order is normative (module docstring #3).  Composes to a
    single WholeStageCodegen stage; safe to run inline in the crawl's
    extract phase at full-corpus scale.
    """
    return mask_phones(mask_ipv4(mask_emails(text)))
