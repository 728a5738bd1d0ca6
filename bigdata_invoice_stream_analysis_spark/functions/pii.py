"""PII detection and redaction as pure Column algebra.

A release-gating pipeline scans every document for personally
identifying information before text ships into a training corpus.
At 100 TB this must be a map-side, whole-stage-codegen pass — so
every detector here is JVM regex + higher-order-function algebra on
Columns; there is no Python in the hot path (the plan contains no
PythonUDF node, pinned by tests/test_pii.py).

Detectors (deliberately conservative, precision-leaning):

* **email** — RFC-5322-lite mailbox shapes.
* **ipv4** — dotted quads with octet range enforced IN the regex
  (``999.1.1.1`` is not an address and does not count).
* **phone** — E.164 international (``+`` then 8-15 digits) and
  NANP ``(212) 555-0199`` / ``212-555-0199`` shapes.
* **ssn** — the ``ddd-dd-dddd`` grouping.
* **payment cards** — 13-19 digit runs (spaces/hyphens allowed)
  validated with the REAL Luhn checksum, computed JVM-side with
  ``aggregate`` over the reversed digit sequence. ``n_card_valid``
  counts only Luhn-passing numbers; ``n_card_candidates`` counts
  every card-shaped run (redaction removes all of them — a privacy
  gate over-redacts rather than leaking a typo'd card number).

``redact_pii`` replaces matches with typed placeholders
(``<EMAIL>``, ``<CC>``, ``<SSN>``, ``<PHONE>``, ``<IP>``) in an
order that prevents partial overlaps (cards before phones: a card
run contains phone-shaped substrings, never vice versa). Redaction
is idempotent — placeholders contain no redactable shapes.

Reference: n/a (extension surface — the reference engine has no
text-privacy operators; this is part of the LLM-training-data
layer, see SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex (JVM-side) patterns. Kept as plain strings so the
# DuckDB twins in docs/tests can quote the same literals.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
IPV4_RE = rf"\b(?:{IPV4_OCTET}\.){{3}}{IPV4_OCTET}\b"
PHONE_RE = (
    r"\+[1-9][0-9]{7,14}\b"                       # E.164
    r"|\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b"  # NANP shapes
)
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
CARD_RE = r"\b(?:[0-9][ -]?){12,18}[0-9]\b"


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) over a digits-only string,
    entirely in expression algebra: walk the reversed digit
    sequence, double every second digit, fold 10..18 back to 1..9,
    and require the sum ≡ 0 (mod 10). NULL-safe: empty input is
    invalid, not an error."""
    rev = F.reverse(digits)
    idx = F.sequence(F.lit(1), F.length(rev))
    total = F.aggregate(
        idx,
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            i % 2 == 0,
            # doubled digit, 10-18 → 1-9 (i.e. 2d - 9)
            F.when(
                F.substring(rev, i, 1).cast("int") * 2 > 9,
                F.substring(rev, i, 1).cast("int") * 2 - 9,
            ).otherwise(F.substring(rev, i, 1).cast("int") * 2),
        ).otherwise(F.substring(rev, i, 1).cast("int")),
    )
    return (F.length(digits) >= 13) & (F.length(digits) <= 19) & (
        total % 10 == 0
    )


def card_counts(col: Column) -> tuple[Column, Column]:
    """(n_card_candidates, n_card_valid) for card-shaped digit runs
    in ``col`` — candidates via one regexp_extract_all, validity via
    the Luhn fold applied inside a ``filter`` lambda (still zero
    Python)."""
    cands = F.regexp_extract_all(col, F.lit(CARD_RE), F.lit(0))
    clean = F.transform(
        cands, lambda c: F.regexp_replace(c, "[^0-9]", "")
    )
    valid = F.filter(clean, luhn_valid)
    return F.size(cands), F.size(valid)


def pii_counts(col: Column) -> dict[str, Column]:
    """All detector counts for one text Column, as a dict of named
    Columns (callers pick what to project). NULL text counts as
    empty — a missing document has zero detector hits, not NULL
    flags (the release gate must not emit NULL verdicts)."""
    col = F.coalesce(col, F.lit(""))
    n_cand, n_valid = card_counts(col)
    return {
        "n_emails": _count(col, EMAIL_RE),
        "n_ipv4": _count(col, IPV4_RE),
        "n_phones": _count(col, PHONE_RE),
        "n_ssn": _count(col, SSN_RE),
        "n_card_candidates": n_cand,
        "n_card_valid": n_valid,
    }


def redact_pii(col: Column) -> Column:
    """Typed-placeholder redaction. Order matters and is fixed:
    emails first (their local parts may contain digits), then card
    runs (which contain phone/SSN-shaped substrings), then SSN,
    phone, IPv4. Idempotent by construction."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, CARD_RE, "<CC>")
    out = F.regexp_replace(out, SSN_RE, "<SSN>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return out


def pii_audit(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Audit projection: the input DataFrame plus per-document
    detector counts, ``has_pii``, and the redacted text. One
    map-side pass, whole-stage codegen, zero shuffles — the shape
    that runs right before corpus export at 100 TB."""
    col = F.col(text_col)
    counts = pii_counts(col)
    out = df
    for name, c in counts.items():
        out = out.withColumn(name, c)
    has = None
    for name in counts:
        c = F.col(name) > 0
        has = c if has is None else (has | c)
    return out.withColumn("has_pii", has).withColumn(
        "redacted", redact_pii(col)
    )
