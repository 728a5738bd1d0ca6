"""PII detection/redaction (functions/pii.py): JVM Luhn vs a pure-
Python reference, detector counts on adversarial strings, typed
redaction literals, idempotence, and the zero-Python plan pin."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.functions.pii import (
    luhn_valid,
    pii_audit,
    redact_pii,
)


def _luhn_ref(digits: str) -> bool:
    if not 13 <= len(digits) <= 19 or not digits.isdigit():
        return False
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


# Published test numbers (PAN test ranges) + mutated check digits.
KNOWN = [
    ("4111111111111111", True),    # Visa test number
    ("4111111111111112", False),
    ("5500005555555559", True),    # Mastercard test number
    ("5500005555555550", False),
    ("340000000000009", True),     # Amex test number (15 digits)
    ("340000000000008", False),
    ("6011000000000004", True),    # Discover test number
    ("30000000000004", True),      # Diners (14 digits)
    ("123456789012", False),       # 12 digits: too short
    ("12345678901234567890", False),  # 20 digits: too long
]


def test_luhn_known_vectors(spark):
    df = spark.createDataFrame([(d,) for d, _ in KNOWN], "d string")
    got = {
        r["d"]: r["ok"]
        for r in df.select("d", luhn_valid(F.col("d")).alias("ok")).collect()
    }
    for d, expect in KNOWN:
        assert got[d] == expect, d
        assert _luhn_ref(d) == expect, d  # the reference agrees


def test_luhn_sweep_vs_reference(spark):
    import random

    rng = random.Random(0xC0FFEE)
    nums = [
        "".join(rng.choice("0123456789") for _ in range(rng.randint(13, 19)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(d,) for d in nums], "d string")
    got = {
        r["d"]: r["ok"]
        for r in df.select("d", luhn_valid(F.col("d")).alias("ok")).collect()
    }
    for d in nums:
        assert got[d] == _luhn_ref(d), d


CASES = [
    # text, (emails, ipv4, phones, ssn, card_cand, card_valid)
    ("Contact alice@example.com or bob.smith+tag@sub.domain.org",
     (2, 0, 0, 0, 0, 0)),
    ("Server 10.0.0.1 up, 999.1.1.1 is not an address",
     (0, 1, 0, 0, 0, 0)),
    ("Call +14155550123 or (212) 555-0199",
     (0, 0, 2, 0, 0, 0)),
    ("SSN 123-45-6789 on file", (0, 0, 0, 1, 0, 0)),
    ("Pay 4111 1111 1111 1111 or 4111-1111-1111-1112",
     (0, 0, 0, 0, 2, 1)),
    ("No sensitive data here.", (0, 0, 0, 0, 0, 0)),
    # zero-padded octets are not a dotted quad
    ("addr 192.168.001.5", (0, 0, 0, 0, 0, 0)),
]


@pytest.mark.parametrize("text,expect", CASES)
def test_detector_counts(spark, text, expect):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = pii_audit(df).collect()[0]
    got = (row["n_emails"], row["n_ipv4"], row["n_phones"],
           row["n_ssn"], row["n_card_candidates"], row["n_card_valid"])
    assert got == expect, text
    assert row["has_pii"] == (sum(expect) > 0)


REDACT = [
    ("mail alice@example.com now", "mail <EMAIL> now"),
    ("card 4111 1111 1111 1111 ok", "card <CC> ok"),
    ("ssn 123-45-6789 and ip 10.0.0.1", "ssn <SSN> and ip <IP>"),
    ("call (212) 555-0199 pls", "call <PHONE> pls"),
    ("clean text stays", "clean text stays"),
]


@pytest.mark.parametrize("text,expect", REDACT)
def test_redaction_literals(spark, text, expect):
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(redact_pii(F.col("text")).alias("r")).collect()[0]["r"]
    assert got == expect


def test_redaction_idempotent(spark):
    texts = [t for t, _ in REDACT] + [t for t, _ in CASES]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    once = df.select(redact_pii(F.col("text")).alias("r"))
    twice = once.select(redact_pii(F.col("r")).alias("r"))
    assert [r["r"] for r in once.collect()] == [
        r["r"] for r in twice.collect()
    ]


def test_zero_python_plan(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = pii_audit(df)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan
    assert "BatchEvalPython" not in plan


def test_null_text_counts_as_empty(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "mail a@b.co")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in pii_audit(df).collect()}
    assert rows[0]["n_emails"] == 0 and rows[0]["has_pii"] is False
    assert rows[1]["has_pii"] is True
