"""Unicode integrity audit (functions/unicodesec) — trojan-source
bidi controls, invisibles, controls, replacement/PUA/noncharacters,
mixed-script tokens; Spark and DuckDB twins must agree exactly."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.functions.unicodesec import (
    COUNT_PATTERNS,
    nfc_divergent,
    sql_unicode_integrity_flags,
    strip_invisibles,
    unicode_integrity_flags,
)

TROJAN = 'access_level = "user‮ ⁦// Check if admin⁩ ⁦"'
SAMPLES = [
    ("clean ascii text, nothing to see", {}),
    (TROJAN, {"n_bidi": 4}),
    ("pay​pal.com with‍ joiners﻿",
     {"n_invisible": 3}),
    ("damaged � decode ��",
     {"n_replacement": 3}),
    ("binary paste \x00\x01 bell\x07 del\x7f",
     {"n_control": 4}),
    ("custom glyphs  here",
     {"n_private_use": 2}),
    ("bad sentinel ﷐ and ￿",
     {"n_noncharacter": 2}),
    ("вlog.com is not blog.com, nor is pаypal attack",
     {"n_mixed_script_tokens": 2}),
    # BOTH ω-tokens mix Greek with Latin letters — 2 findings
    ("ω-metric here and ωlatin too",
     {"n_mixed_script_tokens": 2}),
    # supplementary-plane PUA (plane 15): BOTH engines must count
    # the astral code point once (surrogate-pair vs code-point trap)
    ("astral \U000F0001 glyph and bmp  glyph",
     {"n_private_use": 2}),
]


def _counts(text):
    out = dict.fromkeys(COUNT_PATTERNS, 0)
    out.update(SAMPLES_MAP[text])
    return out


SAMPLES_MAP = dict(SAMPLES)


def test_expected_counts_in_spark(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(SAMPLES)],
        "id long, text string")
    flags = unicode_integrity_flags(F.col("text"))
    rows = df.select("text", *[c.alias(n) for n, c in flags.items()]) \
        .collect()
    for r in rows:
        exp = _counts(r["text"])
        for name in COUNT_PATTERNS:
            assert r[name] == exp[name], (r["text"], name, r[name])
        assert r["unicode_clean"] == all(
            v == 0 for v in exp.values())


def test_duckdb_twin_agrees_exactly(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(SAMPLES)],
        "id long, text string")
    flags = unicode_integrity_flags(F.col("text"))
    srows = {r["id"]: r for r in df.select(
        "id", *[c.alias(n) for n, c in flags.items()]).collect()}
    con = duckdb.connect()
    exprs = sql_unicode_integrity_flags("text")
    sel = ", ".join(f"{e} AS {n}" for n, e in exprs.items())
    for i, (t, _) in enumerate(SAMPLES):
        drow = con.execute(
            f"SELECT {sel} FROM (SELECT ? AS text)", [t]
        ).fetchone()
        names = list(exprs)
        for j, name in enumerate(names):
            assert drow[j] == srows[i][name], (t, name)


def test_null_text_is_clean(spark):
    df = spark.createDataFrame([(0, None)], "id long, text string")
    flags = unicode_integrity_flags(F.col("text"))
    r = df.select(*[c.alias(n) for n, c in flags.items()]).first()
    assert r["unicode_clean"] is True
    assert r["n_bidi"] == 0


def test_strip_invisibles_removes_exactly_the_counted_set(spark):
    dirty = "a‮b​c﻿d normal \x07bell"
    df = spark.createDataFrame([(dirty,)], "text string")
    out = df.select(
        strip_invisibles(F.col("text")).alias("fixed")).first()
    # bidi + invisibles gone, control char (quarantine class) kept
    assert out["fixed"] == "abcd normal \x07bell"


def test_stripped_text_passes_bidi_and_invisible_checks(spark):
    df = spark.createDataFrame(
        [(t,) for t, _ in SAMPLES[:4]], "text string")
    flags = unicode_integrity_flags(
        strip_invisibles(F.col("text")))
    rows = df.select(flags["n_bidi"].alias("b"),
                     flags["n_invisible"].alias("i")).collect()
    assert all(r["b"] == 0 and r["i"] == 0 for r in rows)


def test_mixed_script_counts_tokens_not_pairs(spark):
    # one token with three Cyrillic letters is still ONE finding
    df = spark.createDataFrame([("аdмiнistrator",)], "text string")
    flags = unicode_integrity_flags(F.col("text"))
    r = df.select(
        flags["n_mixed_script_tokens"].alias("m")).first()
    assert r["m"] == 1


def test_greek_or_cyrillic_only_text_is_clean(spark):
    df = spark.createDataFrame(
        [("καλημέρα κόσμε",), ("привет мир",)], "text string")
    flags = unicode_integrity_flags(F.col("text"))
    rows = df.select(
        flags["n_mixed_script_tokens"].alias("m"),
        flags["unicode_clean"].alias("c")).collect()
    assert all(r["m"] == 0 and r["c"] for r in rows)


def test_supplementary_private_use_detected(spark):
    df = spark.createDataFrame(
        [("plane15 \U000F0001 glyph",)], "text string")
    flags = unicode_integrity_flags(F.col("text"))
    assert df.select(
        flags["n_private_use"].alias("p")).first()["p"] == 1


def test_nfc_divergence_udf(spark):
    # e + combining acute is NOT NFC; precomposed é is
    df = spark.createDataFrame(
        [(0, "café"), (1, "café"), (2, None)],
        "id long, text string")
    rows = {r["id"]: r["d"] for r in df.select(
        "id", nfc_divergent(F.col("text")).alias("d")).collect()}
    assert rows[0] is True
    assert rows[1] is False
    assert rows[2] is False


def test_plan_stays_jvm_side(spark):
    df = spark.createDataFrame([("x",)], "text string")
    flags = unicode_integrity_flags(F.col("text"))
    plan = df.select(*[c.alias(n) for n, c in flags.items()]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan
    assert "Exchange" not in plan
