"""Encoding-damage scoring and repair: damage-then-repair identity
(single and double, cp1252 and latin-1), the conservative
never-touch-clean-text contract, JVM/Python scorer agreement, and
the screened Spark repair pass."""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.functions.encfix import (
    _cp1252_char,
    encoding_repair,
    fix_mojibake,
    mojibake_score,
    mojibake_score_col,
)


def _damage(s: str) -> str:
    """utf-8 bytes mis-decoded through cp1252 (latin-1 filling the
    holes) — the canonical web mojibake process."""
    return "".join(_cp1252_char(b) for b in s.encode("utf-8"))


SAMPLES = [
    "café déjà vu — naïve ’quotes’ größer",
    "ü ö ä ß é è ê ë",
    "日本語テキスト",
    "mixed ascii with é at the end",
]


def test_single_and_double_damage_repair():
    for orig in SAMPLES:
        once = _damage(orig)
        assert mojibake_score(once) > 0
        fixed, n = fix_mojibake(once)
        assert fixed == orig and n == 1
        twice = _damage(once)
        fixed, n = fix_mojibake(twice)
        assert fixed == orig and n == 2


def test_latin1_damage_repairs_too():
    orig = "résumé — emphasis"
    lat = orig.encode("utf-8").decode("latin-1")
    fixed, _ = fix_mojibake(lat)
    assert fixed == orig


def test_clean_text_never_touched():
    for clean in SAMPLES + ["plain ascii", "", "100% formulae: a<b"]:
        if mojibake_score(clean) != 0:
            continue
        fixed, n = fix_mojibake(clean)
        assert fixed == clean and n == 0


def test_repair_is_conservative_on_unfixable_noise():
    # score > 0 but no exact UTF-8 unwinding exists: must return the
    # input unchanged, not a partial mangling
    noisy = "broken � replacement and stray Ã" + chr(0x85)
    fixed, n = fix_mojibake(noisy)
    assert (fixed, n) == (noisy, 0)


@settings(max_examples=60, deadline=None)
@given(st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FF),
    min_size=1, max_size=40,
))
def test_property_damage_then_repair_identity(orig):
    if mojibake_score(orig) != 0:
        return  # texts that natively look damaged are out of contract
    fixed, _ = fix_mojibake(_damage(orig))
    assert fixed == orig


def test_jvm_and_python_scorers_agree(spark):
    from pyspark.sql import functions as F

    texts = SAMPLES + [_damage(s) for s in SAMPLES] + [
        _damage(_damage(SAMPLES[0])), "plain"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r["i"]: r["s"] for r in df.select(
        "i", mojibake_score_col(F.col("t")).alias("s")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == mojibake_score(t), t


def test_spark_repair_pass(spark):
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)
    rows = [(0, SAMPLES[0]), (1, _damage(SAMPLES[0])),
            (2, _damage(_damage(SAMPLES[1]))), (3, "plain ascii")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in encoding_repair(df).collect()}
    assert out[0]["repair_passes"] == 0
    assert out[0]["text"] == SAMPLES[0]
    assert out[1]["repair_passes"] == 1
    assert out[1]["text"] == SAMPLES[0]
    assert out[1]["score_before"] > 0 and out[1]["score_after"] == 0
    assert out[2]["repair_passes"] == 2
    assert out[2]["text"] == SAMPLES[1]
    assert out[3]["repair_passes"] == 0
