"""SVG parsing (operators/svg) — geometry, text runs, and the
executable-content security triage."""

import pytest

from bigdata_invoice_stream_analysis_spark.operators.svg import (
    parse_svg,
    svg_image_profile,
)

CLEAN = (
    '<?xml version="1.0"?>\n'
    '<svg xmlns="http://www.w3.org/2000/svg" width="120" '
    'height="80.5" viewBox="0 0 240 161">'
    '<rect x="1" y="1" width="10" height="10"/>'
    '<text>Hello &amp; label</text>'
    '<text><tspan>nested run</tspan></text></svg>'
)

ATTACK = (
    '<svg onload="fetch(\'//evil.example/x\')" width="10" height="10">'
    "<script>alert(1)</script>"
    '<foreignObject><body xmlns="http://www.w3.org/1999/xhtml">'
    "</body></foreignObject>"
    '<image href="https://tracker.example/p.png"/>'
    '<image href="data:image/png;base64,AAAA"/></svg>'
)


def test_geometry_and_viewbox():
    m = parse_svg(CLEAN)
    assert m["width"] == 120.0
    assert m["height"] == 80.5
    assert m["unit"] == "px"
    assert (m["viewbox_width"], m["viewbox_height"]) == (240.0, 161.0)


def test_unit_lengths():
    m = parse_svg('<svg width="21cm" height="29.7cm"></svg>')
    assert (m["width"], m["height"]) == (21.0, 29.7)
    assert m["unit"] == "cm"
    # percentages fall back to viewBox-only geometry
    m = parse_svg('<svg width="100%" viewBox="0 0 64 32"></svg>')
    assert m["width"] == 100.0 and m["unit"] == "%"
    assert m["viewbox_width"] == 64.0


def test_text_runs_entity_decoded():
    m = parse_svg(CLEAN)
    assert "Hello & label" in m["text"]
    assert "nested run" in m["text"]


def test_clean_svg_not_risky():
    m = parse_svg(CLEAN)
    assert not m["svg_risky"]
    assert m["n_scripts"] == 0
    assert m["n_event_handlers"] == 0


def test_attack_svg_counters():
    m = parse_svg(ATTACK)
    assert m["n_scripts"] == 1
    assert m["n_event_handlers"] == 1      # onload on the root
    assert m["has_foreign_object"]
    # only href/src attributes count; the //evil.example inside the
    # onload JS string is already covered by the handler counter
    assert m["n_external_refs"] == 1
    assert m["n_data_uris"] == 1
    assert m["svg_risky"]


def test_no_root_raises():
    with pytest.raises(ValueError, match="no <svg> root"):
        parse_svg('<?xml version="1.0"?><html></html>')


def test_bad_viewbox_raises():
    with pytest.raises(ValueError, match="viewBox"):
        parse_svg('<svg viewBox="0 0 1"></svg>')
    with pytest.raises(ValueError, match="non-numeric"):
        parse_svg('<svg viewBox="0 0 a b"></svg>')


def test_event_handler_in_plain_text_not_counted():
    # 'OnLoad=' needs to be an ATTRIBUTE (space + quote follows);
    # prose mentioning onload= without quotes must not count
    m = parse_svg('<svg><text>set onload= later</text></svg>')
    assert m["n_event_handlers"] == 0


def test_profile_operator(spark):
    files = spark.createDataFrame(
        [(0, CLEAN), (1, ATTACK), (2, "<html>not svg</html>")],
        "file_id long, text string",
    )
    rows = {r["file_id"]: r
            for r in svg_image_profile(files).collect()}
    assert rows[0]["ok"] and not rows[0]["svg_risky"]
    assert rows[0]["width"] == 120.0
    assert rows[1]["svg_risky"] and rows[1]["n_scripts"] == 1
    assert not rows[2]["ok"]
    plan = svg_image_profile(files)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
