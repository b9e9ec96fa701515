"""E9 golden tests — the reference's own table-rendering cases
(/root/reference/tests/test_table_rendering.py semantics, asserted on the
same properties) plus exact-GFM goldens for our canonical output."""

from __future__ import annotations

from pdf_craft_spark.operators.tables import render_table_content


def test_simple_table_converts_to_gfm():
    html = (
        "<table>"
        "<thead><tr><th>Name</th><th>Age</th><th>City</th></tr></thead>"
        "<tbody>"
        "<tr><td>Alice</td><td>25</td><td>NYC</td></tr>"
        "<tr><td>Bob</td><td>30</td><td>LA</td></tr>"
        "</tbody>"
        "</table>"
    )
    result = render_table_content(html)
    assert result == (
        "| Name | Age | City |\n"
        "| --- | --- | --- |\n"
        "| Alice | 25 | NYC |\n"
        "| Bob | 30 | LA |"
    )


def test_colspan_preserves_html():
    html = (
        "<table>"
        '<thead><tr><th colspan="2">Personal Info</th><th>Location</th></tr></thead>'
        "<tbody><tr><td>Alice</td><td>25</td><td>NYC</td></tr></tbody>"
        "</table>"
    )
    result = render_table_content(html)
    assert "<table>" in result and 'colspan="2"' in result


def test_rowspan_preserves_html():
    html = (
        "<table><tbody>"
        '<tr><td rowspan="2">Alice</td><td>Email</td><td>a@x.com</td></tr>'
        "<tr><td>Phone</td><td>123</td></tr>"
        "</tbody></table>"
    )
    result = render_table_content(html)
    assert "<table>" in result and 'rowspan="2"' in result


def test_colspan_1_converts():
    html = (
        "<table>"
        '<tr><th colspan="1">Header A</th><th>Header B</th></tr>'
        "<tr><td>Cell 1</td><td>Cell 2</td></tr>"
        "</table>"
    )
    result = render_table_content(html)
    assert "|" in result and "---" in result and "<table>" not in result


def test_multiple_tbody_preserves_html():
    html = (
        "<table>"
        "<tbody><tr><td>Group 1</td></tr></tbody>"
        "<tbody><tr><td>Group 2</td></tr></tbody>"
        "</table>"
    )
    result = render_table_content(html)
    assert "<table>" in result and "<tbody>" in result


def test_alignment_attributes_convert():
    html = (
        "<table><thead><tr>"
        '<th align="left">Left</th><th align="center">Center</th>'
        "</tr></thead>"
        '<tbody><tr><td align="left">L1</td><td align="center">C1</td></tr></tbody>'
        "</table>"
    )
    result = render_table_content(html)
    assert "|" in result and "---" in result and "Left" in result
    assert "<table>" not in result


def test_empty_table():
    assert render_table_content("<table></table>") is not None


def test_no_thead_converts():
    html = (
        "<table><tr><td>Cell 1</td><td>Cell 2</td></tr>"
        "<tr><td>Cell 3</td><td>Cell 4</td></tr></table>"
    )
    result = render_table_content(html)
    assert "|" in result and "---" in result and "<table>" not in result


def test_nested_formatting():
    html = (
        "<table><thead><tr><th>Name</th><th>Status</th></tr></thead>"
        "<tbody><tr><td><strong>Alice</strong></td><td><em>Active</em></td></tr>"
        "</tbody></table>"
    )
    result = render_table_content(html)
    assert "**Alice**" in result and "*Active*" in result
    assert "<table>" not in result


def test_colspan_and_rowspan_preserves_html():
    html = (
        "<table>"
        '<tr><th colspan="2" rowspan="2">Complex</th><th>Normal</th></tr>'
        "<tr><td>Cell</td></tr></table>"
    )
    result = render_table_content(html)
    assert "<table>" in result and 'colspan="2"' in result and 'rowspan="2"' in result


def test_entities_unescaped():
    html = (
        "<table><tr><th>Symbol</th><th>Meaning</th></tr>"
        "<tr><td>&lt;</td><td>Less than</td></tr></table>"
    )
    result = render_table_content(html)
    assert "| < | Less than |" in result


def test_br_in_cells():
    html = "<table><tr><td>Line 1<br />Line 2</td><td>Cell 2</td></tr></table>"
    result = render_table_content(html)
    assert "Line 1 Line 2" in result


def test_invalid_colspan_preserves_html():
    html = (
        '<table><tr><th colspan="invalid">Header</th></tr>'
        "<tr><td>Cell</td></tr></table>"
    )
    result = render_table_content(html)
    assert "<table>" in result


def test_nested_table_preserves_html():
    html = (
        "<table><tr><td><table><tr><td>inner</td></tr></table></td></tr></table>"
    )
    result = render_table_content(html)
    assert result == html


def test_ragged_rows_padded():
    html = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
    assert render_table_content(html) == (
        "| a | b |\n| --- | --- |\n| c |  |"
    )
