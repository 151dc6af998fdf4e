"""HTML text extraction + MIME routing."""

from __future__ import annotations

from morphik_core_spark.functions.html import extract_html_text

PAGE = b"""<!DOCTYPE html>
<html><head><title>ignored</title><style>body { color: red }</style>
<script>var x = "never index this";</script></head>
<body>
  <h1>Heading</h1>
  <p>First   paragraph with <b>bold</b> and &amp; entity.</p>
  <ul><li>one</li><li>two</li></ul>
  <table><tr><td>a</td><td>b</td></tr></table>
  <noscript>also skipped</noscript>
</body></html>"""


def test_extract_strips_markup_and_scripts():
    text = extract_html_text(PAGE)
    assert "Heading" in text and "First paragraph with bold and & entity." in text
    assert "never index this" not in text and "color: red" not in text
    assert "ignored" not in text  # head content skipped
    assert "also skipped" not in text


def test_block_structure_and_whitespace():
    text = extract_html_text(PAGE)
    lines = text.split("\n")
    assert "one" in lines and "two" in lines  # list items on own lines
    assert "a b" in text  # table cells separated
    assert "\n\n\n" not in text  # blank runs capped


def test_bytes_and_entities():
    assert extract_html_text(b"<p>caf&eacute;</p>") == "café"
    assert extract_html_text("<br>x<br>y") == "x\ny"


def test_html_routing(spark, tmp_path):
    from morphik_core_spark.sources.binary import files_to_raw_docs, read_binary_dir

    d = tmp_path / "drop"
    d.mkdir()
    (d / "page.html").write_bytes(PAGE)
    (d / "plain.txt").write_text("raw <b>text</b> keeps markup")

    rows = {r.filename: r for r in files_to_raw_docs(read_binary_dir(spark, str(d))).collect()}
    assert rows["page.html"].parse_status == "ok"
    assert "never index this" not in rows["page.html"].text
    assert "Heading" in rows["page.html"].text
    # non-html text files still decode raw, markup untouched
    assert rows["plain.txt"].text == "raw <b>text</b> keeps markup"
