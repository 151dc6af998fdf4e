"""XML structural chunker semantics."""

from __future__ import annotations

from morphik_core_spark.functions.xml_chunker import chunk_xml, chunk_xml_documents

DOC = b"""<doc>
  <TOC><item>ignore me</item></TOC>
  <Section id="s1"><p>First section body text here.</p></Section>
  <Section id="s2"><p>Second section content.</p></Section>
  <Section id="s3"><p>Third section closes the document.</p></Section>
</doc>"""


def test_preferred_unit_tag_and_links():
    chunks = chunk_xml(DOC)
    assert [c["unit"] for c in chunks] == ["Section"] * 3
    assert chunks[0]["prev"] is None and chunks[0]["next"] == "s2"
    assert chunks[1]["prev"] == "s1" and chunks[1]["next"] == "s3"
    assert chunks[2]["next"] is None
    assert chunks[0]["xml_id"] == "s1"
    assert chunks[0]["source_path"] == "Section[0]"


def test_auto_unit_tag_by_frequency():
    doc = b"<r><meta>m</meta><item>a</item><item>b</item><item>c</item></r>"
    chunks = chunk_xml(doc)
    # 'item' (count 3, within [2,50]) wins over singleton tags
    assert {c["unit"] for c in chunks} == {"item"}


def test_oversized_unit_splits_into_parts():
    body = "".join(f"<p>{'word ' * 30}</p>" for _ in range(10))
    doc = f"<r><Section id='big'>{body}</Section><Section id='s2'><p>small</p></Section>".encode() + b"</r>"
    chunks = chunk_xml(doc, max_tokens=50)
    units = {c["unit"] for c in chunks}
    assert "Section_part" in units  # the big one split
    assert all(len(c["text"].split()) <= 50 for c in chunks if c["unit"] == "Section_part")


def test_leaf_sentence_split():
    text = "This is one. " * 40
    doc = f"<r><Section id='s'>{text}</Section></r>".encode()
    chunks = chunk_xml(doc, max_tokens=20)
    assert all(c["unit"] in ("Section_text", "Section") for c in chunks)
    assert len(chunks) > 1


def test_malformed_xml_fallback():
    chunks = chunk_xml(b"<not <valid xml")
    assert len(chunks) == 1 and chunks[0]["unit"] == "fallback_text"


def test_breadcrumbs_include_ancestry():
    doc = b"<r><chapter name='ch1'><Section id='s1'>text body</Section><Section id='s2'>more body</Section></chapter></r>"
    chunks = chunk_xml(doc)
    assert chunks[0]["breadcrumbs"] == ["chapter#ch1", "Section#s1"]


def test_spark_explode(spark):
    df = spark.createDataFrame([("d1", DOC.decode())], "external_id string, text string")
    out = chunk_xml_documents(df).collect()
    assert len(out) == 3
    assert [r.chunk_number for r in sorted(out, key=lambda r: r.chunk_number)] == [0, 1, 2]
    assert out[0].breadcrumbs == ["Section#s1"]
