"""Byte-identical extraction contract (BASELINE.json input_hint;
SURVEY.md §5.2.3). The generated corpus IS the golden fixture: for every
page, extract_text(html) must equal the text column byte-for-byte."""

from __future__ import annotations

from glre_spark.datagen import gen_pages
from glre_spark.extract import extract_text


def test_byte_identical_roundtrip_200_docs():
    for row in gen_pages(200):
        got = extract_text(row["html"])
        assert got == row["text"], f"url={row['url']}: {got!r} != {row['text']!r}"


def test_script_containing_closing_p_is_dropped():
    html = (
        b"<html><head><title>t</title></head><body>"
        b'<script>var s = "</p><p>INJECTED";</script>'
        b"<p>Real &amp; only <b>content</b> .</p></body></html>"
    )
    assert extract_text(html) == "Real & only content ."


def test_entities_and_whitespace():
    html = b"<html><body><p>  a\n\tb &lt;c&gt; </p><p>d</p></body></html>"
    assert extract_text(html) == "a b <c> d"


def test_none_and_empty():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"<html><body>no paragraphs</body></html>") == ""


def test_deterministic_generation():
    a = gen_pages(30)
    b = gen_pages(30)
    assert a == b
