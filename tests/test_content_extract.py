"""Main-content extraction: HTML boilerplate strip + PDF text parse
(operators/content_extract.py)."""

from __future__ import annotations

from indonesian_id_ocr_service_spark.operators import (
    content_extract as CE,
)


def _want(text, min_len=0):
    return "\n".join(p for p in CE.chunk_words(text)
                     if len(p) >= min_len)


def test_html_fixture_roundtrip():
    text = " ".join(f"word{k}" for k in range(57))
    for i in range(6):  # all layout variants (nav widths, ad rails)
        got = CE.extract_main_html(CE.synth_html(i, text))
        assert got == _want(text, 25), i


def test_html_boilerplate_dropped():
    html = ('<html><body>'
            '<ul><li><a href="/">Home</a></li>'
            '<li><a href="/x">Products and more</a></li></ul>'
            '<div><a href="/ad">A very long sponsored advertisement '
            'link block that is all anchor text</a></div>'
            '<p>This paragraph is the real article content that '
            'should absolutely survive extraction.</p>'
            '<p>tiny</p>'
            '<div>Mixed block with a short <a href="/in">inline '
            'link</a> inside a long body paragraph of real text.</div>'
            '<script>ignore("this is not content");</script>'
            '<div><a href="/t">Terms</a> <a href="/p">Privacy</a></div>'
            '</body></html>')
    got = CE.extract_main_html(html)
    lines = got.split("\n")
    assert lines == [
        "This paragraph is the real article content that should "
        "absolutely survive extraction.",
        "Mixed block with a short inline link inside a long body "
        "paragraph of real text.",
    ]


def test_html_entities_and_malformed():
    assert "a & b < c" in CE.extract_main_html(
        "<p>the entity test a &amp; b &lt; c keeps going with many "
        "more words</p>")
    # unclosed tags / garbage must not raise
    assert isinstance(CE.extract_main_html("<div><p>abc <b>def"), str)
    assert CE.extract_main_html("") == ""


def test_pdf_fixture_roundtrip_both_encodings():
    text = " ".join(f"token{k}" for k in range(34))
    raw = CE.synth_pdf(1, text)      # odd: uncompressed stream
    flate = CE.synth_pdf(2, text)    # even: FlateDecode
    assert b"FlateDecode" not in raw and b"FlateDecode" in flate
    assert CE.extract_pdf_text(raw) == _want(text)
    assert CE.extract_pdf_text(flate) == _want(text)


def test_pdf_escapes_and_rejects():
    t = "weird (parens) and \\ backslash plus (nested (x)) end okay"
    assert CE.extract_pdf_text(CE.synth_pdf(2, t)) == _want(t)
    assert CE.extract_pdf_text(b"not a pdf") is None
    assert CE.extract_pdf_text(b"") is None
    # corrupt flate stream degrades to empty, not crash
    pdf = bytearray(CE.synth_pdf(0, t))
    i = pdf.find(b"stream\n") + 7
    pdf[i:i + 8] = b"XXXXXXXX"
    out = CE.extract_pdf_text(bytes(pdf))
    assert out == ""


def test_operators_on_spark(spark):
    import pandas as pd  # noqa: F401

    texts = [(i, " ".join(f"w{i}x{k}" for k in range(25)))
             for i in range(8)]
    html_df = spark.createDataFrame(
        [(i, CE.synth_html(i, t)) for i, t in texts],
        "doc_id long, html string")
    got = {r.doc_id: r.main_text
           for r in CE.html_main_content(html_df).collect()}
    for i, t in texts:
        assert got[i] == _want(t, 25)
    pdf_df = spark.createDataFrame(
        [(i, CE.synth_pdf(i, t)) for i, t in texts]
        + [(99, b"not a pdf")],
        "doc_id long, payload binary")
    rows = {r.doc_id: r.pdf_text for r in CE.pdf_text(pdf_df).collect()}
    assert 99 not in rows
    for i, t in texts:
        assert rows[i] == _want(t)


def test_pdf_stream_data_ending_in_cr():
    """Regression: FlateDecode data whose last byte is 0x0D must not
    lose it to the end-of-line scan before ``endstream`` — /Length
    delimits the data exactly (found live: 4/5000 sf0.1 fixtures)."""
    import zlib

    content = b"BT /F1 12 Tf (crpin) Tj ET " + (15).to_bytes(3, "big")
    c = zlib.compress(content)
    assert c[-1] == 0x0D  # the crafted property this test exists for
    payload = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(c)).encode()
               + b" /Filter /FlateDecode >>\nstream\n" + c
               + b"\nendstream\nendobj\n%%EOF\n")
    assert CE.extract_pdf_text(payload) == "crpin"
    # and the /Length-less fallback still works on clean streams
    raw = b"BT /F1 12 Tf (nolen) Tj ET"
    payload2 = (b"%PDF-1.4\n1 0 obj\n<< /Foo 1 >>\nstream\n" + raw
                + b"\nendstream\nendobj\n")
    assert CE.extract_pdf_text(payload2) == "nolen"
