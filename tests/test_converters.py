"""Converter surface (X10-X14) + docstore read API tests."""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# X10 findTitle

def test_find_title_levels():
    from crawlkit.converters import find_title, title_of

    doc = {
        "type": "doc",
        "content": [
            {"type": "paragraph", "content": [{"type": "text", "text": "x"}]},
            {"type": "heading", "attrs": {"level": 2},
             "content": [{"type": "text", "text": "Second"},
                         {"type": "text", "text": "Title"}]},
            {"type": "heading", "attrs": {"level": 1},
             "content": [{"type": "text", "text": "First"}]},
        ],
    }
    assert find_title(doc, 1) == "First"
    assert find_title(doc, 2) == "Second Title"  # texts joined with ' '
    assert find_title(doc, 3) == ""
    assert title_of(doc) == "First"
    assert title_of({"type": "doc", "content": doc["content"][:2]}) == "Second Title"


# ---------------------------------------------------------------------------
# X13 plain text

def test_convert_text_paragraph_per_line():
    from crawlkit.converters import convert_text

    doc = convert_text(b"first line\r\n\r\n  second  \rthird\n")
    paras = [n for n in doc["content"] if n["type"] == "paragraph"]
    assert [p["content"][0]["text"] for p in paras] == [
        "first line", "second", "third",
    ]


# ---------------------------------------------------------------------------
# X11 markdown

def test_convert_markdown_structures():
    from crawlkit.converters import convert_markdown, find_title

    md = b"""# The Title

Some *emphasis* and **strong** text with `code`.

- item one
- item two

1. first
2. second

> quoted text

```
raw code
```

[link](https://x.example/p)
"""
    doc = convert_markdown(md, seed="t")
    assert find_title(doc, 1) == "The Title"
    types = [n["type"] for n in doc["content"]]
    assert "heading" in types and "paragraph" in types
    # both md list flavors surface as orderedList: the converter goes
    # md → html → parseHTML (reference convertMarkdown does the same,
    # src/converting.ts:36-41), and the html parse folds ul into
    # orderedList (reference-pipeline quirk, see doctree._block)
    assert "orderedList" in types and "bulletList" not in types
    assert "blockquote" in types
    assert "codeBlock" in types or "code_block" in types


def test_markdown_link_marks_amended():
    from crawlkit.converters import convert_markdown

    doc = convert_markdown(b"[x](https://a.example/)", seed="t")
    para = doc["content"][0]
    text = para["content"][0]
    mark = text["marks"][0]
    # X7 link-mark rewrite: rel + target forced, class dropped
    assert mark["attrs"]["rel"] == "noopener noreferrer"
    assert mark["attrs"]["target"] == "_blank"
    assert "class" not in mark["attrs"]


# ---------------------------------------------------------------------------
# X12 PDF algorithm

def test_heading_level_histogram():
    from crawlkit.converters import HeadingLevel

    hl = HeadingLevel()
    for _ in range(50):
        hl.add(10.0)  # body text mode
    for _ in range(3):
        hl.add(24.0)  # h1
    for _ in range(5):
        hl.add(18.0)  # h2
    hl.finalize()
    assert hl.level(24.0) == 1
    assert hl.level(18.0) == 2
    assert hl.level(10.0) == 0  # body


def test_convert_pdf_items_assembly():
    from crawlkit.converters import PdfTextItem as I, convert_pdf_items, find_title

    body = [I("body text ", 10.0), I("more", 10.0, has_eol=True)]
    page = (
        [I("Big", 24.0), I(" Title", 24.0, has_eol=True)]
        + body * 20
        + [I("Still Title", 24.0, has_eol=True)]  # same level → merges? no: not consecutive
        + [I("tail no eol", 10.0)]
    )
    doc = convert_pdf_items([page], seed="t")
    assert find_title(doc, 1) == "Big Title"
    types = [n["type"] for n in doc["content"]]
    assert types.count("heading") == 2
    assert types[-1] == "paragraph"  # trailing non-EOL text flushed


def test_consecutive_same_level_headings_merge():
    from crawlkit.converters import PdfTextItem as I, convert_pdf_items

    page = [I("body", 10.0, has_eol=True)] * 30 + [
        I("Head A", 20.0, has_eol=True),
        I("Head B", 20.0, has_eol=True),
    ]
    doc = convert_pdf_items([page], seed="t")
    headings = [n for n in doc["content"] if n["type"] == "heading"]
    assert len(headings) == 1
    assert [t["text"] for t in headings[0]["content"]] == ["Head A", "Head B"]


def _build_pdf(compress: bool) -> bytes:
    """Assemble a small 2-page PDF: page 1 has a size-24 title line and
    size-10 body lines (10 = histogram mode → body text), page 2 one
    paragraph; exercises Tf/Td/Tj/TJ/'/Tm, literal + hex strings."""
    import zlib

    c1 = (
        b"BT /F1 24 Tf 72 720 Td (Big Title) Tj "
        b"0 -30 Td /F1 10 Tf (body one ) Tj [(and) ( more)] TJ "
        b"0 -12 Td (body two) Tj "
        b"0 -12 Td (body three \\(escaped\\)) Tj "
        b"0 -12 Td <686578> Tj ET"
    )
    c2 = b"BT /F1 10 Tf 1 0 0 1 72 720 Tm (second page) Tj ET"

    def stream_obj(num: int, data: bytes) -> bytes:
        if compress:
            data = zlib.compress(data)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            head = b"<< /Length %d >>" % len(data)
        return (b"%d 0 obj\n" % num) + head + b"\nstream\n" + data + \
            b"\nendstream\nendobj\n"

    parts = [
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n",
        stream_obj(4, c1),
        b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [6 0 R] >>\nendobj\n",
        stream_obj(6, c2),
        b"%%EOF\n",
    ]
    return b"".join(parts)


@pytest.mark.parametrize("compress", [False, True])
def test_convert_pdf_bytes(compress):
    from crawlkit.converters import convert_pdf, find_title
    from crawlkit.doctree import doc_to_text

    doc = convert_pdf(_build_pdf(compress), seed="t")
    assert find_title(doc, 1) == "Big Title"
    text = doc_to_text(doc)
    assert "body one and more" in text
    assert "body three (escaped)" in text
    assert "hex" in text
    assert "second page" in text
    types = [n["type"] for n in doc["content"]]
    assert types[0] == "heading" and "paragraph" in types


def test_pdf_page_tree_order_and_literal_flatedecode():
    """Pages follow the catalog's /Kids order even when object numbers
    run backwards, and an UNCOMPRESSED stream whose text contains the
    literal '/FlateDecode' is not mis-decompressed."""
    from crawlkit.converters import convert_pdf
    from crawlkit.doctree import doc_to_text

    def stream_obj(num: int, data: bytes) -> bytes:
        return (b"%d 0 obj\n<< /Length %d >>\nstream\n" % (num, len(data))
                + data + b"\nendstream\nendobj\n")

    c_first = b"BT /F1 10 Tf (first page mentions /FlateDecode here) Tj ET"
    c_second = b"BT /F1 10 Tf (second page) Tj ET"
    pdf = b"".join([
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        # kids listed high-number-first: reading order != numeric order
        b"2 0 obj\n<< /Type /Pages /Kids [9 0 R 3 0 R] /Count 2 >>\nendobj\n",
        b"9 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 10 0 R >>\nendobj\n",
        stream_obj(10, c_first),
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n",
        stream_obj(4, c_second),
        b"%%EOF\n",
    ])
    text = doc_to_text(convert_pdf(pdf, seed="t"))
    first = text.index("first page mentions /FlateDecode")
    assert first < text.index("second page")  # /Kids order respected


def test_convert_pdf_rejects_non_pdf():
    from crawlkit.converters import convert_pdf
    from crawlkit.pdfkit import PdfParseError

    with pytest.raises(PdfParseError):
        convert_pdf(b"not a pdf at all")
    with pytest.raises(PdfParseError):
        convert_pdf(b"%PDF-1.4 truncated garbage")


MALFORMED_PDFS = [
    # HTML error page served as application/pdf (fails the %PDF header)
    b"<html><body><h1>502 Bad Gateway</h1></body></html>",
    # unterminated hex string in a content stream (bytes.index ValueError)
    b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
    b"4 0 obj\n<< /Length 30 >>\nstream\nBT /F1 10 Tf <deadbee Tj ET\nendstream\nendobj\n",
    # non-hex chars inside a hex string (bytes.fromhex ValueError)
    b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
    b"4 0 obj\n<< /Length 30 >>\nstream\nBT /F1 10 Tf <zzqq> Tj ET\nendstream\nendobj\n",
    # \9 escape: isdigit but not octal (int(x, 8) ValueError)
    b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
    b"4 0 obj\n<< /Length 30 >>\nstream\nBT /F1 10 Tf (bad\\9esc) Tj ET\nendstream\nendobj\n",
]


@pytest.mark.parametrize("body", MALFORMED_PDFS)
def test_malformed_pdf_is_per_row_error_not_task_death(body):
    """ADVICE r2: any malformed application/pdf body must come back as
    Converted(error=...) — a uniform PdfParseError inside pdfkit, caught
    by convert_api — never an unhandled exception that would kill a
    whole Spark task in convert_table."""
    from crawlkit.converters import convert_api
    from crawlkit.pdfkit import PdfParseError, extract_text_items

    with pytest.raises(PdfParseError):
        extract_text_items(body)
    out = convert_api(body, "application/pdf")
    assert out.error is not None and out.doc == {}


def test_convert_table_malformed_pdf_row(spark):
    """End-to-end through the Arrow batch path: the bad-PDF row yields
    an error row; the good rows still convert."""
    from crawlkit.converters import convert_table

    df = spark.createDataFrame(
        [(1, b"<html>502</html>", "application/pdf"),
         (2, b"fine text", "text/plain")],
        "doc_id long, body binary, mime string",
    )
    out = convert_table(df).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "error"].startswith("conversion failed")
    assert out.loc[2, "error"] is None and out.loc[2, "n_nodes"] > 1


# ---------------------------------------------------------------------------
# X14 dispatch + API

def test_mime_dispatch():
    from crawlkit.converters import (UnsupportedMediaType, convert_api,
                                     get_converter)

    assert get_converter("text/plain").__name__ == "convert_text"
    assert get_converter("text/markdown").__name__ == "convert_markdown"
    assert get_converter("text/x-markdown").__name__ == "convert_markdown"
    assert get_converter("text/html").__name__ == "convert_html"
    with pytest.raises(UnsupportedMediaType):
        get_converter("application/json")
    out = convert_api(b"# T\n\nbody", "text/markdown")
    assert out.title == "T" and out.error is None and out.content_cbor
    big = convert_api(b"x" * (1024 * 1024 + 1), "text/plain")
    assert big.error == "body too large"


def test_convert_api_cbor_roundtrip():
    from crawlkit import cborlite
    from crawlkit.converters import convert_api

    out = convert_api(b"hello\nworld", "text/plain")
    assert cborlite.loads(out.content_cbor) == out.doc


def test_convert_table_spark(spark):
    from crawlkit.converters import convert_table

    df = spark.createDataFrame(
        [(1, "# Title\n\npara", "text/markdown"),
         (2, "line one\nline two", "text/plain"),
         (3, "<h1>H</h1><p>b</p>", "text/html"),
         (4, "data", "application/octet-stream")],
        ["doc_id", "body", "mime"],
    )
    out = convert_table(df).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "title"] == "Title"
    assert out.loc[2, "error"] is None and out.loc[2, "n_nodes"] > 1
    assert out.loc[3, "title"] == "H"
    assert out.loc[4, "error"].startswith("not implemented")


# ---------------------------------------------------------------------------
# docstore

def test_docstore_lookups(spark):
    import datetime as dt

    from crawlkit import docstore

    rows = [
        (b"\x01" * 12, "https://a.example/p", "a", "https://a.example/p",
         "T1", {"k": "v"}, b"c1", "<p>x</p>", 10,
         dt.datetime(2024, 1, 1)),
        (b"\x02" * 12, "https://a.example/p", "a", "https://a.example/p",
         "T2", {"k": "v"}, b"c2", "<p>y</p>", 11,
         dt.datetime(2024, 1, 2)),
        (b"\x03" * 12, "https://b.example/p", "b", "https://b.example/p",
         None, None, None, None, None, dt.datetime(2024, 1, 3)),
    ]
    results = spark.createDataFrame(
        rows,
        "id binary, url string, src string, url_canon string, title string,"
        "meta map<string,string>, content binary, html string,"
        "page_len long, fetched_ts timestamp",
    )
    basic = docstore.lookup_by_id(results, b"\x01" * 12, "basic")
    assert basic.columns == ["id", "url", "src", "title", "meta"]
    assert basic.count() == 1
    full = docstore.lookup_by_id(results, b"\x02" * 12, "full").collect()[0]
    assert full.page_len == 11
    with pytest.raises(ValueError):
        docstore.select_output(results, "nope")

    latest = docstore.find_latest(results, "https://a.example/p").collect()
    assert len(latest) == 1 and latest[0].title == "T2"  # newest id wins
    # untitled url → no row (reference returns null doc)
    assert docstore.find_latest(results, "https://b.example/p").count() == 0

    per_url = docstore.latest_per_url(results).toPandas()
    assert len(per_url) == 1 and per_url.iloc[0].title == "T2"


def test_find_latest_deterministic_past_100_versions(spark):
    """find_latest orders by id BEFORE the 100-row fan-out cap, so with
    >100 versions of one url the answer is partition-layout invariant:
    the newest titled row among the 100 newest ids (the 10 newest rows
    here are untitled, so row 11-from-top wins)."""
    import datetime as dt

    from crawlkit import docstore

    url = "https://v.example/p"
    rows = []
    for i in range(150):
        doc_id = i.to_bytes(4, "big") + b"\x00" * 8  # byte-comparable
        title = None if i >= 140 else f"T{i}"
        rows.append((doc_id, url, url, url, title,
                     dt.datetime(2026, 1, 1) + dt.timedelta(minutes=i)))
    df = spark.createDataFrame(
        rows, "id binary, url string, src string, url_canon string,"
        "title string, fetched_ts timestamp",
    )
    expect = (139).to_bytes(4, "big") + b"\x00" * 8
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts, layout in [("1", 1), ("8", 7), ("32", 13)]:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            got = docstore.find_latest(df.repartition(layout), url).collect()
            assert len(got) == 1 and bytes(got[0].id) == expect, parts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
