"""Unit tests for the pure-Python extraction core (SURVEY.md §5 step 1)."""

from __future__ import annotations

import hashlib
import json
import pathlib

import numpy as np
import pytest

from crawlkit import bloom, canon, cborlite
from crawlkit.doctree import (
    DeterministicIds,
    doc_to_html,
    doc_to_text,
    find_title,
    parse_html_to_doc,
)
from crawlkit.extract import extract_document
from crawlkit.htmlkit import element_text, find_all, parse_html, selection_text

GOLDEN = pathlib.Path(__file__).parent / "golden"
SAMPLE = pathlib.Path("/root/reference/sample/doc_page.html")


# -- htmlkit ----------------------------------------------------------------


def test_parse_and_text():
    root = parse_html("<div><p>a <b>b</b> c</p><p>d &amp; e</p></div>")
    ps = find_all(root, "p")
    assert [element_text(p) for p in ps] == ["a b c", "d & e"]
    assert selection_text(ps) == "a b c d & e"


def test_lenient_end_tags():
    root = parse_html("<div><p>x</div></b><p>y</p>")
    assert [element_text(p) for p in find_all(root, "p")] == ["x", "y"]


# -- extraction X1-X5 ---------------------------------------------------------

PAGE = """<html><head>
<meta property="og:title" content=" Override Title ">
<meta property="og:site_name" content="Example ">
<meta property="article:author" content="Ann">
<meta property="twitter:card" content="nope">
<meta name="description" content="nope">
</head><body>
<script>var x = 1 < 2;</script>
<div id="outer"><div id="inner">
<h1>Real Heading</h1>
<p>Body text that is long enough to hold the region at this level, with
  a <a href="https://other.example/x">link</a> and more words.</p>
</div></div>
</body></html>"""


def test_extract_basic():
    doc = extract_document(PAGE, "https://h.example/p")
    assert doc.status == "ok"
    assert doc.title == "Override Title"  # og:title wins, trimmed
    assert doc.meta == {"og:site_name": "Example", "article:author": "Ann"}
    assert "<script>" not in doc.content_html
    assert "Real Heading" in doc.text
    assert doc.links == ["https://other.example/x"]
    # region stayed at the inner div (text ≥ 2× title)
    assert 'id="inner"' not in doc.content_html
    assert "<h1>" in doc.content_html


def test_extract_h2_fallback_and_not_found():
    d2 = extract_document("<div><h2>Only H2</h2><p>xxxx xxxx xxxx</p></div>", "u")
    assert d2.status == "ok" and d2.title == "Only H2"
    d3 = extract_document("<div><p>no headings at all</p></div>", "u")
    assert d3.status == "not_found"


def test_extract_multi_h1_join():
    html = "<div><h1>One</h1><h1> Two </h1><p>body body body body body</p></div>"
    d = extract_document(html, "u")
    assert d.title == "One Two"


def test_region_climb():
    # title parent's text shorter than 2× title → climbs to grandparent
    html = (
        "<div id='g'><div id='p'><h1>A Quite Long Title Here</h1></div>"
        "<p>surrounding content with plenty of additional words to "
        "make the grandparent region long enough for the check</p></div>"
    )
    d = extract_document(html, "u")
    assert "surrounding content" in d.content_html


# -- doctree X6-X10 -----------------------------------------------------------


def test_doc_tree_and_amend():
    doc = parse_html_to_doc(
        "<h1>T</h1><p></p><p><br></p><p>keep <b>bold</b> "
        '<a class="c" href="https://x.example/">lnk</a></p>'
        '<img alt="noimg"><img src="https://img.example/i.png">',
        seed="u1",
    )
    types = [n["type"] for n in doc["content"]]
    assert types == ["heading", "paragraph", "image"]  # empty paragraphs dropped
    para = doc["content"][1]
    link_node = para["content"][-1]
    mark = link_node["marks"][-1]
    assert mark["attrs"]["rel"] == "noopener noreferrer"
    assert mark["attrs"]["target"] == "_blank"
    assert "class" not in mark["attrs"]
    # uid types got 6-char ids, unique
    ids = [doc["content"][0]["attrs"]["id"], para["attrs"]["id"]]
    assert all(len(i) == 6 for i in ids) and len(set(ids)) == 2


def test_deterministic_ids_stable_and_collision_free():
    a = DeterministicIds("seed")
    b = DeterministicIds("seed")
    xs = [a.amend_id("") for _ in range(200)]
    ys = [b.amend_id("") for _ in range(200)]
    assert xs == ys and len(set(xs)) == 200
    c = DeterministicIds("seed")
    c.ids.add(xs[0])  # force collision → regenerates
    assert c.amend_id("") == xs[1]


def test_find_title_levels():
    doc = parse_html_to_doc("<div><h2>Second</h2><h1>First</h1></div>", seed="s")
    assert find_title(doc, 1) == "First"
    assert find_title(doc, 2) == "Second"
    assert find_title(doc, 3) == ""


def test_doc_to_html_roundtrip_shape():
    doc = parse_html_to_doc(
        "<h1>T</h1><ul><li>a</li><li>b</li></ul>"
        "<table><tr><th>h</th><td colspan='2'>d</td></tr></table>",
        seed="s",
    )
    html = doc_to_html(doc)
    assert html.startswith("<h1 id=")
    assert "<ul><li" in html and 'colspan="2"' in html
    # text projection: one line per textblock
    assert doc_to_text(doc) == "T\na\nb\nh\nd"


def test_whitespace_collapse():
    doc = parse_html_to_doc("<p>  a\n   b\t c  </p>", seed="s")
    assert doc_to_text(doc) == "a b c"


# -- cbor ---------------------------------------------------------------------


def test_cbor_roundtrip_and_determinism():
    obj = {
        "type": "doc",
        "content": [{"type": "text", "text": "héllo", "n": 3, "f": 1.5}],
        "b": b"\x00\x01",
        "neg": -42,
        "big": 2**40,
        "none": None,
        "t": True,
    }
    data = cborlite.dumps(obj)
    assert cborlite.loads(data) == obj
    # key order must not matter (canonical map ordering)
    assert cborlite.dumps({"b": 1, "a": 2}) == cborlite.dumps({"a": 2, "b": 1})
    assert cborlite.dumps(0) == b"\x00"
    assert cborlite.dumps(23) == b"\x17"
    assert cborlite.dumps(24) == b"\x18\x18"
    assert cborlite.dumps("a") == b"\x61\x61"


# -- canon --------------------------------------------------------------------


def test_url_validity():
    assert canon.is_valid_url("https://a.example/x")
    assert not canon.is_valid_url("http://a.example/x")
    assert not canon.is_valid_url("ftp://a.example")
    assert not canon.is_valid_url(None)
    assert not canon.is_valid_url("https://")


def test_canonicalization():
    u = "HTTPS://A.Example:443/p?b=2&a=1&utm_source=x#frag"
    c = canon.canonical_url(u)
    assert c == "https://a.example/p?a=1&b=2"
    assert canon.canonical_url(c) == c  # idempotent
    assert canon.canonical_url("https://a.example") == "https://a.example/"
    assert canon.url_host("https://A.example:8443/p") == "a.example"
    assert (
        canon.resolve_link("https://a.example/d/p", "../q") == "https://a.example/q"
    )


# -- bloom --------------------------------------------------------------------


def test_bloom_no_false_negatives_and_merge():
    rng = np.random.default_rng(42)
    items = rng.integers(-(2**63), 2**63 - 1, size=5000, dtype=np.int64)
    bp = bloom.BloomPartition.sized_for(5000, fpp=0.01)
    bp.add(items[:2500])
    other = bloom.BloomPartition(bp.m_bits, bp.k)
    other.add(items[2500:])
    merged = bp.merge(other)
    assert merged.might_contain(items).all()  # no false negatives
    fresh = rng.integers(-(2**63), 2**63 - 1, size=20000, dtype=np.int64)
    fpp = merged.might_contain(fresh).mean()
    assert fpp < 0.05
    # byte round-trip
    rt = bloom.BloomPartition.from_bytes(merged.to_bytes())
    assert rt.k == merged.k and rt.n_items == merged.n_items
    assert rt.might_contain(items).all()


def test_bloom_partitioning_stable():
    h = np.array([-5, -1, 0, 1, 2**62], dtype=np.int64)
    p = bloom.partition_of(h, 8)
    assert p.dtype == np.int32 and (p >= 0).all() and (p < 8).all()
    assert (bloom.partition_of(h, 8) == p).all()


# -- golden parity on the reference sample -----------------------------------


def test_reference_sample_golden():
    """Pin the kernel's output on the reference's real sample page
    (/root/reference/sample/doc_page.html).  The golden file is written
    on first run and asserted byte-identical afterwards."""
    html = SAMPLE.read_text()
    d = extract_document(html, "https://www.rfc-editor.org/rfc/rfc8949.html")
    assert d.status == "ok"
    assert d.title.startswith("RFC 8949")
    digest = {
        "title": d.title,
        "text_sha256": hashlib.sha256(d.text.encode()).hexdigest(),
        "text_len": len(d.text),
        "cbor_sha256": hashlib.sha256(d.content_cbor).hexdigest(),
        "first_lines": d.text.splitlines()[:5],
        "n_links": len(d.links),
    }
    golden_path = GOLDEN / "rfc8949_digest.json"
    if not golden_path.exists():
        golden_path.write_text(json.dumps(digest, indent=2, ensure_ascii=False))
        pytest.skip("golden written on first run")
    assert json.loads(golden_path.read_text()) == digest
