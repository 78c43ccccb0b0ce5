"""Content converters (reference X10-X14) + the converting-API surface.

Mirrors the reference's MIME-dispatched converter registry
(`/root/reference/src/converting.ts:10-27`) and ``findTitle``
(`/root/reference/src/tiptap.ts:200-220`) re-expressed over the
pure-Python doc tree (``doctree.py``), plus a Spark table surface
(``convert_table``) that runs the registry over an Arrow-batched
DataFrame of bodies — the batch analog of ``POST /v1/converting``
(`/root/reference/src/api.ts:159-190`).

PDF ingestion is fully real: byte-level decode via the pure-Python
subset parser in :mod:`crawlkit.pdfkit` (classic objects, FlateDecode,
BT/ET text operators, page-tree order) feeding the faithful X12
ALGORITHM — per-page font-height histogram → heading levels 1-6, EOL
line assembly, consecutive same-level heading merge
(`/root/reference/src/converting.ts:43-145,172-216`).  Malformed
bodies surface as per-row error rows (``Converted.error``), never as
task-killing exceptions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import cborlite
from .doctree import DeterministicIds, amend_node, parse_html_to_doc

MAX_BODY_BYTES = 1024 * 1024  # reference raw-body limit (src/api.ts:163)


class UnsupportedMediaType(ValueError):
    """X14 default branch: 400 'not implemented: <mime>'."""


# ---------------------------------------------------------------------------
# X10: findTitle

def find_title(doc: dict, level: int) -> str:
    """DFS for the first heading of ``level``; texts of its direct text
    children joined with ' ' (src/tiptap.ts:200-220)."""
    if doc.get("type") == "heading":
        if doc.get("attrs", {}).get("level") == level and doc.get("content"):
            return " ".join(
                c.get("text", "")
                for c in doc["content"]
                if c.get("type") == "text"
            )
    elif doc.get("content"):
        for child in doc["content"]:
            title = find_title(child, level)
            if title != "":
                return title
    return ""


def title_of(doc: dict) -> str:
    """Reference convertingAPI: level 1, fallback level 2
    (src/api.ts:168-171)."""
    return find_title(doc, 1) or find_title(doc, 2)


# ---------------------------------------------------------------------------
# X13: plain text → doc (src/converting.ts:147-170)

def convert_text(body: bytes | str, seed: str = "") -> dict:
    text = body.decode("utf-8") if isinstance(body, bytes) else body
    content = []
    for line in _split_lines(text):
        line = line.strip()
        if not line:
            continue
        content.append(
            {"type": "paragraph", "content": [{"type": "text", "text": line}]}
        )
    return _amend({"type": "doc", "content": content}, seed)


def _split_lines(text: str) -> list[str]:
    # reference split: /\r\n|\r|\n/
    return text.replace("\r\n", "\n").replace("\r", "\n").split("\n")


# ---------------------------------------------------------------------------
# X6+X7 via HTML; X11: markdown → doc

def convert_html(body: bytes | str, seed: str = "") -> dict:
    html = body.decode("utf-8") if isinstance(body, bytes) else body
    return parse_html_to_doc(html, seed=seed)


def convert_markdown(body: bytes | str, seed: str = "") -> dict:
    """Markdown → HTML → doc, the reference shape (marked.parse →
    parseHTML → amend).  Supports the CommonMark constructs the
    reference's tiptap schema renders: ATX headings, paragraphs,
    fenced code, blockquotes, unordered/ordered lists, hr, and inline
    strong/em/code/links/images."""
    md = body.decode("utf-8") if isinstance(body, bytes) else body
    return convert_html(_md_to_html(md), seed=seed)


def _md_inline(s: str) -> str:
    import re

    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    s = re.sub(r"!\[([^\]]*)\]\(([^)\s]+)\)", r'<img src="\2" alt="\1">', s)
    s = re.sub(r"\[([^\]]+)\]\(([^)\s]+)\)", r'<a href="\2">\1</a>', s)
    s = re.sub(r"`([^`]+)`", r"<code>\1</code>", s)
    s = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", s)
    s = re.sub(r"(?<!\*)\*([^*]+)\*(?!\*)", r"<em>\1</em>", s)
    return s


def _md_to_html(md: str) -> str:
    import re

    out: list[str] = []
    lines = _split_lines(md)
    i = 0
    while i < len(lines):
        line = lines[i]
        stripped = line.strip()
        if not stripped:
            i += 1
            continue
        if stripped.startswith("```"):
            code: list[str] = []
            i += 1
            while i < len(lines) and not lines[i].strip().startswith("```"):
                code.append(lines[i])
                i += 1
            i += 1  # closing fence
            esc = "\n".join(code).replace("&", "&amp;").replace("<", "&lt;")
            out.append(f"<pre><code>{esc}</code></pre>")
            continue
        m = re.match(r"^(#{1,6})\s+(.*)$", stripped)
        if m:
            lvl = len(m.group(1))
            out.append(f"<h{lvl}>{_md_inline(m.group(2))}</h{lvl}>")
            i += 1
            continue
        if re.match(r"^(-{3,}|\*{3,}|_{3,})$", stripped):
            out.append("<hr>")
            i += 1
            continue
        if stripped.startswith(">"):
            quote: list[str] = []
            while i < len(lines) and lines[i].strip().startswith(">"):
                quote.append(lines[i].strip()[1:].strip())
                i += 1
            out.append(f"<blockquote><p>{_md_inline(' '.join(quote))}</p></blockquote>")
            continue
        if re.match(r"^[-*+]\s+", stripped):
            items: list[str] = []
            while i < len(lines) and re.match(r"^[-*+]\s+", lines[i].strip()):
                items.append(f"<li><p>{_md_inline(lines[i].strip()[2:])}</p></li>")
                i += 1
            out.append("<ul>" + "".join(items) + "</ul>")
            continue
        if re.match(r"^\d+\.\s+", stripped):
            items = []
            while i < len(lines) and re.match(r"^\d+\.\s+", lines[i].strip()):
                items.append(
                    "<li><p>"
                    + _md_inline(re.sub(r"^\d+\.\s+", "", lines[i].strip()))
                    + "</p></li>"
                )
                i += 1
            out.append("<ol>" + "".join(items) + "</ol>")
            continue
        para: list[str] = [stripped]
        i += 1
        while i < len(lines) and lines[i].strip() and not re.match(
            r"^(#{1,6}\s|```|>|[-*+]\s|\d+\.\s)", lines[i].strip()
        ):
            para.append(lines[i].strip())
            i += 1
        out.append(f"<p>{_md_inline(' '.join(para))}</p>")
    return "".join(out)


# ---------------------------------------------------------------------------
# X12: PDF text items → doc (algorithm of src/converting.ts:43-145)

@dataclass
class PdfTextItem:
    """Pre-parsed analog of pdfjs TextItem (str/height/hasEOL/dir)."""

    str: str | None
    height: float = 0.0
    has_eol: bool = False
    dir: str = "ltr"


class HeadingLevel:
    """Font-height histogram → heading levels (converting.ts:172-216):
    mode height = body text; distinct larger heights, ascending-sorted,
    top 6 kept, then descending = levels 1..6."""

    def __init__(self) -> None:
        self.sample: dict[str, int] = {}
        self.levels: list[float] = []

    def add(self, height: float) -> None:
        key = f"{height - 0.01:.2f}"
        self.sample[key] = self.sample.get(key, 0) + 1

    def finalize(self) -> None:
        if not self.sample:
            return
        keys = sorted(self.sample, key=lambda k: -self.sample[k])
        body = float(keys[0])
        levels = sorted(float(k) for k in keys[1:] if float(k) > body)
        self.levels = sorted(levels[:6], reverse=True)

    def level(self, height: float) -> int:
        for i, h in enumerate(self.levels):
            if height >= h:
                return i + 1
        return 0


def convert_pdf_items(pages: list[list[PdfTextItem]], seed: str = "") -> dict:
    """Faithful X12 line assembly: per-page histogram, EOL-delimited
    lines, ttb newline→space, paragraph vs heading by line max-height,
    consecutive same-level headings merge their text children."""
    content: list[dict] = []
    for items in pages:
        hl = HeadingLevel()
        for it in items:
            if it.height > 0:
                hl.add(it.height)
        hl.finalize()

        texts: list[str] = []
        height = 0.0
        prev: dict | None = None
        for it in items:
            if it.str is None:
                continue
            text = it.str
            if it.dir == "ttb":
                text = text.replace("\n", " ")
            if text != "":
                texts.append(text)
            if it.height > height:
                height = it.height
            if it.has_eol:
                level = hl.level(height)
                joined = {"type": "text", "text": "".join(texts)}
                if level == 0:
                    prev = {"type": "paragraph", "content": [joined]}
                    content.append(prev)
                elif (
                    prev is not None
                    and prev["type"] == "heading"
                    and prev["attrs"]["level"] == level
                ):
                    prev["content"].append(joined)
                else:
                    prev = {
                        "type": "heading",
                        "attrs": {"id": None, "level": level},
                        "content": [joined],
                    }
                    content.append(prev)
                texts = []
                height = 0.0
        if texts:
            content.append(
                {"type": "paragraph",
                 "content": [{"type": "text", "text": "".join(texts)}]}
            )
    return _amend({"type": "doc", "content": content}, seed)


def convert_pdf(body: bytes, seed: str = "") -> dict:
    """X12 end-to-end: raw PDF bytes → text items (pure-Python subset
    parser, :mod:`crawlkit.pdfkit` — classic objects, FlateDecode,
    BT/ET text operators) → the faithful line-assembly algorithm above
    (reference ``src/converting.ts:43-145`` via pdfjs)."""
    from .pdfkit import extract_text_items

    return convert_pdf_items(extract_text_items(body), seed)


# ---------------------------------------------------------------------------
# X14: MIME dispatch (src/converting.ts:10-27)

_CONVERTERS = {
    "text/html": convert_html,
    "text/markdown": convert_markdown,
    "text/x-markdown": convert_markdown,
    "application/pdf": convert_pdf,
    "application/x-pdf": convert_pdf,
    "text/plain": convert_text,
}


def get_converter(mime: str):
    try:
        return _CONVERTERS[mime]
    except KeyError:
        raise UnsupportedMediaType(f"not implemented: {mime}") from None


def _amend(doc: dict, seed: str) -> dict:
    return amend_node(doc, DeterministicIds(seed))


# ---------------------------------------------------------------------------
# converting-API surface (src/api.ts:159-190) + Spark table analog

@dataclass
class Converted:
    title: str
    doc: dict
    content_cbor: bytes = b""
    error: str | None = None


def convert_api(body: bytes, mime: str, seed: str = "") -> Converted:
    if len(body) > MAX_BODY_BYTES:
        return Converted(title="", doc={}, error="body too large")
    try:
        doc = get_converter(mime)(body, seed=seed)
    except (UnsupportedMediaType, NotImplementedError) as ex:
        return Converted(title="", doc={}, error=str(ex))
    except ValueError as ex:
        # per-row error contract: a malformed body (PdfParseError, bad
        # UTF-8, …) must yield an error ROW, not kill the Spark task —
        # the reference API likewise catches converter errors and
        # returns a per-request error (src/api.ts:159-190)
        return Converted(title="", doc={}, error=f"conversion failed: {ex}")
    return Converted(title=title_of(doc), doc=doc,
                     content_cbor=cborlite.dumps(doc))


def convert_table(df, body_col: str = "body", mime_col: str = "mime",
                  id_col: str = "doc_id"):
    """Batch converting API: one Arrow pass, one row per input body →
    (id, title, n_nodes, content_cbor, error)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F, types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("title", T.StringType(), True),
            T.StructField("n_nodes", T.IntegerType(), True),
            T.StructField("content_cbor", T.BinaryType(), True),
            T.StructField("error", T.StringType(), True),
        ]
    )

    def _n_nodes(doc: dict) -> int:
        return 1 + sum(_n_nodes(c) for c in doc.get("content", []) or [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                body = getattr(r, body_col)
                if isinstance(body, str):
                    body = body.encode("utf-8")
                c = convert_api(bytes(body), getattr(r, mime_col),
                                seed=str(getattr(r, id_col)))
                rows.append(
                    {
                        "doc_id": int(getattr(r, id_col)),
                        "title": c.title,
                        "n_nodes": _n_nodes(c.doc) if c.doc else 0,
                        "content_cbor": c.content_cbor or None,
                        "error": c.error,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    from .dedupe import spread

    return spread(df).mapInPandas(run, out_schema)
