"""Minimal pure-Python PDF text extraction (X12 byte-level decode).

Stands in for pdfjs's ``getTextContent`` (reference
``src/converting.ts:43-76`` iterates pdfjs TextItems per page) in an
environment with no PDF library.  Scope — deliberately the subset the
X12 algorithm needs, not a general PDF renderer:

* classic ``N 0 obj … endobj`` object scanning (no xref table needed,
  robust against mild damage; object streams /ObjStm are NOT parsed),
* page discovery via ``/Type /Page`` objects in document order with
  ``/Contents`` direct or array references,
* content streams raw or ``/FlateDecode`` (zlib),
* text operators: BT/ET, Tf (size), Tm (scale), Td/TD/T*/TL line
  moves, Tj / ' / " / TJ show ops; literal ``(…)`` strings with escape
  sequences and ``<hex>`` strings (byte values, latin-1),
* per show-op items carry ``height`` (Tf size × |Tm d|) and
  ``has_eol`` set on the item that closes a text line (next line move
  or ET) — exactly the fields pdfjs TextItems feed into
  :class:`crawlkit.converters.HeadingLevel` and the line assembler.

Anything outside this subset (CID fonts, encrypted files, object
streams) raises ``PdfParseError`` rather than silently mis-extracting.
"""

from __future__ import annotations

import re
import zlib

from .converters import PdfTextItem


class PdfParseError(ValueError):
    pass


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _scan_objects(data: bytes) -> dict[int, bytes]:
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(3)
    if not objs:
        raise PdfParseError("no PDF objects found")
    return objs


def _object_stream(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if m is None:
        return None
    raw = m.group(1)
    # filter detection must look at the object DICTIONARY only — the
    # stream payload itself may legitimately contain '/FlateDecode'
    header = body.split(b"stream", 1)[0]
    if b"/FlateDecode" in header:
        try:
            return zlib.decompress(raw)
        except zlib.error as e:
            raise PdfParseError(f"bad FlateDecode stream: {e}") from None
    if b"/Filter" in header:
        raise PdfParseError("unsupported stream filter (only FlateDecode)")
    return raw


def _content_refs(page_body: bytes) -> list[int]:
    m = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", page_body)
    if m is None:
        return []
    return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]


def _parse_string(buf: bytes, i: int) -> tuple[str, int]:
    """Literal (…) string starting at buf[i] == '('; returns (text, next)."""
    depth, out = 1, bytearray()
    i += 1
    while i < len(buf) and depth:
        c = buf[i:i + 1]
        if c == b"\\":
            nxt = buf[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():  # octal \ddd
                j = i + 1
                while j < len(buf) and j < i + 4 and buf[j:j + 1].isdigit():
                    j += 1
                out.append(int(buf[i + 1:j], 8) & 0xFF)
                i = j
            else:
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return out.decode("latin-1"), i


def _tokenize(stream: bytes):
    """Yield ('str', text) | ('num', float) | ('op', name) | ('arr', list)."""
    i, n = 0, len(stream)
    while i < n:
        c = stream[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"(":
            s, i = _parse_string(stream, i)
            yield ("str", s)
        elif c == b"<" and stream[i + 1:i + 2] != b"<":
            j = stream.index(b">", i)
            hexs = re.sub(rb"\s", b"", stream[i + 1:j])
            if len(hexs) % 2:
                hexs += b"0"
            yield ("str", bytes.fromhex(hexs.decode("ascii")).decode("latin-1"))
            i = j + 1
        elif c == b"<":  # dict «<<» inside BT is unexpected; skip
            i += 2
        elif c == b"[":
            arr: list = []
            i += 1
            while i < n and stream[i:i + 1] != b"]":
                if stream[i:i + 1] == b"(":
                    s, i = _parse_string(stream, i)
                    arr.append(s)
                elif stream[i:i + 1] == b"<":
                    j = stream.index(b">", i)
                    hexs = re.sub(rb"\s", b"", stream[i + 1:j])
                    if len(hexs) % 2:
                        hexs += b"0"
                    arr.append(bytes.fromhex(hexs.decode("ascii")).decode("latin-1"))
                    i = j + 1
                else:
                    m = _NUM_RE.match(stream, i)
                    if m:
                        arr.append(float(m.group()))
                        i = m.end()
                    else:
                        i += 1
            yield ("arr", arr)
            i += 1
        elif c == b"/":
            m = re.match(rb"/[^\s/\[\]()<>]*", stream[i:])
            yield ("name", m.group().decode("latin-1"))
            i += m.end()
        else:
            m = _NUM_RE.match(stream, i)
            if m:
                yield ("num", float(m.group()))
                i = m.end()
            else:
                m = re.match(rb"[A-Za-z'\"*]+", stream[i:])
                if m:
                    yield ("op", m.group().decode("latin-1"))
                    i += m.end()
                else:
                    i += 1


def _items_of_stream(stream: bytes) -> list[PdfTextItem]:
    """Text items in show order; has_eol marks line ends (pdfjs shape)."""
    items: list[PdfTextItem] = []
    stack: list = []  # operand stack
    size = 0.0  # Tf size
    scale = 1.0  # |Tm d|

    def mark_eol() -> None:
        if items:
            items[-1].has_eol = True

    for kind, val in _tokenize(stream):
        if kind in ("str", "num", "arr", "name"):
            stack.append((kind, val))
            continue
        op = val
        if op == "Tf" and stack and stack[-1][0] == "num":
            size = stack[-1][1]
        elif op == "Tm" and len(stack) >= 6:
            scale = abs(stack[-3][1]) or 1.0  # d component
        elif op in ("Td", "TD", "T*"):
            mark_eol()
        elif op == "ET":
            mark_eol()
        elif op in ("Tj", "'", '"'):
            if op in ("'", '"'):
                mark_eol()  # ' and " move to next line BEFORE showing
            s = next((v for k, v in reversed(stack) if k == "str"), None)
            if s is not None:
                items.append(PdfTextItem(str=s, height=size * scale))
        elif op == "TJ":
            if stack and stack[-1][0] == "arr":
                text = "".join(x for x in stack[-1][1] if isinstance(x, str))
                items.append(PdfTextItem(str=text, height=size * scale))
        stack.clear()
    mark_eol()
    return items


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in READING order: walk the catalog's page
    tree (/Pages → /Kids, depth-first, kid order preserved).  Falls
    back to ascending object number only when no usable tree exists —
    object numbering does not imply reading order in general."""
    is_page = {
        num: re.search(rb"/Type\s*/Page\b(?!s)", b) is not None
        for num, b in objs.items()
    }
    root_ref = None
    for b in objs.values():
        if re.search(rb"/Type\s*/Catalog\b", b):
            m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", b)
            if m:
                root_ref = int(m.group(1))
            break
    ordered: list[int] = []
    seen: set[int] = set()

    def walk(num: int) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        if is_page.get(num):
            ordered.append(num)
            return
        m = re.search(rb"/Kids\s*\[([^\]]*)\]", objs[num])
        if m:
            for kid in _REF_RE.finditer(m.group(1)):
                walk(int(kid.group(1)))

    if root_ref is not None:
        walk(root_ref)
    if not ordered:  # no/broken tree: every /Type /Page, numeric order
        ordered = [n for n in sorted(objs) if is_page.get(n)]
    return ordered


def extract_text_items(body: bytes) -> list[list[PdfTextItem]]:
    """Pages of pdfjs-shaped text items from raw PDF bytes.

    Every parse failure surfaces as :class:`PdfParseError` — internal
    ``ValueError``/``TypeError``/``IndexError`` from malformed input
    (unterminated hex strings, non-octal escapes, non-numeric Tm
    operands, truncated streams) are wrapped so callers see ONE
    uniform failure type for their per-row error contract."""
    if not body.startswith(b"%PDF"):
        raise PdfParseError("not a PDF (missing %PDF header)")
    try:
        objs = _scan_objects(body)
        pages: list[list[PdfTextItem]] = []
        for num in _page_order(objs):
            items: list[PdfTextItem] = []
            for ref in _content_refs(objs[num]):
                target = objs.get(ref)
                if target is None:
                    continue
                stream = _object_stream(target)
                if stream is not None:
                    items.extend(_items_of_stream(stream))
            pages.append(items)
    except PdfParseError:
        raise
    except (ValueError, TypeError, IndexError) as e:
        raise PdfParseError(f"malformed PDF structure: {e}") from None
    if not pages:
        raise PdfParseError("no /Type /Page objects found")
    return pages
