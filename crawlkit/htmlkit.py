"""Minimal HTML DOM on top of the stdlib parser.

This is the substrate for the extraction kernel (SURVEY.md §2.9).  The
reference uses cheerio/parse5 (``/root/reference/src/crawler.ts:31-84``);
we only need the subset of DOM semantics that kernel exercises:

* parse → element tree (lenient about stray end tags),
* ``$(tag)``-style document-order tag search,
* cheerio ``.text()`` (concatenated descendant text, entity-decoded,
  no whitespace normalisation),
* ``.parent()``, ``.remove()``, ``.html()`` (inner HTML serialisation).

No third-party parser is available in this environment (no lxml/bs4),
and the parity contract (BASELINE.json ``input_hint``) is defined on the
pinned *text* output of this kernel, so a scoped stdlib DOM is the
right-sized tool.
"""

from __future__ import annotations

from html import escape
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Elements whose raw content the stdlib parser hands us as text; we keep
# the text but callers typically strip the element (X4 script strip).
RAW_TEXT_ELEMENTS = frozenset(("script", "style"))


class HNode:
    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: "HElement | None" = None


class HText(HNode):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"HText({self.data!r})"


class HElement(HNode):
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None) -> None:
        super().__init__()
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list[HNode] = []

    def append(self, node: HNode) -> None:
        node.parent = self
        self.children.append(node)

    def remove_child(self, node: HNode) -> None:
        self.children.remove(node)
        node.parent = None

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"HElement(<{self.tag}> {len(self.children)} children)"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = HElement("#root")
        self.stack: list[HElement] = [self.root]

    # -- tag handling ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        el = HElement(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        el = HElement(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(el)

    def handle_endtag(self, tag: str) -> None:
        # Lenient recovery: close up to the nearest matching open element;
        # ignore end tags that match nothing (parse5-style forgiveness).
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].append(HText(data))


def parse_html(html: str) -> HElement:
    """Parse HTML into a tree rooted at a synthetic ``#root`` element."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# -- query / traversal helpers -----------------------------------------


def iter_elements(root: HElement):
    """Yield elements in document order (pre-order DFS)."""
    stack = [root]
    while stack:
        node = stack.pop()
        if isinstance(node, HElement):
            if node is not root:
                yield node
            stack.extend(reversed(node.children))


def find_all(root: HElement, tag: str) -> list[HElement]:
    """``$(tag)`` — all elements with the tag, in document order."""
    return [el for el in iter_elements(root) if el.tag == tag]


def element_text(node: HNode) -> str:
    """cheerio ``.text()``: concatenated descendant text, verbatim."""
    if isinstance(node, HText):
        return node.data
    parts: list[str] = []
    stack = list(reversed(node.children)) if isinstance(node, HElement) else []
    while stack:
        cur = stack.pop()
        if isinstance(cur, HText):
            parts.append(cur.data)
        else:
            stack.extend(reversed(cur.children))
    return "".join(parts)


def selection_text(elements: list[HElement]) -> str:
    """``getCheerioText`` (reference ``src/crawler.ts:42-47``): each
    element's ``.text().trim()``, joined with a single space."""
    return " ".join(element_text(el).strip() for el in elements)


def unique_parents(elements: list[HElement]) -> list[HElement]:
    """cheerio ``.parent()`` on a selection: unique parents, doc order."""
    seen: dict[int, HElement] = {}
    for el in elements:
        p = el.parent
        if p is not None and id(p) not in seen:
            seen[id(p)] = p
    return list(seen.values())


def remove_all(root: HElement, tag: str) -> None:
    """``$(tag).remove()`` (reference ``src/crawler.ts:73``)."""
    for el in find_all(root, tag):
        if el.parent is not None:
            el.parent.remove_child(el)


# -- serialisation -------------------------------------------------------


def _serialize_into(node: HNode, out: list[str]) -> None:
    if isinstance(node, HText):
        parent = node.parent
        if parent is not None and parent.tag in RAW_TEXT_ELEMENTS:
            out.append(node.data)
        else:
            out.append(escape(node.data, quote=False))
        return
    el = node  # type: ignore[assignment]
    attrs = "".join(
        f' {k}="{escape(v, quote=True)}"' for k, v in el.attrs.items()
    )
    if el.tag in VOID_ELEMENTS:
        out.append(f"<{el.tag}{attrs}>")
        return
    out.append(f"<{el.tag}{attrs}>")
    for child in el.children:
        _serialize_into(child, out)
    out.append(f"</{el.tag}>")


def inner_html(el: HElement) -> str:
    """cheerio ``.html()``: serialisation of the element's children."""
    out: list[str] = []
    for child in el.children:
        _serialize_into(child, out)
    return "".join(out)


def outer_html_utf8_len(el: HElement) -> int:
    """UTF-8 byte length of ``outer_html(el)`` WITHOUT building the
    string.  The kernel stores only the serialized-page length
    (reference caps cells at 1 MiB, model.ts:7); serializing a ~300 KB
    DOM into a throwaway string per page was pure memory-bandwidth
    waste — the scaling bottleneck on a shared bus."""
    total = 0
    stack: list[HNode] = (
        list(reversed(el.children)) if el.tag == "#root" else [el]
    )
    while stack:
        node = stack.pop()
        if isinstance(node, HText):
            parent = node.parent
            if parent is not None and parent.tag in RAW_TEXT_ELEMENTS:
                total += len(node.data.encode("utf-8"))
            else:
                total += len(escape(node.data, quote=False).encode("utf-8"))
            continue
        e = node  # HElement
        tag_bytes = len(e.tag.encode("utf-8"))  # names can be non-ASCII
        total += tag_bytes + 2  # '<tag>'
        for k, v in e.attrs.items():
            total += (len(k.encode("utf-8")) + 4
                      + len(escape(v, quote=True).encode("utf-8")))
        if e.tag in VOID_ELEMENTS:
            continue
        total += tag_bytes + 3  # '</tag>'
        stack.extend(reversed(e.children))
    return total


def outer_html(el: HElement) -> str:
    out: list[str] = []
    if el.tag == "#root":
        for child in el.children:
            _serialize_into(child, out)
    else:
        _serialize_into(el, out)
    return "".join(out)
