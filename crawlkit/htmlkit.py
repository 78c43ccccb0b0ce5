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


class HRoot(HElement):
    """Parse root carrying a document-order tag index built during the
    single parse pass, so ``$(tag)`` lookups (h1/h2/head/a/script — the
    kernel does five per page) are dict reads instead of five full-tree
    DFS walks.  ``remove_all`` keeps the index consistent; removed
    subtrees cannot hide indexed elements because raw-text elements
    (script/style) have no element children."""

    __slots__ = ("tag_index",)

    def __init__(self) -> None:
        super().__init__("#root")
        self.tag_index: dict[str, list[HElement]] = {}


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = HRoot()
        self.stack: list[HElement] = [self.root]
        self._index = self.root.tag_index

    # -- tag handling ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        el = HElement(tag, {k: (v if v is not None else "") for k, v in attrs}
                      if attrs else None)
        parent = self.stack[-1]
        el.parent = parent
        parent.children.append(el)
        bucket = self._index.get(tag)
        if bucket is None:
            self._index[tag] = [el]
        else:
            bucket.append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        el = HElement(tag, {k: (v if v is not None else "") for k, v in attrs}
                      if attrs else None)
        parent = self.stack[-1]
        el.parent = parent
        parent.children.append(el)
        bucket = self._index.get(tag)
        if bucket is None:
            self._index[tag] = [el]
        else:
            bucket.append(el)

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
    """``$(tag)`` — all elements with the tag, in document order.
    O(1) off the parse-time index when ``root`` is the parse root
    (append order during parse IS pre-order document order); DFS for
    arbitrary subtrees."""
    if isinstance(root, HRoot) and root.tag_index is not None:
        return list(root.tag_index.get(tag, ()))
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
    """``$(tag).remove()`` (reference ``src/crawler.ts:73``).

    Safe on ANY subtree, not just the parse root: the owning
    :class:`HRoot` is located via parent pointers and its tag index is
    maintained (raw-text tags: detached elements dropped from the
    bucket) or invalidated (container tags: descendants could be
    orphaned), so a later ``find_all`` on the root can never return a
    detached node."""
    removed: list[HElement] = []
    for el in find_all(root, tag):
        if el.parent is not None:
            el.parent.remove_child(el)
            removed.append(el)
    top = root
    while top.parent is not None:
        top = top.parent
    if isinstance(top, HRoot) and top.tag_index is not None:
        if tag in RAW_TEXT_ELEMENTS:
            # raw-text elements have no element children — no other
            # index bucket can reference a detached descendant; drop
            # exactly the detached ones (the whole bucket when called
            # on the root itself)
            if top is root:
                top.tag_index.pop(tag, None)
            else:
                gone = {id(e) for e in removed}
                kept = [e for e in top.tag_index.get(tag, ())
                        if id(e) not in gone]
                if kept:
                    top.tag_index[tag] = kept
                else:
                    top.tag_index.pop(tag, None)
        else:
            # removing a container could orphan indexed descendants;
            # invalidate the index so find_all falls back to DFS
            top.tag_index = None


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


def _utf8_len(s: str) -> int:
    """UTF-8 byte length without materializing the bytes for the
    overwhelmingly-common ASCII case."""
    return len(s) if s.isascii() else len(s.encode("utf-8"))


def _escaped_utf8_len(s: str, quote: bool = False) -> int:
    """UTF-8 byte length of ``html.escape(s, quote)`` computed by
    COUNTING, never building the escaped string or its bytes:
    ``&``→``&amp;`` (+4), ``<``→``&lt;``/``>``→``&gt;`` (+3), and with
    ``quote``, ``"``→``&quot;`` and ``'``→``&#x27;`` (+5 each)."""
    n = _utf8_len(s) + 4 * s.count("&") + 3 * s.count("<") + 3 * s.count(">")
    if quote:
        n += 5 * s.count('"') + 5 * s.count("'")
    return n


def outer_html_utf8_len(el: HElement) -> int:
    """UTF-8 byte length of ``outer_html(el)`` WITHOUT building the
    string.  The kernel stores only the serialized-page length
    (reference caps cells at 1 MiB, model.ts:7); serializing a ~300 KB
    DOM into a throwaway string per page was pure memory-bandwidth
    waste — the scaling bottleneck on a shared bus.  Round 3: lengths
    come from C-speed ``str.count`` arithmetic (no escaped-string or
    bytes allocation per node either)."""
    total = 0
    stack: list[HNode] = (
        list(reversed(el.children)) if el.tag == "#root" else [el]
    )
    while stack:
        node = stack.pop()
        if isinstance(node, HText):
            parent = node.parent
            if parent is not None and parent.tag in RAW_TEXT_ELEMENTS:
                total += _utf8_len(node.data)
            else:
                total += _escaped_utf8_len(node.data)
            continue
        e = node  # HElement
        tag_bytes = _utf8_len(e.tag)  # names can be non-ASCII
        total += tag_bytes + 2  # '<tag>'
        for k, v in e.attrs.items():
            total += _utf8_len(k) + 4 + _escaped_utf8_len(v, quote=True)
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
