"""Deterministic Arc90/readability-style main-content extraction.

Pure function ``extract_main_text(html: bytes) -> ExtractResult``; no I/O,
no randomness, no global state — the same bytes always produce the same
text, so the distributed stage (an actor pool running this per batch) is
byte-identical to this oracle per url, which is the conformance invariant
(BASELINE.json input_hint).

Validity rules mirror the reference loader (textalyzer/src/file_utils.rs:
134-144): a NUL byte => binary => dropped; invalid UTF-8 => dropped. The
extractor itself is new capability (the reference analyzes plain text
only); the heuristics are the published Arc90/readability family:

1. parse HTML into a light DOM (stdlib ``html.parser``, tolerant of
   unclosed tags),
2. remove non-content subtrees (script/style/nav/header/footer/aside/...),
3. score every candidate container by text mass discounted by link
   density (anchor text), with a bonus for semantic tags
   (article/main) and a penalty for list-like containers,
4. emit the best candidate's block-level text: one line per block element
   (<p>, <h1>..<h6>, <li>, <pre>, <blockquote>, direct text runs),
   whitespace-normalized, joined with "\\n".

Ties break on document order (earliest wins) so extraction is total and
deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

# Subtrees that never contribute content.
STRIP_TAGS = frozenset(
    {
        "script",
        "style",
        "noscript",
        "template",
        "nav",
        "header",
        "footer",
        "aside",
        "form",
        "iframe",
        "svg",
        "button",
        "select",
        "option",
        "head",
    }
)

# Containers eligible to be "the main content block".
CANDIDATE_TAGS = frozenset({"div", "article", "main", "section", "td", "body"})

# Block-level elements that become one output line each.
BLOCK_TAGS = frozenset(
    {
        "p",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "li",
        "pre",
        "blockquote",
        "dt",
        "dd",
        "figcaption",
        "caption",
    }
)

# Elements that close implicitly (HTML void elements).
VOID_TAGS = frozenset(
    {
        "area",
        "base",
        "br",
        "col",
        "embed",
        "hr",
        "img",
        "input",
        "link",
        "meta",
        "source",
        "track",
        "wbr",
    }
)

SEMANTIC_BONUS = {"article": 1.25, "main": 1.25, "body": 0.75, "td": 0.9}


@dataclass
class _Node:
    tag: str  # "" for the synthetic root, "#text" for text
    attrs: dict[str, str] = field(default_factory=dict)
    children: list["_Node"] = field(default_factory=list)
    text: str = ""  # only for "#text" nodes
    order: int = 0  # document order for deterministic tie-breaks


class _DomBuilder(HTMLParser):
    """Builds a lenient DOM tree; mismatched end tags are ignored."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node(tag="")
        self._stack = [self.root]
        self._order = 0

    def _push_child(self, node: _Node) -> None:
        self._order += 1
        node.order = self._order
        self._stack[-1].children.append(node)

    def handle_starttag(self, tag: str, attrs) -> None:
        node = _Node(tag=tag, attrs={k: (v or "") for k, v in attrs})
        self._push_child(node)
        if tag not in VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._push_child(_Node(tag=tag, attrs={k: (v or "") for k, v in attrs}))

    def handle_endtag(self, tag: str) -> None:
        # Close the nearest matching open tag; ignore strays.
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self._push_child(_Node(tag="#text", text=data))


def _normalize_ws(s: str) -> str:
    """Collapse whitespace runs to single spaces and trim (what a browser
    renders for normal flow content)."""
    return " ".join(s.split())


def _collect_text(node: _Node, *, in_pre: bool = False) -> str:
    """All descendant text (excluding stripped subtrees)."""
    if node.tag == "#text":
        return node.text
    if node.tag in STRIP_TAGS:
        return ""
    pre = in_pre or node.tag == "pre"
    parts = [_collect_text(c, in_pre=pre) for c in node.children]
    return "".join(parts)


def _link_text_len(node: _Node, *, in_link: bool = False) -> int:
    """Total normalized text length inside <a> descendants."""
    if node.tag == "#text":
        return len(_normalize_ws(node.text)) if in_link else 0
    if node.tag in STRIP_TAGS:
        return 0
    link = in_link or node.tag == "a"
    return sum(_link_text_len(c, in_link=link) for c in node.children)


def _iter_candidates(node: _Node):
    if node.tag in CANDIDATE_TAGS:
        yield node
    if node.tag not in STRIP_TAGS:
        for c in node.children:
            yield from _iter_candidates(c)


def _annotate_lengths(node: _Node, in_link: bool = False) -> tuple[int, int]:
    """One bottom-up pass computing (normalized_text_len, link_text_len)
    per node, cached on the node — candidates are nested, and scoring
    each via a fresh subtree walk is O(depth) passes over the same text
    (measured as the extractor's hot spot)."""
    if node.tag == "#text":
        n = len(_normalize_ws(node.text))
        return n, n if in_link else 0
    if node.tag in STRIP_TAGS:
        node._text_len = 0  # type: ignore[attr-defined]
        node._link_len = 0  # type: ignore[attr-defined]
        return 0, 0
    link = in_link or node.tag == "a"
    # NB: per-child normalized lengths summed != normalized length of
    # concatenation when whitespace spans children; the scorer only
    # ranks candidates, so the (tiny, consistent) difference is
    # irrelevant — ranking inputs are computed identically for every
    # candidate, and emission still renders exact text.
    t = 0
    l = 0
    for c in node.children:
        ct, cl = _annotate_lengths(c, link)
        t += ct
        l += cl
    node._text_len = t  # type: ignore[attr-defined]
    node._link_len = l  # type: ignore[attr-defined]
    return t, l


def score_candidate(node: _Node) -> float:
    """Arc90-style: text mass discounted by link density, weighted by
    tag. Requires ``_annotate_lengths`` to have run over the tree; falls
    back to a direct walk when scoring a detached node."""
    text_len = getattr(node, "_text_len", None)
    if text_len is None:
        text_len = len(_normalize_ws(_collect_text(node)))
        link_len = _link_text_len(node)
    else:
        link_len = node._link_len  # type: ignore[attr-defined]
    if text_len == 0:
        return 0.0
    link_len = min(link_len, text_len)
    link_density = link_len / text_len
    weight = SEMANTIC_BONUS.get(node.tag, 1.0)
    return text_len * (1.0 - link_density) * weight


def _emit_blocks(node: _Node, out: list[str]) -> None:
    """Render a candidate subtree to output lines: one line per block
    element; consecutive inline/text content between blocks is merged into
    its own line."""
    pending: list[str] = []

    def flush() -> None:
        if pending:
            line = _normalize_ws("".join(pending))
            pending.clear()
            if line:
                out.append(line)

    for child in node.children:
        if child.tag == "#text":
            pending.append(child.text)
        elif child.tag in STRIP_TAGS:
            continue
        elif child.tag == "pre":
            flush()
            raw = _collect_text(child, in_pre=True)
            for line in raw.split("\n"):
                if line.strip():
                    out.append(line)
        elif child.tag in BLOCK_TAGS:
            flush()
            line = _normalize_ws(_collect_text(child))
            if line:
                out.append(line)
        elif child.tag in CANDIDATE_TAGS or child.tag in ("ul", "ol", "dl", "table", "tr", "tbody", "thead", "figure"):
            flush()
            _emit_blocks(child, out)
        else:  # inline element (a, span, b, i, code, ...)
            pending.append(_collect_text(child))
    flush()


@dataclass
class ExtractResult:
    ok: bool
    text: str  # "" when not ok
    drop_reason: str  # "", "binary", "invalid_utf8", "empty"


import re as _re
from html import unescape as _unescape

# One-pass markup scanner: comments/doctype/CDATA, then tags, else text.
_MARKUP = _re.compile(
    r"<!--.*?(?:-->|$)"          # comment (unterminated swallows rest)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    r"|<![^>]*>"                 # doctype / other declarations
    r"|<\?[^>]*>"                # processing instruction
    r"|</[^a-zA-Z>][^>]*>|</>"   # bogus end tag -> dropped (html.parser)
    # tag name must follow '<' / '</' immediately (html.parser
    # semantics: '< sign' is text, not a tag)
    # attrs: quoted values protect '>' only when they FOLLOW '=' (an
    # attribute value, html.parser attrfind semantics); bare quotes are
    # junk and a '>' inside them ends the tag
    r"|<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)"
    r"((?:=\s*\"[^\"]*\"|=\s*'[^']*'|[^>])*?)(/?)>",
    _re.DOTALL,
)

# elements whose raw content runs to the matching close tag
_RAW_TEXT_TAGS = ("script", "style", "textarea", "title")


def _fast_parse(html_text: str) -> _Node:
    """Regex-scanner DOM build ~5x faster than html.parser for the same
    tree shape (attributes are not parsed — no heuristic reads them).
    Equivalence with the html.parser path is asserted by tests (corpus,
    16 edge cases, markup fuzz); malformed markup falls back to treating
    stray '<' as text, like browsers. Junk-tag corner cases (quotes or
    '/' inside a broken tag, e.g. ``<b'>``) follow HTML5-style recovery
    rather than html.parser's tolerant-tag quirks — real pages do not
    contain them and extraction only needs self-consistency."""
    root = _Node(tag="")
    stack = [root]
    order = 0
    pos = 0
    n = len(html_text)

    def push(node: _Node) -> None:
        nonlocal order
        order += 1
        node.order = order
        stack[-1].children.append(node)

    def add_text(chunk: str) -> None:
        if chunk:
            if "&" in chunk:
                chunk = _unescape(chunk)
            push(_Node(tag="#text", text=chunk))

    while pos < n:
        m = _MARKUP.search(html_text, pos)
        if m is None:
            add_text(html_text[pos:])
            break
        if m.start() > pos:
            add_text(html_text[pos : m.start()])
        pos = m.end()
        tag = m.group(2)
        if tag is None:
            continue  # comment / doctype / PI
        tag = tag.lower()
        closing = m.group(1) == "/"
        self_closing = m.group(4) == "/"
        if closing:
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        node = _Node(tag=tag)
        push(node)
        if self_closing or tag in VOID_TAGS:
            continue
        if tag in _RAW_TEXT_TAGS:
            close = html_text.lower().find(f"</{tag}", pos)
            if close == -1:
                raw = html_text[pos:]
                pos = n
            else:
                raw = html_text[pos:close]
                gt = html_text.find(">", close)
                pos = n if gt == -1 else gt + 1
            if raw:
                node.children.append(_Node(tag="#text", text=raw))
            continue
        stack.append(node)
    return root


def parse_dom(html_text: str, engine: str = "fast") -> _Node:
    if engine == "fast":
        return _fast_parse(html_text)
    builder = _DomBuilder()
    builder.feed(html_text)
    builder.close()
    return builder.root


def extract_main_text(html: bytes) -> ExtractResult:
    """bytes -> deterministic main-content text (see module docstring)."""
    if b"\x00" in html:
        return ExtractResult(False, "", "binary")
    try:
        html_text = html.decode("utf-8")
    except UnicodeDecodeError:
        return ExtractResult(False, "", "invalid_utf8")

    root = parse_dom(html_text)
    _annotate_lengths(root)
    best: _Node | None = None
    best_score = 0.0
    for cand in _iter_candidates(root):
        s = score_candidate(cand)
        # strict > : earliest-in-document wins ties => deterministic
        if s > best_score:
            best, best_score = cand, s

    if best is None:
        # No scoring container (e.g. bare text) — fall back to whole doc.
        text = _normalize_ws(_collect_text(root))
        if not text:
            return ExtractResult(False, "", "empty")
        return ExtractResult(True, text, "")

    lines: list[str] = []
    _emit_blocks(best, lines)
    text = "\n".join(lines)
    if not text:
        return ExtractResult(False, "", "empty")
    return ExtractResult(True, text, "")


_META_NAMES = ("description", "robots")
_META_PROPS = ("og:site_name", "og:title")


def extract_head_meta(html: bytes) -> dict[str, str | None]:
    """Document-head metadata: ``{title, canonical, description,
    robots, og_site_name, og_title}`` (absent tags -> None). Validity
    rules mirror :func:`extract_main_text` (NUL -> binary, invalid
    UTF-8 -> drop): invalid documents return all-None.

    Parsing is attribute-aware, so it runs the html.parser engine —
    but only over the bytes up to ``</head>`` (the head slice; a page
    with no head close tag caps at 64 KiB), so cost is O(head), not
    O(page). First occurrence wins for every field (browser/crawler
    convention); name/property matching is case-insensitive and
    values are entity-unescaped by the parser.

    Reference analogue: none (the reference ingests plain text files,
    textalyzer/src/file_utils.rs); §2.9 extension surface for the
    extraction tier."""
    empty: dict[str, str | None] = {
        "title": None,
        "canonical": None,
        "description": None,
        "robots": None,
        "og_site_name": None,
        "og_title": None,
    }
    if b"\x00" in html:
        return empty
    try:
        text = html.decode("utf-8")
    except UnicodeDecodeError:
        return empty
    low = text.lower()
    cut = low.find("</head>")
    head = text[: cut + 7] if cut != -1 else text[:65536]
    root = parse_dom(head, engine="parser")
    out = dict(empty)

    def walk(node: _Node) -> None:
        for c in node.children:
            tag = c.tag
            if tag == "title" and out["title"] is None:
                out["title"] = _normalize_ws(_collect_text(c))
            elif tag == "link":
                rel = (c.attrs.get("rel") or "").strip().lower()
                if rel == "canonical" and out["canonical"] is None:
                    out["canonical"] = (c.attrs.get("href") or "").strip()
            elif tag == "meta":
                name = (c.attrs.get("name") or "").strip().lower()
                prop = (c.attrs.get("property") or "").strip().lower()
                content = c.attrs.get("content")
                if content is None:
                    continue
                if name in _META_NAMES and out[name] is None:
                    out[name] = content
                elif prop in _META_PROPS:
                    key = prop.replace(":", "_")
                    if out[key] is None:
                        out[key] = content
            walk(c)

    walk(root)
    return out
