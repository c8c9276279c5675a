"""Main-content extraction over node arrays.

Three strip modes (BASELINE.json north_star: "text-density and tag-class
boilerplate-strip heuristics"):

* ``none``    — full-DOM textContent (dom.ts:419-434 semantics). This is the
  byte-identical contract mode: output equals the reference's
  ``domRoot.textContent`` for the same document.
* ``basic``   — tag-class strip only: drops DROP_TAGS subtrees, then
  textContent of what remains.
* ``density`` — tag-class strip + text-block segmentation (nearest block
  ancestor, inline set mirrored from the reference formatter's block/inline
  split, formatter.ts:87-89) scored by trimmed length and link density
  (jusText/Boilerpipe-family heuristic, deterministic and configurable).

Every mode also returns source spans: (start, end) char offsets into the
parsed text for each emitted text/CDATA node, so downstream consumers can
trace extracted content back into the raw page bytes.
"""

from __future__ import annotations

from .chars import trim, unescape_entities
from .dom import CDATA, ELEMENT, TEXT, DocBuilder

__all__ = ["DROP_TAGS", "INLINE_TAGS", "BOOST_TAGS", "ExtractResult",
           "extract", "validate_spans"]

# subtrees that never contribute main content
DROP_TAGS = frozenset([
    "script", "style", "noscript", "template", "iframe", "nav", "header",
    "footer", "aside", "form", "button", "select", "option", "optgroup",
    "datalist", "object", "applet", "embed", "svg", "math", "head", "menu",
])

# the reference formatter's inline set (formatter.ts:87-89); everything else
# is treated as a block boundary
INLINE_TAGS = frozenset([
    "a", "abbr", "acronym", "b", "basefont", "bdo", "big", "br", "cite",
    "code", "dfn", "em", "font", "i", "img", "input", "kbd", "label", "q",
    "s", "samp", "select", "small", "span", "strike", "strong", "sub", "sup",
    "text", "tt", "u", "var",
])

# content-bearing tags that keep even short blocks
BOOST_TAGS = frozenset([
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "blockquote", "pre",
    "td", "th", "article", "main", "caption", "figcaption", "dd", "dt",
    "title",
])

_MIN_BLOCK_CHARS = 25
_MAX_LINK_DENSITY = 1.0 / 3.0


class ExtractResult:
    __slots__ = ("text", "spans", "kept_blocks", "total_blocks", "node_count",
                 "text_node_count")

    def __init__(self, text, spans, kept_blocks, total_blocks, node_count,
                 text_node_count):
        self.text = text
        self.spans = spans
        self.kept_blocks = kept_blocks
        self.total_blocks = total_blocks
        self.node_count = node_count
        self.text_node_count = text_node_count


def _decoded(b: DocBuilder, node: int) -> str:
    c = b.content[node]
    if b.kind[node] == TEXT and b.poss_ent[node] and "&" in c:
        return unescape_entities(c)
    return c


def _collect_spans(b: DocBuilder, node: int, spans: list) -> None:
    from .dom import N_CHILDREN, N_KIND, N_SRC_END, N_SRC_START
    nodes = b.nodes
    stack = list(reversed(nodes[node][N_CHILDREN] or []))
    while stack:
        child = stack.pop()
        nd = nodes[child]
        k = nd[N_KIND]
        if k == TEXT or k == CDATA:
            if nd[N_SRC_START] >= 0:
                spans.append((nd[N_SRC_START], nd[N_SRC_END]))
        elif k == ELEMENT and nd[N_CHILDREN]:
            stack.extend(reversed(nd[N_CHILDREN]))


def validate_spans(b: DocBuilder, source: str) -> tuple[int, bool]:
    """Span-integrity check for the extraction contract: every TEXT span
    must slice ``source`` to exactly the bytes whose entity-decode is the
    node's text contribution; CDATA spans cover the full markup (``<![
    CDATA[...]]>`` wrapper included) and must contain the content; spans
    are in-bounds and start-monotone in document order.

    Returns (n_spans_checked, all_ok).
    """
    from .dom import N_CHILDREN, N_CONTENT, N_KIND, N_SRC_END, N_SRC_START
    nodes = b.nodes
    n_src = len(source)
    count = 0
    last_start = -1
    stack = list(reversed(nodes[0][N_CHILDREN] or []))
    while stack:
        child = stack.pop()
        nd = nodes[child]
        k = nd[N_KIND]
        if k == TEXT or k == CDATA:
            s, e = nd[N_SRC_START], nd[N_SRC_END]
            if s < 0:
                continue  # synthesized node (no source region)
            count += 1
            if not (0 <= s <= e <= n_src) or s < last_start:
                return count, False
            last_start = s
            piece = source[s:e]
            if k == TEXT:
                if piece != nd[N_CONTENT]:
                    return count, False
            elif nd[N_CONTENT] not in piece:
                return count, False
        elif k == ELEMENT and nd[N_CHILDREN]:
            stack.extend(reversed(nd[N_CHILDREN]))
    return count, True


def _text_content_skipping(b: DocBuilder, node: int, out: list, spans: list) -> None:
    from .dom import N_CHILDREN, N_KIND, N_SRC_END, N_SRC_START, N_TAG_LC
    nodes = b.nodes
    stack = list(reversed(nodes[node][N_CHILDREN] or []))
    while stack:
        child = stack.pop()
        nd = nodes[child]
        k = nd[N_KIND]
        if k == TEXT or k == CDATA:
            out.append(_decoded(b, child))
            if nd[N_SRC_START] >= 0:
                spans.append((nd[N_SRC_START], nd[N_SRC_END]))
        elif k == ELEMENT and nd[N_TAG_LC] not in DROP_TAGS and nd[N_CHILDREN]:
            stack.extend(reversed(nd[N_CHILDREN]))


def extract(b: DocBuilder, strip: str = "density",
            min_block_chars: int = _MIN_BLOCK_CHARS,
            max_link_density: float = _MAX_LINK_DENSITY) -> ExtractResult:
    node_count = len(b.nodes) - 1
    # C-level count: one list comp + two list.count passes beats a Python
    # genexpr over the node lists (N_KIND == 0)
    kinds = [nd[0] for nd in b.nodes]
    text_node_count = kinds.count(TEXT) + kinds.count(CDATA)

    if strip == "none":
        spans: list = []
        text = b.text_content(0)
        _collect_spans(b, 0, spans)
        return ExtractResult(text, spans, 0, 0, node_count, text_node_count)

    if strip == "basic":
        out: list = []
        spans = []
        _text_content_skipping(b, 0, out, spans)
        return ExtractResult("".join(out), spans, 0, 0, node_count, text_node_count)

    if strip != "density":
        raise ValueError(f"unknown strip mode {strip!r}")

    # --- density mode: group text nodes into blocks by nearest block ancestor
    from .dom import (
        N_CHILDREN, N_CONTENT, N_KIND, N_POSS_ENT, N_SRC_END, N_SRC_START,
        N_TAG_LC,
    )
    nodes = b.nodes
    # blocks are [tag, parts, spans, link_chars] lists (cheaper than dicts)
    blocks: list[list] = []
    # iterative DFS carrying (node, block_key, in_link); a new block starts
    # whenever we enter a non-inline element
    stack = [(0, -1, False)]
    current_block_of: dict[int, list] = {}
    get_block = current_block_of.get
    drop_tags = DROP_TAGS
    inline_tags = INLINE_TAGS

    while stack:
        node, block_owner, in_link = stack.pop()
        nd = nodes[node]
        k = nd[N_KIND]
        if k == TEXT or k == CDATA:
            piece = nd[N_CONTENT]
            if k == TEXT and nd[N_POSS_ENT] and "&" in piece:
                piece = unescape_entities(piece)
            blk = get_block(block_owner)
            if blk is None:
                owner_tag = nodes[block_owner][N_TAG_LC] if block_owner >= 0 else ""
                blk = [owner_tag, [], [], 0]
                current_block_of[block_owner] = blk
                blocks.append(blk)
            blk[1].append(piece)
            if nd[N_SRC_START] >= 0:
                blk[2].append((nd[N_SRC_START], nd[N_SRC_END]))
            if in_link:
                blk[3] += len(trim(piece))
            continue
        if k != ELEMENT:
            continue
        tag = nd[N_TAG_LC]
        if node != 0 and tag in drop_tags:
            continue
        if node != 0 and tag in inline_tags:
            child_owner = block_owner
            child_link = in_link or tag == "a"
        else:
            # entering a block element (or the root) interrupts the enclosing
            # block's open text run
            current_block_of.pop(block_owner, None)
            child_owner = node
            child_link = in_link
        children = nd[N_CHILDREN]
        if children:
            for child in reversed(children):
                stack.append((child, child_owner, child_link))

    kept_parts: list[str] = []
    kept_spans: list = []
    kept = 0
    total = 0
    for owner_tag, parts, spans, link_chars in blocks:
        visible = trim("".join(parts))
        if not visible:
            continue
        total += 1
        chars = len(visible)
        link_density = link_chars / chars if chars else 1.0
        if link_density > max_link_density:
            continue
        if chars >= min_block_chars or owner_tag in BOOST_TAGS:
            kept += 1
            kept_parts.append(visible)
            kept_spans.extend(spans)

    text = "\n\n".join(kept_parts)
    return ExtractResult(text, kept_spans, kept, total, node_count, text_node_count)
