"""Flat node-array DOM model with HTML5-style error correction.

Behavioral parity target: ``/root/reference/projects/fortissimo-html/src/dom.ts``
and ``src/elements.ts`` — re-expressed as index arrays (no object tree).

Storage: one Python list per node (24 fixed slots, ``N_*`` indices), one
append per node — the hot path allocates a single record instead of fanning
out across parallel lists. Field-view properties (``b.kind[i]`` etc.) keep a
columnar API for tests/format/stylize consumers.

Replicated reference quirks (file:line cites are into the reference):

* elements.ts:2 — the formatting-element set contains the typo ``'u]'``, so
  ``u`` is NOT a formatting element. Kept verbatim-in-behavior.
* dom.ts:692 — unwinding pop requires the matching stack index ``> 0``
  ("No, I really don't want >= 0"): a tag matching only the root sentinel is
  treated as unmatched.
* dom.ts:733-738 — after every pop the open stack is re-parented
  (``node.parent = stack[i-1]``) and the math/svg depth counter is recomputed.
* dom.ts:617/655 — table repair treats EXPLICITLY_CLOSED sections/rows as
  ended and wraps stray ``tr``/``td``/``th`` in *synthetic* nodes that
  serialize to zero bytes (dom.ts:504).
"""

from __future__ import annotations

import re

from .chars import unescape_entities

# --- node kinds --------------------------------------------------------------
ELEMENT = 0
TEXT = 1
COMMENT = 2
DECLARATION = 3
DOCTYPE = 4
PROCESSING = 5
CDATA = 6
UNMATCHED_CLOSE = 7

KIND_NAMES = ["element", "text", "comment", "declaration", "doctype",
              "processing", "cdata", "unmatched_close"]

# --- closure states (dom.ts:12-18) -------------------------------------------
UNCLOSED = 0
SELF_CLOSED = 1
VOID_CLOSED = 2
EXPLICITLY_CLOSED = 3
IMPLICITLY_CLOSED = 4

CLOSURE_NAMES = ["unclosed", "self_closed", "void_closed",
                 "explicitly_closed", "implicitly_closed"]

# pop() sentinels mirroring the reference's undefined/null convention
POP_VOID = object()    # reference: pop(undefined) -> VOID_CLOSED
POP_SELF = object()    # reference: pop(null)      -> SELF_CLOSED

# --- node record slots --------------------------------------------------------
N_KIND = 0
N_TAG = 1
N_TAG_LC = 2
N_PARENT = 3
N_CHILDREN = 4
N_CLOSURE = 5
N_CONTENT = 6
N_TERMINATED = 7
N_POSS_ENT = 8
N_LINE = 9
N_COL = 10
N_END_TAG = 11
N_END_LINE = 12
N_END_COL = 13
N_ATTR_NAMES = 14
N_ATTR_VALUES = 15
N_ATTR_SPACING = 16
N_ATTR_EQUALS = 17
N_ATTR_QUOTES = 18
N_INNER_WS = 19
N_BAD_TERM = 20
N_SYNTHETIC = 21
N_SRC_START = 22
N_SRC_END = 23

# --- element sets (elements.ts) ----------------------------------------------
# 'u]' typo kept on purpose: 'u' is NOT treated as a formatting element.
FORMATTING_ELEMENTS = frozenset([
    "a", "b", "big", "code", "em", "font", "i", "nobr", "s", "small",
    "strike", "strong", "tt", "u]",
])

MARKER_ELEMENTS = frozenset(["applet", "object", "marquee", "template", "td", "th", "caption"])

VOID_ELEMENTS = frozenset([
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link", "meta",
    "param", "source", "track", "wbr", "command", "keygen", "menuitem",
])

NO_ENTITIES_ELEMENTS = frozenset(["script", "style"])

_FORM_TAGS = frozenset(["input", "option", "optgroup", "select", "button", "datalist", "textarea"])
_P_TAG = frozenset(["p"])
_TABLE_SECTION_CLOSERS = frozenset(["thead", "tbody", "caption", "tr", "td", "th"])

OPEN_IMPLIES_CLOSE: dict[str, frozenset[str]] = {
    "tr": frozenset(["tr", "th", "td", "caption"]),
    "th": frozenset(["th", "caption"]),
    "td": frozenset(["thead", "th", "td", "caption"]),
    "body": frozenset(["head", "link", "script"]),
    "li": frozenset(["li"]),
    "p": _P_TAG,
    "h1": _P_TAG, "h2": _P_TAG, "h3": _P_TAG, "h4": _P_TAG, "h5": _P_TAG, "h6": _P_TAG,
    "select": _FORM_TAGS, "input": _FORM_TAGS, "output": _FORM_TAGS,
    "button": _FORM_TAGS, "datalist": _FORM_TAGS, "textarea": _FORM_TAGS,
    "option": frozenset(["option"]),
    "optgroup": frozenset(["optgroup", "option"]),
    "dd": frozenset(["dt", "dd"]), "dt": frozenset(["dt", "dd"]),
    "address": _P_TAG, "article": _P_TAG, "aside": _P_TAG, "blockquote": _P_TAG,
    "details": _P_TAG, "div": _P_TAG, "dl": _P_TAG, "fieldset": _P_TAG,
    "figcaption": _P_TAG, "figure": _P_TAG, "footer": _P_TAG, "form": _P_TAG,
    "header": _P_TAG, "hr": _P_TAG, "main": _P_TAG, "nav": _P_TAG, "ol": _P_TAG,
    "pre": _P_TAG, "section": _P_TAG, "table": _P_TAG, "ul": _P_TAG,
    "rt": frozenset(["rt", "rp"]), "rp": frozenset(["rt", "rp"]),
    "tbody": _TABLE_SECTION_CLOSERS, "tfoot": _TABLE_SECTION_CLOSERS,
}

_RE_SELECTOR = re.compile(r"(.*)\.(.+)")
_RE_CLASS_SPLIT = re.compile(r"\s+")

_RE_DOCTYPE = re.compile(r"^doctype\b", re.I | re.A)
_RE_XHTML = re.compile(r"\bxhtml\b", re.I | re.A)
_RE_VARIETY = re.compile(r"\b(frameset|strict|transitional)\b")
_RE_VERSION = re.compile(r"\bx?html[ \n\r\t\f]*([.\d]+)\b", re.I | re.A)
_RE_HTML5 = re.compile(r"^doctype[ \n\r\t\f]+html[ \n\r\t\f]*$", re.I | re.A)
_RE_EOL_COUNT = re.compile(r"\r\n|\n|\r")


def oq(quote: str) -> str:
    """Opening quotation mark ('_\"' marks an unterminated quote)."""
    return quote if len(quote) < 2 else quote[1:]


def cq(quote: str) -> str:
    """Closing quotation mark (suppressed for unterminated quotes)."""
    return quote if len(quote) < 2 else ""


class _FieldView:
    """Columnar view over one slot of the node records."""

    __slots__ = ("nodes", "f")

    def __init__(self, nodes: list, f: int):
        self.nodes = nodes
        self.f = f

    def __getitem__(self, i: int):
        return self.nodes[i][self.f]

    def __setitem__(self, i: int, value) -> None:
        self.nodes[i][self.f] = value

    def __len__(self) -> int:
        return len(self.nodes)

    def __iter__(self):
        f = self.f
        for node in self.nodes:
            yield node[f]


class DocBuilder:
    """Per-document DOM; node ids index ``self.nodes``.

    Node 0 is the synthetic root (tag ``/``), matching the reference's root
    sentinel (dom.ts:536).
    """

    __slots__ = ("nodes", "open_stack", "in_math_or_svg", "xml_mode",
                 "_views")

    def __init__(self) -> None:
        self.nodes: list[list] = []
        self.open_stack: list[int] = []
        self.in_math_or_svg = 0
        self.xml_mode = False
        self._views: dict[int, _FieldView] = {}

        root = self.new_element("/", 0, 0, synthetic=True)
        self.open_stack.append(root)

    # --- columnar views (API compatibility for tests/format/stylize) -------

    def _view(self, f: int) -> _FieldView:
        view = self._views.get(f)
        if view is None:
            view = self._views[f] = _FieldView(self.nodes, f)
        return view

    kind = property(lambda self: self._view(N_KIND))
    tag = property(lambda self: self._view(N_TAG))
    tag_lc = property(lambda self: self._view(N_TAG_LC))
    parent = property(lambda self: self._view(N_PARENT))
    children = property(lambda self: self._view(N_CHILDREN))
    closure = property(lambda self: self._view(N_CLOSURE))
    content = property(lambda self: self._view(N_CONTENT))
    terminated = property(lambda self: self._view(N_TERMINATED))
    poss_ent = property(lambda self: self._view(N_POSS_ENT))
    line = property(lambda self: self._view(N_LINE))
    col = property(lambda self: self._view(N_COL))
    end_tag = property(lambda self: self._view(N_END_TAG))
    end_line = property(lambda self: self._view(N_END_LINE))
    end_col = property(lambda self: self._view(N_END_COL))
    attr_names = property(lambda self: self._view(N_ATTR_NAMES))
    attr_values = property(lambda self: self._view(N_ATTR_VALUES))
    attr_spacing = property(lambda self: self._view(N_ATTR_SPACING))
    attr_equals = property(lambda self: self._view(N_ATTR_EQUALS))
    attr_quotes = property(lambda self: self._view(N_ATTR_QUOTES))
    inner_ws = property(lambda self: self._view(N_INNER_WS))
    bad_term = property(lambda self: self._view(N_BAD_TERM))
    synthetic = property(lambda self: self._view(N_SYNTHETIC))
    src_start = property(lambda self: self._view(N_SRC_START))
    src_end = property(lambda self: self._view(N_SRC_END))

    # --- node construction ----------------------------------------------

    def new_element(self, tag: str, line: int, col: int, *,
                    case_sensitive: bool = False, synthetic: bool = False,
                    src_start: int = -1) -> int:
        nodes = self.nodes
        idx = len(nodes)
        nodes.append([
            ELEMENT, tag, tag if case_sensitive else tag.lower(), -1, [],
            UNCLOSED, None, True, False, line, col, "", 0, 0,
            [], [], [], [], [], "", None, synthetic, src_start, -1,
        ])
        return idx

    def new_leaf(self, kind: int, content: str, line: int, col: int, *,
                 terminated: bool = True, poss_ent: bool = False,
                 src_start: int = -1, src_end: int = -1) -> int:
        nodes = self.nodes
        idx = len(nodes)
        nodes.append([
            kind, "", "", -1, None,
            UNCLOSED, content, terminated, poss_ent, line, col, "", 0, 0,
            None, None, None, None, None, "", None, False, src_start, src_end,
        ])
        return idx

    # --- fused hot-path constructors (parser-only; semantics identical to
    # new_element+pre_push+add_child+push / new_leaf+add_child) -------------

    def open_element(self, tag: str, line: int, col: int,
                     case_sensitive: bool = False, src_start: int = -1) -> int:
        nodes = self.nodes
        idx = len(nodes)
        tag_lc = tag if case_sensitive else tag.lower()
        nodes.append([
            ELEMENT, tag, tag_lc, -1, [],
            UNCLOSED, None, True, False, line, col, "", 0, 0,
            [], [], [], [], [], "", None, False, src_start, -1,
        ])
        stack = self.open_stack
        if not self.xml_mode:
            closers = OPEN_IMPLIES_CLOSE.get(tag_lc)
            if closers:
                while nodes[stack[-1]][N_TAG_LC] in closers:
                    nodes[stack[-1]][N_CLOSURE] = IMPLICITLY_CLOSED
                    stack.pop()
        cur = stack[-1]
        nodes[idx][N_PARENT] = cur
        nodes[cur][N_CHILDREN].append(idx)
        stack.append(idx)
        if tag_lc == "math" or tag_lc == "svg":
            self.in_math_or_svg += 1
        return idx

    def add_leaf(self, kind: int, content: str, line: int, col: int,
                 terminated: bool = True, poss_ent: bool = False,
                 src_start: int = -1, src_end: int = -1) -> int:
        nodes = self.nodes
        idx = len(nodes)
        cur = self.open_stack[-1]
        nodes.append([
            kind, "", "", cur, None,
            UNCLOSED, content, terminated, poss_ent, line, col, "", 0, 0,
            None, None, None, None, None, "", None, False, src_start, src_end,
        ])
        nodes[cur][N_CHILDREN].append(idx)
        return idx

    def count_unclosed_flat(self):
        """Parse-end census over the flat node list (equivalent to
        count_unclosed(0) when no node has been removed — true at the end
        of a parse; the tree walk remains for post-mutation callers)."""
        unclosed = implicitly = 0
        for nd in self.nodes:
            if nd[N_KIND] == ELEMENT and not nd[N_SYNTHETIC]:
                c = nd[N_CLOSURE]
                if c == UNCLOSED:
                    unclosed += 1
                elif c == IMPLICITLY_CLOSED:
                    implicitly += 1
        return unclosed, implicitly

    # --- DomModel equivalents ---------------------------------------------

    @property
    def current(self) -> int:
        return self.open_stack[-1] if self.open_stack else 0

    def get_depth(self) -> int:
        return len(self.open_stack) - 2

    def add_attribute(self, name: str, value: str = "", leading_space: str = "",
                      equals: str = "=", quote: str = '"') -> None:
        nd = self.nodes[self.open_stack[-1]]
        nd[N_ATTR_NAMES].append(name)
        nd[N_ATTR_VALUES].append(value)
        nd[N_ATTR_SPACING].append(leading_space)
        nd[N_ATTR_EQUALS].append(equals)
        nd[N_ATTR_QUOTES].append(quote)

    def add_inner_whitespace(self, ws: str) -> None:
        self.nodes[self.open_stack[-1]][N_INNER_WS] = ws or ""

    def can_do_xml_mode(self) -> bool:
        root_children = self.nodes[0][N_CHILDREN]
        return (len(self.open_stack) == 1 and len(root_children) == 0) or (
            len(root_children) == 1
            and self.serialize(root_children[0]).strip() == "")

    def add_child(self, child: int) -> None:
        cur = self.open_stack[-1]
        self.nodes[child][N_PARENT] = cur
        self.nodes[cur][N_CHILDREN].append(child)

    def pre_push(self, node: int) -> None:
        nodes = self.nodes
        tag_lc = nodes[node][N_TAG_LC]
        if not self.xml_mode and tag_lc in OPEN_IMPLIES_CLOSE:
            closers = OPEN_IMPLIES_CLOSE[tag_lc]
            stack = self.open_stack
            while nodes[stack[-1]][N_TAG_LC] in closers:
                nodes[stack[-1]][N_CLOSURE] = IMPLICITLY_CLOSED
                stack.pop()

    def push(self, node: int) -> None:
        self.open_stack.append(node)
        if self.nodes[node][N_TAG_LC] in ("math", "svg"):
            self.in_math_or_svg += 1

    def pop(self, tag_lc, end_tag_text: str | None = None,
            line: int = 0, col: int = 0, end_pos: int = -1) -> bool:
        """Mirror of dom.ts:668-741. ``tag_lc`` may be POP_VOID / POP_SELF.

        Returns False when the closing tag was unmatched (parse error).
        """
        nodes = self.nodes
        popped = False
        parse_error = False
        is_sentinel = tag_lc is POP_VOID or tag_lc is POP_SELF
        if end_tag_text is None:
            end_tag_text = "</%s>" % ("" if is_sentinel else tag_lc)

        unwound = False
        cur = self.open_stack[-1]
        nd = nodes[cur]
        if is_sentinel or not tag_lc or nd[N_TAG_LC] == tag_lc:
            popped = True
            self.open_stack.pop()
            if tag_lc is POP_SELF:
                nd[N_CLOSURE] = SELF_CLOSED
            elif tag_lc is POP_VOID:
                nd[N_CLOSURE] = VOID_CLOSED
            else:
                nd[N_CLOSURE] = EXPLICITLY_CLOSED
                nd[N_END_TAG] = end_tag_text
                nd[N_END_LINE] = line
                nd[N_END_COL] = col
            if end_pos >= 0:
                nd[N_SRC_END] = end_pos
            if nd[N_TAG_LC] == "table":
                self._examine_table(cur)

        if not popped and not self.xml_mode:
            stack = self.open_stack
            node_index = -1
            for i in range(len(stack) - 1, -1, -1):
                if nodes[stack[i]][N_TAG_LC] == tag_lc:
                    node_index = i
                    break

            if node_index > 0:  # matching only the root sentinel = unmatched
                if tag_lc in FORMATTING_ELEMENTS:
                    for i in range(node_index + 1, len(stack)):
                        if nodes[stack[i]][N_TAG_LC] in MARKER_ELEMENTS:
                            node_index = -1
                            break

            # Deliberate divergence from the reference: dom.ts:702 runs its
            # unwind while-loop even after the marker scan resets nodeIndex
            # to -1, which infinite-loops on inputs like '<b><td></b>'
            # (verified against dom.ts:668-741 by hand; fuzzing found it).
            # The intended semantics — a formatting end tag blocked by a
            # marker element is unmatched — is what the guard below applies.
            if node_index > 0:
                unwound = True
                while len(stack) > node_index:
                    cur = stack[-1]
                    nd = nodes[cur]
                    if not nd[N_CLOSURE]:
                        if len(stack) - 1 == node_index:
                            popped = True
                            nd[N_CLOSURE] = EXPLICITLY_CLOSED
                            nd[N_END_TAG] = end_tag_text
                            nd[N_END_LINE] = line
                            nd[N_END_COL] = col
                            if end_pos >= 0:
                                nd[N_SRC_END] = end_pos
                        else:
                            nd[N_CLOSURE] = IMPLICITLY_CLOSED
                        if nd[N_TAG_LC] == "table":
                            self._examine_table(cur)
                    stack.pop()

        if not popped:
            child = self.new_leaf(UNMATCHED_CLOSE, end_tag_text, line, col)
            self.add_child(child)
            parse_error = True

        # The reference recomputes math/svg depth and re-parents the whole
        # stack after EVERY pop (dom.ts:733-738), which is quadratic in
        # document depth. For a simple top-pop the re-parent is a no-op
        # (parents already equal their stack predecessors), so we only run
        # the full pass after an unwind or when the stack emptied; otherwise
        # an O(1) counter update is behavior-identical.
        if unwound or not self.open_stack:
            if not self.open_stack:
                self.open_stack.append(0)
            self.in_math_or_svg = 0
            stack = self.open_stack
            for index, node in enumerate(stack):
                if nodes[node][N_TAG_LC] in ("math", "svg"):
                    self.in_math_or_svg += 1
                if index > 0:
                    nodes[node][N_PARENT] = stack[index - 1]
        elif popped and nd[N_TAG_LC] in ("math", "svg"):
            self.in_math_or_svg -= 1

        return not parse_error

    def should_parse_cdata(self) -> bool:
        return self.xml_mode or self.in_math_or_svg > 0

    # --- table repair (dom.ts:588-658) -------------------------------------

    def _examine_table(self, table: int) -> None:
        nodes = self.nodes
        children = nodes[table][N_CHILDREN]
        if not children or self.xml_mode:
            return

        self._insert_rows_where_needed(table)

        sections = set()
        for elem in children:
            nd = nodes[elem]
            if nd[N_KIND] == ELEMENT and nd[N_TAG_LC] in ("thead", "tbody", "tfoot"):
                sections.add(nd[N_TAG_LC])
                self._insert_rows_where_needed(elem)

        if not sections:
            return

        section = None
        for i, elem in enumerate(children):
            nd = nodes[elem]
            if nd[N_KIND] != ELEMENT:
                continue
            tag_lc = nd[N_TAG_LC]
            if tag_lc in ("thead", "tbody", "tfoot"):
                section = None if nd[N_CLOSURE] == EXPLICITLY_CLOSED else elem
            elif tag_lc == "tr":
                has_th = self.query_selector(elem, "th") is not None
                if section is None or (has_th and nodes[section][N_TAG_LC] != "thead"):
                    section = self.new_element("thead" if has_th else "tbody",
                                               0, 0, synthetic=True)
                    nodes[section][N_PARENT] = table
                    children[i] = section
                nd[N_PARENT] = section
                nodes[section][N_CHILDREN].append(elem)

    def _insert_rows_where_needed(self, node: int) -> None:
        nodes = self.nodes
        children = nodes[node][N_CHILDREN]
        if not children:
            return
        row = None
        for i, elem in enumerate(children):
            nd = nodes[elem]
            if nd[N_KIND] != ELEMENT:
                continue
            tag_lc = nd[N_TAG_LC]
            if tag_lc in ("th", "td"):
                if row is None:
                    row = self.new_element("tr", 0, 0, synthetic=True)
                    nodes[row][N_PARENT] = node
                    children[i] = row
                nd[N_PARENT] = row
                nodes[row][N_CHILDREN].append(elem)
            elif tag_lc == "tr":
                row = None if nd[N_CLOSURE] == EXPLICITLY_CLOSED else elem

    # --- queries (dom.ts:383-417) -------------------------------------------

    def get_attr(self, node: int, name: str) -> str | None:
        """Last-write-wins lookup, mirroring valuesLookup (dom.ts:226,351)."""
        nd = self.nodes[node]
        names = nd[N_ATTR_NAMES]
        if not names:
            return None
        value = None
        for i, n in enumerate(names):
            if n == name:
                value = nd[N_ATTR_VALUES][i]
        return value

    @staticmethod
    def parse_selector(s: str):
        qlass = None
        m = _RE_SELECTOR.match(s)
        if m:
            s = m.group(1)
            qlass = m.group(2)
        element = id_ = None
        if s:
            if s.startswith("#"):
                id_ = s[1:]
            elif s == "*":
                element = ""
            else:
                element = s.lower()
        else:
            element = ""
        return element, id_, qlass

    def _selector_matches(self, node: int, element, id_, qlass) -> bool:
        if element and self.nodes[node][N_TAG_LC] != element:
            return False
        if qlass is not None:
            cls = self.get_attr(node, "class") or ""
            if qlass not in _RE_CLASS_SPLIT.split(cls):
                return False
        if id_ is not None and self.get_attr(node, "id") != id_:
            return False
        return True

    def _query_impl(self, node: int, sel, results: list[int], limit: int) -> None:
        # explicit stack: adversarially deep pages must not hit the Python
        # recursion limit inside a long-running kernel
        element, id_, qlass = sel
        nodes = self.nodes
        stack = [node]
        while stack and len(results) < limit:
            cur = stack.pop()
            if self._selector_matches(cur, element, id_, qlass):
                results.append(cur)
                if len(results) >= limit:
                    break
            children = nodes[cur][N_CHILDREN]
            if children:
                for child in reversed(children):
                    if nodes[child][N_KIND] == ELEMENT:
                        stack.append(child)

    def query_selector(self, node: int, selector: str) -> int | None:
        results: list[int] = []
        self._query_impl(node, self.parse_selector(selector), results, 1)
        return results[0] if results else None

    def query_selector_all(self, node: int, selector: str) -> list[int]:
        results: list[int] = []
        self._query_impl(node, self.parse_selector(selector), results, 1 << 60)
        return results

    def depth(self, node: int) -> int:
        nodes = self.nodes
        d = -1
        p = nodes[node][N_PARENT]
        while p >= 0:
            d += 0 if (nodes[p][N_SYNTHETIC] and nodes[p][N_PARENT] >= 0) else 1
            p = nodes[p][N_PARENT]
        return d

    def synthetic_depth(self, node: int) -> int:
        nodes = self.nodes
        d = -1
        p = nodes[node][N_PARENT]
        while p >= 0:
            d += 1
            p = nodes[p][N_PARENT]
        return d

    # --- extraction (dom.ts:419-434) ------------------------------------------

    def text_content(self, node: int) -> str:
        out: list[str] = []
        self._text_content(node, out)
        return "".join(out)

    def _text_content(self, node: int, out: list[str]) -> None:
        nodes = self.nodes
        children = nodes[node][N_CHILDREN]
        if not children:
            return
        stack = list(reversed(children))
        while stack:
            nd = nodes[stack.pop()]
            k = nd[N_KIND]
            if k == CDATA:
                out.append(nd[N_CONTENT])
            elif k == TEXT:
                c = nd[N_CONTENT]
                if nd[N_POSS_ENT] and "&" in c:
                    c = unescape_entities(c)
                out.append(c)
            elif k == ELEMENT:
                kids = nd[N_CHILDREN]
                if kids:
                    stack.extend(reversed(kids))

    def count_unclosed(self, node: int = 0):
        nodes = self.nodes
        unclosed = implicitly = 0
        stack = [node]
        while stack:
            nd = nodes[stack.pop()]
            if nd[N_KIND] == ELEMENT:
                if not nd[N_SYNTHETIC]:
                    if nd[N_CLOSURE] == UNCLOSED:
                        unclosed += 1
                    elif nd[N_CLOSURE] == IMPLICITLY_CLOSED:
                        implicitly += 1
                children = nd[N_CHILDREN]
                if children:
                    stack.extend(children)
        return unclosed, implicitly

    # --- serialization (dom.ts:501-532) ---------------------------------------

    def serialize(self, node: int, include_self: bool = True) -> str:
        parts: list[str] = []
        self._serialize(node, include_self, parts)
        return "".join(parts)

    def _serialize(self, node: int, include_self: bool, parts: list[str]) -> None:
        # explicit stack with end-tag phase tokens (deep pages must not hit
        # the recursion limit); -1 in the second slot marks an end-tag emit
        nodes = self.nodes
        stack: list = [(node, include_self)]
        while stack:
            node, inc = stack.pop()
            if inc == -1:
                parts.append(nodes[node][N_END_TAG])
                continue
            nd = nodes[node]
            if nd[N_KIND] != ELEMENT:
                parts.append(self._leaf_str(node))
                continue

            emit_self = inc and not nd[N_SYNTHETIC]
            if emit_self:
                parts.append("<")
                parts.append(nd[N_TAG])
                names = nd[N_ATTR_NAMES]
                if names:
                    values = nd[N_ATTR_VALUES]
                    spacing = nd[N_ATTR_SPACING]
                    equals = nd[N_ATTR_EQUALS]
                    quotes = nd[N_ATTR_QUOTES]
                    for i in range(len(names)):
                        q = quotes[i]
                        parts.append(spacing[i])
                        parts.append(names[i])
                        parts.append(equals[i])
                        parts.append(oq(q))
                        parts.append(values[i])
                        parts.append(cq(q))
                if nd[N_INNER_WS]:
                    parts.append(nd[N_INNER_WS])
                if nd[N_BAD_TERM] is not None:
                    parts.append(nd[N_BAD_TERM])
                elif nd[N_CLOSURE] == SELF_CLOSED:
                    parts.append("/>")
                else:
                    parts.append(">")
                if nd[N_CLOSURE] == EXPLICITLY_CLOSED and nd[N_END_TAG]:
                    stack.append((node, -1))

            children = nd[N_CHILDREN]
            if children:
                for child in reversed(children):
                    stack.append((child, True))

    def _leaf_str(self, node: int) -> str:
        nd = self.nodes[node]
        k = nd[N_KIND]
        c = nd[N_CONTENT]
        t = nd[N_TERMINATED]
        if k == TEXT or k == UNMATCHED_CLOSE:
            return c
        if k == COMMENT:
            return "<!--" + c + ("-->" if t else "")
        if k == CDATA:
            return "<![CDATA[" + c + ("]]>" if t else "")
        if k == DECLARATION or k == DOCTYPE:
            return "<!" + c + (">" if t else "")
        if k == PROCESSING:
            return "<?" + c + (">" if t else "")
        raise AssertionError("unknown node kind %r" % k)

    # --- attribute mutation API (dom.ts:274-352; formatter-facing) -------------

    def set_attribute(self, node: int, name: str, value: str = "",
                      leading_space: str | None = None, equals: str | None = None,
                      quote: str | None = None) -> None:
        nd = self.nodes[node]
        names = nd[N_ATTR_NAMES]
        try:
            index = names.index(name)
        except ValueError:
            self.add_attribute_to(node, name, value, leading_space or " ",
                                  equals, quote)
            return
        if value is None:
            self.delete_attribute(node, index)
            return
        nd[N_ATTR_VALUES][index] = value
        if leading_space is not None:
            nd[N_ATTR_SPACING][index] = leading_space
        if equals is not None:
            nd[N_ATTR_EQUALS][index] = equals
        if quote is not None:
            nd[N_ATTR_QUOTES][index] = quote
        if value:
            if not nd[N_ATTR_EQUALS][index]:
                nd[N_ATTR_EQUALS][index] = "="
            if not nd[N_ATTR_QUOTES][index]:
                nd[N_ATTR_QUOTES][index] = '"'

    def add_attribute_to(self, node: int, name: str, value: str = "",
                         leading_space: str = " ", equals: str | None = None,
                         quote: str | None = None) -> None:
        if value is None:
            return
        if value == "":
            equals = equals if equals is not None else ""
            quote = quote if quote is not None else ""
        else:
            equals = equals if equals is not None else "="
            quote = quote if quote is not None else '"'
        nd = self.nodes[node]
        nd[N_ATTR_NAMES].append(name)
        nd[N_ATTR_VALUES].append(value)
        nd[N_ATTR_SPACING].append(leading_space)
        nd[N_ATTR_EQUALS].append(equals)
        nd[N_ATTR_QUOTES].append(quote)

    def delete_attribute(self, node: int, name_or_index) -> bool:
        nd = self.nodes[node]
        names = nd[N_ATTR_NAMES]
        if isinstance(name_or_index, str):
            try:
                name_or_index = names.index(name_or_index)
            except ValueError:
                return False
        if not (0 <= name_or_index < len(names)):
            return False
        for f in (N_ATTR_NAMES, N_ATTR_VALUES, N_ATTR_EQUALS,
                  N_ATTR_QUOTES, N_ATTR_SPACING):
            del nd[f][name_or_index]
        return True

    def clear_attributes(self, node: int) -> None:
        nd = self.nodes[node]
        for f in (N_ATTR_NAMES, N_ATTR_VALUES, N_ATTR_EQUALS,
                  N_ATTR_QUOTES, N_ATTR_SPACING):
            nd[f].clear()

    def remove_child_at(self, node: int, index: int) -> None:
        """dom.ts:360-362: splice the index-th child out of ``node``."""
        children = self.nodes[node][N_CHILDREN]
        if children and 0 <= index < len(children):
            del children[index]

    def detach(self, node: int) -> None:
        """dom.ts:369-374: remove ``node`` from its parent's children."""
        p = self.nodes[node][N_PARENT]
        if p >= 0:
            children = self.nodes[p][N_CHILDREN]
            if node in children:
                children.remove(node)

    def create_closed_element(self, tag: str) -> int:
        """dom.ts:228-235 createNode: a detached, explicitly-closed element."""
        node = self.new_element(tag, 0, 0)
        nd = self.nodes[node]
        nd[N_END_TAG] = f"</{tag}>"
        nd[N_CLOSURE] = EXPLICITLY_CLOSED
        return node

    # --- JSON debug sink (dom.ts:464-499, 128-133) ------------------------------

    def to_json(self, node: int = 0):
        """Debug-oriented nested dict mirroring the reference's toJSON."""
        nd = self.nodes[node]
        if nd[N_KIND] != ELEMENT:
            return (self._leaf_str(node)
                    + " (" + str(self.depth(node))
                    + (f"; {nd[N_LINE]}, {nd[N_COL]}" if nd[N_LINE] else "")
                    + (f"; {self.nodes[nd[N_PARENT]][N_TAG]}" if nd[N_PARENT] >= 0 else "")
                    + ")" + ("" if nd[N_TERMINATED] else "!"))
        json: dict = {"tag": nd[N_TAG]}
        if nd[N_LINE]:
            json["line"] = nd[N_LINE]
        if nd[N_COL]:
            json["column"] = nd[N_COL]
        if nd[N_SYNTHETIC]:
            json["synthetic"] = True
        if nd[N_BAD_TERM] is not None:
            json["badTerminator"] = nd[N_BAD_TERM]
        json["depth"] = self.depth(node)
        sd = self.synthetic_depth(node)
        if json["depth"] != sd:
            json["syntheticDepth"] = sd
        json["closureState"] = nd[N_CLOSURE]
        if nd[N_ATTR_NAMES]:
            json["values"] = {name: nd[N_ATTR_VALUES][i]
                              for i, name in enumerate(nd[N_ATTR_NAMES])}
        if nd[N_PARENT] >= 0:
            json["parentTag"] = self.nodes[nd[N_PARENT]][N_TAG]
        if nd[N_CHILDREN]:
            json["children"] = [self.to_json(c) for c in nd[N_CHILDREN]]
        if nd[N_CLOSURE] == EXPLICITLY_CLOSED and nd[N_END_TAG]:
            json["endTagText"] = (f"{nd[N_END_TAG]} "
                                  f"({nd[N_END_LINE]}, {nd[N_END_COL]})")
        return json

    # --- line map (dom.ts:116-126, 251-268) --------------------------------------

    def line_map(self, node: int = 0) -> list[tuple[int, int, int]]:
        """(display_line, node_id, source_line) tuples for a (re)formatted
        document: maps display lines of the serialized output back to the
        source lines recorded at parse time."""
        out: list[tuple[int, int, int]] = []
        current = [1]
        self._line_map(node, out, current)
        out.sort(key=lambda e: e[0])
        return out

    @staticmethod
    def _count_lines(*groups) -> int:
        count = 0
        for item in groups:
            if isinstance(item, (list, tuple)):
                for s in item:
                    count += len(_RE_EOL_COUNT.findall(s or ""))
            else:
                count += len(_RE_EOL_COUNT.findall(item or ""))
        return count

    def _line_map(self, node: int, out: list, current: list[int]) -> None:
        nd = self.nodes[node]
        if nd[N_PARENT] >= 0:
            out.append((current[0], node, nd[N_LINE]))
        if nd[N_KIND] != ELEMENT:
            current[0] += self._count_lines(nd[N_CONTENT])
            return
        current[0] += self._count_lines(nd[N_INNER_WS], nd[N_ATTR_EQUALS] or [],
                                        nd[N_ATTR_SPACING] or [],
                                        nd[N_ATTR_VALUES] or [])
        for child in nd[N_CHILDREN] or []:
            self._line_map(child, out, current)
        current[0] += self._count_lines(nd[N_END_TAG])

    # --- doctype helpers (dom.ts:154-174) --------------------------------------

    @staticmethod
    def doctype_info(content: str):
        dt_type = "xhtml" if _RE_XHTML.search(content) else "html"
        m = _RE_VARIETY.search(content.lower())
        variety = m.group(1) if m else None
        m = _RE_VERSION.search(content)
        version = m.group(1) if m else None
        if not version and _RE_HTML5.match(content):
            version = "5"
        return dt_type, variety, version

    # --- flat export ------------------------------------------------------------

    def doc_order(self) -> list[int]:
        """Node indices in document (DFS) order, root excluded."""
        nodes = self.nodes
        order: list[int] = []
        stack = list(reversed(nodes[0][N_CHILDREN] or []))
        while stack:
            node = stack.pop()
            order.append(node)
            children = nodes[node][N_CHILDREN]
            if children:
                stack.extend(reversed(children))
        return order
