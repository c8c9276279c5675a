"""Flat node-array DOM model with HTML5-style error correction.

Behavioral parity target: ``/root/reference/projects/fortissimo-html/src/dom.ts``
and ``src/elements.ts`` — re-expressed as parallel index arrays (no object
tree), per the engine's design: one document = one set of parallel lists,
``parent``/``children`` hold node indices.

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


def oq(quote: str) -> str:
    """Opening quotation mark ('_\"' marks an unterminated quote)."""
    return quote if len(quote) < 2 else quote[1:]


def cq(quote: str) -> str:
    """Closing quotation mark (suppressed for unterminated quotes)."""
    return quote if len(quote) < 2 else ""


class DocBuilder:
    """Per-document DOM as parallel arrays; node ids are list indices.

    Node 0 is the synthetic root (tag ``/``), matching the reference's root
    sentinel (dom.ts:536).
    """

    __slots__ = (
        "kind", "tag", "tag_lc", "parent", "children", "closure", "content",
        "terminated", "poss_ent", "line", "col", "end_tag", "end_line",
        "end_col", "attr_names", "attr_values", "attr_spacing", "attr_equals",
        "attr_quotes", "inner_ws", "bad_term", "synthetic",
        "src_start", "src_end",
        "open_stack", "in_math_or_svg", "xml_mode",
    )

    def __init__(self) -> None:
        self.kind: list[int] = []
        self.tag: list[str] = []
        self.tag_lc: list[str] = []
        self.parent: list[int] = []
        self.children: list[list[int] | None] = []
        self.closure: list[int] = []
        self.content: list[str | None] = []
        self.terminated: list[bool] = []
        self.poss_ent: list[bool] = []
        self.line: list[int] = []
        self.col: list[int] = []
        self.end_tag: list[str] = []
        self.end_line: list[int] = []
        self.end_col: list[int] = []
        self.attr_names: list[list[str] | None] = []
        self.attr_values: list[list[str] | None] = []
        self.attr_spacing: list[list[str] | None] = []
        self.attr_equals: list[list[str] | None] = []
        self.attr_quotes: list[list[str] | None] = []
        self.inner_ws: list[str] = []
        self.bad_term: list[str | None] = []
        self.synthetic: list[bool] = []
        self.src_start: list[int] = []
        self.src_end: list[int] = []

        self.open_stack: list[int] = []
        self.in_math_or_svg = 0
        self.xml_mode = False

        root = self._new_node(ELEMENT, "/", 0, 0, synthetic=True, case_sensitive=False)
        self.open_stack.append(root)

    # --- node construction ----------------------------------------------

    def _new_node(self, kind: int, tag: str, line: int, col: int, *,
                  content: str | None = None, terminated: bool = True,
                  poss_ent: bool = False, synthetic: bool = False,
                  case_sensitive: bool = False, src_start: int = -1,
                  src_end: int = -1) -> int:
        idx = len(self.kind)
        self.kind.append(kind)
        self.tag.append(tag)
        self.tag_lc.append(tag if case_sensitive else tag.lower())
        self.parent.append(-1)
        self.children.append([] if kind == ELEMENT else None)
        self.closure.append(UNCLOSED)
        self.content.append(content)
        self.terminated.append(terminated)
        self.poss_ent.append(poss_ent)
        self.line.append(line)
        self.col.append(col)
        self.end_tag.append("")
        self.end_line.append(0)
        self.end_col.append(0)
        if kind == ELEMENT:
            self.attr_names.append([])
            self.attr_values.append([])
            self.attr_spacing.append([])
            self.attr_equals.append([])
            self.attr_quotes.append([])
        else:
            self.attr_names.append(None)
            self.attr_values.append(None)
            self.attr_spacing.append(None)
            self.attr_equals.append(None)
            self.attr_quotes.append(None)
        self.inner_ws.append("")
        self.bad_term.append(None)
        self.synthetic.append(synthetic)
        self.src_start.append(src_start)
        self.src_end.append(src_end)
        return idx

    def new_element(self, tag: str, line: int, col: int, *,
                    case_sensitive: bool = False, synthetic: bool = False,
                    src_start: int = -1) -> int:
        return self._new_node(ELEMENT, tag, line, col, synthetic=synthetic,
                              case_sensitive=case_sensitive, src_start=src_start)

    def new_leaf(self, kind: int, content: str, line: int, col: int, *,
                 terminated: bool = True, poss_ent: bool = False,
                 src_start: int = -1, src_end: int = -1) -> int:
        return self._new_node(kind, "", line, col, content=content,
                              terminated=terminated, poss_ent=poss_ent,
                              src_start=src_start, src_end=src_end)

    # --- DomModel equivalents ---------------------------------------------

    @property
    def current(self) -> int:
        return self.open_stack[-1] if self.open_stack else 0

    def get_depth(self) -> int:
        return len(self.open_stack) - 2

    def add_attribute(self, name: str, value: str = "", leading_space: str = "",
                      equals: str = "=", quote: str = '"') -> None:
        node = self.current
        self.attr_names[node].append(name)
        self.attr_values[node].append(value)
        self.attr_spacing[node].append(leading_space)
        self.attr_equals[node].append(equals)
        self.attr_quotes[node].append(quote)

    def add_inner_whitespace(self, ws: str) -> None:
        self.inner_ws[self.current] = ws or ""

    def can_do_xml_mode(self) -> bool:
        root_children = self.children[0]
        return (len(self.open_stack) == 1 and len(root_children) == 0) or (
            len(root_children) == 1
            and self.serialize(root_children[0]).strip() == "")

    def add_child(self, child: int) -> None:
        cur = self.current
        self.parent[child] = cur
        self.children[cur].append(child)

    def pre_push(self, node: int) -> None:
        tag_lc = self.tag_lc[node]
        if not self.xml_mode and tag_lc in OPEN_IMPLIES_CLOSE:
            closers = OPEN_IMPLIES_CLOSE[tag_lc]
            while self.tag_lc[self.current] in closers:
                self.closure[self.current] = IMPLICITLY_CLOSED
                self.open_stack.pop()

    def push(self, node: int) -> None:
        self.open_stack.append(node)
        if self.tag_lc[node] in ("math", "svg"):
            self.in_math_or_svg += 1

    def pop(self, tag_lc, end_tag_text: str | None = None,
            line: int = 0, col: int = 0, end_pos: int = -1) -> bool:
        """Mirror of dom.ts:668-741. ``tag_lc`` may be POP_VOID / POP_SELF.

        Returns False when the closing tag was unmatched (parse error).
        """
        popped = False
        parse_error = False
        is_sentinel = tag_lc is POP_VOID or tag_lc is POP_SELF
        if end_tag_text is None:
            end_tag_text = "</%s>" % ("" if is_sentinel else tag_lc)

        cur = self.current
        if is_sentinel or not tag_lc or self.tag_lc[cur] == tag_lc:
            popped = True
            self.open_stack.pop()
            if tag_lc is POP_SELF:
                self.closure[cur] = SELF_CLOSED
            elif tag_lc is POP_VOID:
                self.closure[cur] = VOID_CLOSED
            else:
                self.closure[cur] = EXPLICITLY_CLOSED
                self.end_tag[cur] = end_tag_text
                self.end_line[cur] = line
                self.end_col[cur] = col
            if end_pos >= 0:
                self.src_end[cur] = end_pos
            if self.tag_lc[cur] == "table":
                self._examine_table(cur)

        if not popped and not self.xml_mode:
            stack = self.open_stack
            node_index = -1
            for i in range(len(stack) - 1, -1, -1):
                if self.tag_lc[stack[i]] == tag_lc:
                    node_index = i
                    break

            if node_index > 0:  # matching only the root sentinel = unmatched
                if tag_lc in FORMATTING_ELEMENTS:
                    for i in range(node_index + 1, len(stack)):
                        if self.tag_lc[stack[i]] in MARKER_ELEMENTS:
                            node_index = -1
                            break

                while len(stack) > node_index:
                    cur = stack[-1]
                    if not self.closure[cur]:
                        if len(stack) - 1 == node_index:
                            popped = True
                            self.closure[cur] = EXPLICITLY_CLOSED
                            self.end_tag[cur] = end_tag_text
                            self.end_line[cur] = line
                            self.end_col[cur] = col
                            if end_pos >= 0:
                                self.src_end[cur] = end_pos
                        else:
                            self.closure[cur] = IMPLICITLY_CLOSED
                        if self.tag_lc[cur] == "table":
                            self._examine_table(cur)
                    stack.pop()

        if not popped:
            child = self.new_leaf(UNMATCHED_CLOSE, end_tag_text, line, col)
            self.add_child(child)
            parse_error = True

        if not self.open_stack:
            self.open_stack.append(0)

        # recompute math/svg depth and re-parent the remaining stack
        self.in_math_or_svg = 0
        stack = self.open_stack
        for index, node in enumerate(stack):
            if self.tag_lc[node] in ("math", "svg"):
                self.in_math_or_svg += 1
            if index > 0:
                self.parent[node] = stack[index - 1]

        return not parse_error

    def should_parse_cdata(self) -> bool:
        return self.xml_mode or self.in_math_or_svg > 0

    # --- table repair (dom.ts:588-658) -------------------------------------

    def _examine_table(self, table: int) -> None:
        children = self.children[table]
        if not children or self.xml_mode:
            return

        self._insert_rows_where_needed(table)

        sections = set()
        for elem in children:
            if self.kind[elem] == ELEMENT and self.tag_lc[elem] in ("thead", "tbody", "tfoot"):
                sections.add(self.tag_lc[elem])
                self._insert_rows_where_needed(elem)

        if not sections:
            return

        section = None
        for i, elem in enumerate(children):
            if self.kind[elem] != ELEMENT:
                continue
            tag_lc = self.tag_lc[elem]
            if tag_lc in ("thead", "tbody", "tfoot"):
                section = None if self.closure[elem] == EXPLICITLY_CLOSED else elem
            elif tag_lc == "tr":
                has_th = self.query_selector(elem, "th") is not None
                if section is None or (has_th and self.tag_lc[section] != "thead"):
                    section = self.new_element("thead" if has_th else "tbody",
                                               0, 0, synthetic=True)
                    self.parent[section] = table
                    children[i] = section
                self.parent[elem] = section
                self.children[section].append(elem)

    def _insert_rows_where_needed(self, node: int) -> None:
        children = self.children[node]
        if not children:
            return
        row = None
        for i, elem in enumerate(children):
            if self.kind[elem] != ELEMENT:
                continue
            tag_lc = self.tag_lc[elem]
            if tag_lc in ("th", "td"):
                if row is None:
                    row = self.new_element("tr", 0, 0, synthetic=True)
                    self.parent[row] = node
                    children[i] = row
                self.parent[elem] = row
                self.children[row].append(elem)
            elif tag_lc == "tr":
                row = None if self.closure[elem] == EXPLICITLY_CLOSED else elem

    # --- queries (dom.ts:383-417) -------------------------------------------

    def get_attr(self, node: int, name: str) -> str | None:
        """Last-write-wins lookup, mirroring valuesLookup (dom.ts:226,351)."""
        names = self.attr_names[node]
        if not names:
            return None
        value = None
        for i, n in enumerate(names):
            if n == name:
                value = self.attr_values[node][i]
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
        if element and self.tag_lc[node] != element:
            return False
        if qlass is not None:
            cls = self.get_attr(node, "class") or ""
            if qlass not in _RE_CLASS_SPLIT.split(cls):
                return False
        if id_ is not None and self.get_attr(node, "id") != id_:
            return False
        return True

    def _query_impl(self, node: int, sel, results: list[int], limit: int) -> None:
        element, id_, qlass = sel
        if self._selector_matches(node, element, id_, qlass):
            results.append(node)
        children = self.children[node]
        if children:
            for child in children:
                if len(results) >= limit:
                    break
                if self.kind[child] == ELEMENT:
                    self._query_impl(child, sel, results, limit)

    def query_selector(self, node: int, selector: str) -> int | None:
        results: list[int] = []
        self._query_impl(node, self.parse_selector(selector), results, 1)
        return results[0] if results else None

    def query_selector_all(self, node: int, selector: str) -> list[int]:
        results: list[int] = []
        self._query_impl(node, self.parse_selector(selector), results, 1 << 60)
        return results

    def depth(self, node: int) -> int:
        d = -1
        p = self.parent[node]
        while p >= 0:
            d += 0 if (self.synthetic[p] and self.parent[p] >= 0) else 1
            p = self.parent[p]
        return d

    def synthetic_depth(self, node: int) -> int:
        d = -1
        p = self.parent[node]
        while p >= 0:
            d += 1
            p = self.parent[p]
        return d

    # --- extraction (dom.ts:419-434) ------------------------------------------

    def text_content(self, node: int) -> str:
        out: list[str] = []
        self._text_content(node, out)
        return "".join(out)

    def _text_content(self, node: int, out: list[str]) -> None:
        children = self.children[node]
        if not children:
            return
        for child in children:
            k = self.kind[child]
            if k == CDATA:
                out.append(self.content[child])
            elif k == TEXT:
                c = self.content[child]
                if self.poss_ent[child] and "&" in c:
                    c = unescape_entities(c)
                out.append(c)
            elif k == ELEMENT:
                self._text_content(child, out)

    def count_unclosed(self, node: int = 0):
        unclosed = implicitly = 0
        stack = [node]
        while stack:
            cur = stack.pop()
            if self.kind[cur] == ELEMENT:
                if not self.synthetic[cur]:
                    if self.closure[cur] == UNCLOSED:
                        unclosed += 1
                    elif self.closure[cur] == IMPLICITLY_CLOSED:
                        implicitly += 1
                children = self.children[cur]
                if children:
                    stack.extend(children)
        return unclosed, implicitly

    # --- serialization (dom.ts:501-532) ---------------------------------------

    def serialize(self, node: int, include_self: bool = True) -> str:
        parts: list[str] = []
        self._serialize(node, include_self, parts)
        return "".join(parts)

    def _serialize(self, node: int, include_self: bool, parts: list[str]) -> None:
        k = self.kind[node]
        if k != ELEMENT:
            parts.append(self._leaf_str(node))
            return

        emit_self = include_self and not self.synthetic[node]
        if emit_self:
            parts.append("<")
            parts.append(self.tag[node])
            names = self.attr_names[node]
            if names:
                values = self.attr_values[node]
                spacing = self.attr_spacing[node]
                equals = self.attr_equals[node]
                quotes = self.attr_quotes[node]
                for i in range(len(names)):
                    q = quotes[i]
                    parts.append(spacing[i])
                    parts.append(names[i])
                    parts.append(equals[i])
                    parts.append(oq(q))
                    parts.append(values[i])
                    parts.append(cq(q))
            if self.inner_ws[node]:
                parts.append(self.inner_ws[node])
            if self.bad_term[node] is not None:
                parts.append(self.bad_term[node])
            elif self.closure[node] == SELF_CLOSED:
                parts.append("/>")
            else:
                parts.append(">")

        children = self.children[node]
        if children:
            for child in children:
                self._serialize(child, True, parts)

        if emit_self and self.closure[node] == EXPLICITLY_CLOSED and self.end_tag[node]:
            parts.append(self.end_tag[node])

    def _leaf_str(self, node: int) -> str:
        k = self.kind[node]
        c = self.content[node]
        t = self.terminated[node]
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
        order: list[int] = []
        stack = list(reversed(self.children[0] or []))
        while stack:
            node = stack.pop()
            order.append(node)
            children = self.children[node]
            if children:
                stack.extend(reversed(children))
        return order
