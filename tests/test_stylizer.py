"""Stylizer round-trip (reference: src/stylizer.spec.ts)."""

import re

from fortissimo_spark.chars import unescape_entities
from fortissimo_spark.dom import ELEMENT, TEXT
from fortissimo_spark.parser import parse
from fortissimo_spark.stylizer import StyleOptions, stylize_html


def test_stylize_roundtrip(sample_html):
    b = parse(sample_html).dom
    stylized = stylize_html(b)

    b2 = parse(stylized).dom
    html = next(c for c in b2.children[0]
                if b2.kind[c] == ELEMENT and b2.tag_lc[c] == "html")
    body = next(c for c in b2.children[html]
                if b2.kind[c] == ELEMENT and b2.tag_lc[c] == "body")

    sb = []
    for elem in b2.children[body]:
        if b2.kind[elem] == ELEMENT and b2.tag_lc[elem] == "span":
            sb.append(unescape_entities(b2.content[b2.children[elem][0]]))
        elif b2.kind[elem] == TEXT:
            sb.append(unescape_entities(b2.content[elem]))

    joined = "".join(sb)
    reconstituted = "".join(
        sample_html[i] if ch == "�" else ch
        for i, ch in enumerate(joined))
    assert reconstituted == sample_html


def test_stylize_show_whitespace(sample_html):
    b = parse(sample_html).dom
    stylized = stylize_html(b, options=StyleOptions(show_whitespace=True))
    assert "·" in stylized  # visualized spaces
    assert "fh-whitespace" in stylized
    assert "fh-tab" in stylized or "\t" not in sample_html


def test_stylize_classes(sample_html):
    b = parse(sample_html).dom
    stylized = stylize_html(b)
    for cls in ("fh-tag", "fh-attrib", "fh-value", "fh-comment", "fh-markup",
                "fh-entity", "fh-error"):
        assert cls in stylized, cls
    # light theme + fragment mode
    frag = stylize_html(b, options=StyleOptions(dark=False, outer_tag="div"))
    assert frag.startswith('<div class="fh-html">')
    assert not frag.endswith("</html>")
    assert re.search(r"^<div", frag)
