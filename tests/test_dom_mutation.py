"""DOM mutation + JSON debug sink parity (reference: src/dom.spec.ts:43-93)."""

import json

from fortissimo_spark.parser import parse

from .conftest import SMALL_SAMPLE


def test_attribute_manipulation():
    b = parse("<x></x>").dom  # scratch builder
    node = b.create_closed_element("a")
    assert b.serialize(node) == "<a></a>"
    b.add_attribute_to(node, "href", "#foo")
    assert b.serialize(node) == '<a href="#foo"></a>'
    b.add_attribute_to(node, "disabled")
    assert b.serialize(node) == '<a href="#foo" disabled></a>'
    assert len(b.attr_names[node]) == 2
    b.set_attribute(node, "href", "#bar")
    assert b.serialize(node) == '<a href="#bar" disabled></a>'
    b.delete_attribute(node, 1)
    assert b.serialize(node) == '<a href="#bar"></a>'
    b.clear_attributes(node)
    assert b.serialize(node) == "<a></a>"


def test_remove_nodes():
    r = parse("<div><b>a</b><i>b</i><code>c</code></div>")
    b = r.dom
    i = b.query_selector(0, "i")
    b.detach(i)
    assert b.serialize(0).strip() == "<div><b>a</b><code>c</code></div>"
    div = b.query_selector(0, "div")
    b.remove_child_at(div, 0)
    assert b.serialize(0).strip() == "<div><code>c</code></div>"


def test_to_json(sample_html):
    b = parse(sample_html).dom
    root_json = b.to_json(0)
    assert root_json["children"]
    assert root_json["children"][1] == \
        "<!DOCTYPE html> (0; 2, 1; /)"

    body = b.query_selector(0, "body")
    s = json.dumps(root_json)
    assert '"tag": "body"' in s
    table = b.query_selector(0, "table")
    body_json = b.to_json(body)
    assert body_json["line"] == b.line[body]
    assert body_json["depth"] == b.depth(body)
    table_json = b.to_json(table)
    assert table_json["closureState"] == 3
    assert "endTagText" in table_json

    # badTerminator surfaces in JSON (dom.spec.ts:60)
    b2 = parse(SMALL_SAMPLE + "<p").dom
    assert "badTerminator" in json.dumps(b2.to_json(0))
    # unterminated leaf gets the '!' marker (dom.spec.ts:63)
    b3 = parse(SMALL_SAMPLE + "<!--").dom
    assert ")!" in json.dumps(b3.to_json(0))


def test_synthetic_depth_in_json(sample_html):
    b = parse(sample_html).dom
    th = b.query_selector_all(0, "th")[1]
    j = b.to_json(th)
    assert j["depth"] == 3
    assert j["syntheticDepth"] == 5


def test_line_map(sample_html):
    b = parse(sample_html).dom
    lm = b.line_map(0)
    assert len(lm) > 100
    # sorted by display line; on an unformatted document display == source
    assert lm == sorted(lm, key=lambda e: e[0])
    assert all(display == source for display, _, source in lm if source)
