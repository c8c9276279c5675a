"""SAX event-stream parity (reference html-parser.ts:85-213 callbacks;
reconstitution contract from html-parser.spec.ts:57-120)."""

import pytest

from fortissimo_spark.events import (
    GENERIC_EVENTS, parse_events, reconstitute, to_generic,
)
from fortissimo_spark.parser import parse

from .conftest import SMALL_SAMPLE, fixture_text


def test_reconstruct_from_specific_events(sample_w3c):
    """Mirror of 'should properly reconstruct HTML from specific callbacks'
    (html-parser.spec.ts:57-105): rebuild each event kind from its payload
    fields (NOT the convenience .src) and compare byte-identically."""
    result = parse(sample_w3c, eol=False)
    rebuilt = []
    completed = False
    seen = set()
    for ev in parse_events(result):
        seen.add(ev.kind)
        k, a = ev.kind, ev.args
        if k == "attribute":
            spacing, name, equals, value, quote = a
            oq = "_" + quote[1] if quote.startswith("_") else quote
            # mirror dom.oq/cq: '_"' marks an unterminated quote
            from fortissimo_spark.dom import cq, oq as oq_fn
            rebuilt.append(spacing + name + equals + oq_fn(quote) + value + cq(quote))
        elif k == "cdata":
            rebuilt.append("<![CDATA[" + a[0] + ("]]>" if a[1] else ""))
        elif k == "comment":
            rebuilt.append("<!--" + a[0] + ("-->" if a[1] else ""))
        elif k == "declaration":
            rebuilt.append("<!" + a[0] + (">" if a[1] else ""))
        elif k == "doctype":
            rebuilt.append("<!" + a[3] + (">" if a[4] else ""))
        elif k == "end-tag":
            rebuilt.append("</" + a[0] + a[1])
        elif k == "error":
            rebuilt.append(a[3] or "")
        elif k == "processing":
            rebuilt.append("<?" + a[0] + (">" if a[1] else ""))
        elif k == "start-tag-start":
            rebuilt.append("<" + a[0])
        elif k == "start-tag-end":
            rebuilt.append(a[0] + a[1])
        elif k == "text":
            rebuilt.append(a[0])
        elif k == "completion":
            completed = True
    assert "".join(rebuilt) == result.text == sample_w3c
    assert completed
    assert {"doctype", "start-tag-start", "attribute", "start-tag-end",
            "end-tag", "text", "comment", "completion"} <= seen


def test_reconstruct_from_generic_events(sample_html):
    """Mirror of 'should properly reconstruct HTML from generic callbacks'
    (html-parser.spec.ts:108-120)."""
    result = parse(sample_html, eol=False)
    rebuilt = []
    for ev in parse_events(result):
        g = to_generic(ev)
        if g is not None:
            # doctype folds as 'declaration' (html-parser.ts:796-799)
            assert ev.kind in GENERIC_EVENTS or ev.kind == "doctype"
            rebuilt.append(g[1])
    assert "".join(rebuilt) == sample_html


EOF_ENDINGS = [
    "<!--", "<!--x", "<!someth..", "<?php", "<math><annotation><![CDATA[stuff",
    "<div", "<span foo", "<span  foo =", '<span foo= "bar', "<", "</", "</a",
    "</a ", "</a b",
]


@pytest.mark.parametrize("ending", EOF_ENDINGS)
def test_events_reconstruct_eof_matrix(ending):
    content = SMALL_SAMPLE + ending
    result = parse(content)
    assert reconstitute(parse_events(result)) == content


def test_event_depths_and_spans(sample_w3c):
    result = parse(sample_w3c, eol=False)
    events = list(parse_events(result))
    # html children sit at depth 1, doctype/html at 0
    starts = {e.args[0]: e.depth for e in events if e.kind == "start-tag-start"}
    assert starts["html"] == 0
    assert starts["head"] == 1
    assert starts["title"] == 2
    # spans: node events carry source offsets consistent with the source
    for e in events:
        if e.kind == "text" and e.start >= 0:
            assert result.text[e.start:e.start + 1] == e.src[:1]
        if e.kind == "start-tag-start" and e.start >= 0:
            # span covers exactly the '<tag' run
            assert result.text[e.start:e.end] == e.src
    # well-formed end tags: span slices to the end-tag text
    simple = parse("<div><p>x</p></div>", positions=False)
    for e in parse_events(simple):
        if e.kind == "end-tag" and e.start >= 0:
            assert simple.text[e.start:e.end] == e.src
    # lossy end tag ('</ p>' reconstitutes as '</p>'): span still covers
    # the full source run, starting at its '</'
    lossy = parse("<div><p>x</ p></div>", positions=False)
    spans = [(e.start, e.end, e.src) for e in parse_events(lossy)
             if e.kind == "end-tag" and e.start >= 0]
    for s, e_, src_txt in spans:
        assert lossy.text[s:s + 2] == "</"
    assert ("</ p>" in [lossy.text[s:e_] for s, e_, _ in spans])
    # completion is last, exactly once
    assert [e.kind for e in events].count("completion") == 1
    assert events[-1].kind == "completion"


def test_encoding_event():
    content = ('<html><head><meta charset="iso-8859-1"></head>'
               "<body>x</body></html>")
    result = parse(content)
    kinds = [e.kind for e in parse_events(result)]
    assert "encoding" in kinds
    enc = [e for e in parse_events(result) if e.kind == "encoding"][0]
    assert enc.args[0] == "iso-8859-1"


def test_unmatched_close_is_error_event():
    content = "<div>a</div></span>b"
    result = parse(content)
    events = list(parse_events(result))
    errs = [e for e in events if e.kind == "error"]
    assert len(errs) == 1
    assert errs[0].args[3] == "</span>"
    assert reconstitute(events) == content


def test_events_on_fuzz_and_samples():
    for name in ("sample.html", "sample-dirty1.html", "sample-dirty2.html"):
        try:
            content = fixture_text(name)
        except BaseException:
            continue
        result = parse(content, eol=False)
        assert reconstitute(parse_events(result)) == content


def test_end_tag_span_with_embedded_close_in_trailing():
    """A malformed end-tag whose swallowed trailing itself contains '</'
    ('<p>x</p </q>' stores src '</p </q>'): the span must start at the
    REAL '</' (offset 4), not the later one rfind would pick."""
    content = "<p>x</p </q>"
    events = list(parse_events(parse(content)))
    ends = [e for e in events if e.kind == "end-tag"]
    assert len(ends) == 1
    e = ends[0]
    assert (e.start, e.end) == (4, 12)
    assert content[e.start:e.end] == e.src == "</p </q>"
    assert reconstitute(events) == content
