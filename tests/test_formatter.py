"""Formatter parity (reference: src/formatter.spec.ts)."""

from fortissimo_spark.chars import ReencodeOptions, TargetEncoding
from fortissimo_spark.formatter import (
    FormatOptions, ValueQuoteStyle, ValueQuoting, format_html,
)
from fortissimo_spark.parser import parse

from .conftest import SMALL_SAMPLE


def test_format_sample(sample_html):
    r = parse(sample_html)
    b = r.dom
    format_html(b, FormatOptions(
        indent=2,
        children_not_indented=["-thead", "-tbody", "-tfoot"],
        continuation_indent=4,
        instantiate_synthetic_nodes=True,
        reencode=ReencodeOptions.MINIMAL,
        target=TargetEncoding.EIGHT_BIT,
        undo_unneeded_entities=True,
        value_quoting=ValueQuoting.UNQUOTE_SIMPLE_VALUES))
    reformatted = b.serialize(0)

    assert "/* Ignore &lt; as attribute */" in reformatted
    assert "console.log(value, '&szlig; " in reformatted
    assert 'foo="=bar/baz&amp;"' in reformatted
    assert " class=inner-wrapper " in reformatted


def test_single_quotes():
    b = parse(SMALL_SAMPLE).dom
    format_html(b, FormatOptions(
        indent=2, continuation_indent=4,
        value_quoting=ValueQuoting.ALWAYS_QUOTE,
        value_quote_style=ValueQuoteStyle.SINGLE))
    reformatted = b.serialize(0)
    assert "charset='utf-8'" in reformatted
    assert " alt='can&apos;t'/>" in reformatted


def test_unquote_integers():
    b = parse(SMALL_SAMPLE).dom
    format_html(b, FormatOptions(
        indent=2, continuation_indent=4,
        value_quoting=ValueQuoting.UNQUOTE_INTEGERS))
    reformatted = b.serialize(0)
    assert 'charset="utf-8"' in reformatted
    assert " width=32 height=32 " in reformatted


def test_misnested_indentation():
    b = parse("<b>1<p>2</b>3</p>").dom
    format_html(b, FormatOptions(indent=2, continuation_indent=4))
    assert "<b>1\n  <p>2</b>3</p>" in b.serialize(0)


def test_unquote_simple_and_space_equals():
    b = parse(SMALL_SAMPLE).dom
    format_html(b, FormatOptions(
        indent=2, continuation_indent=4,
        space_around_attribute_equals=True,
        value_quoting=ValueQuoting.UNQUOTE_SIMPLE_VALUES))
    reformatted = b.serialize(0)
    assert "charset = utf-8" in reformatted
    assert " width = 32 height = 32 " in reformatted


def test_blank_line_cap():
    b = parse("<span>A</span> \n \n   \n \n <span>B</span>").dom
    format_html(b, FormatOptions(
        end_document_with_newline=False, indent=2, max_blank_lines=1))
    assert b.serialize(0) == "<span>A</span>\n\n<span>B</span>"


def test_deep_nesting_no_recursion_error():
    """Adversarial crawl HTML: ~5000 nested open tags must not blow the
    Python C stack (walkers are trampoline-driven, heap-bound depth)."""
    from fortissimo_spark.formatter import FormatOptions, format_html
    from fortissimo_spark.parser import parse
    from fortissimo_spark.stylizer import stylize_html

    depth = 5000
    html = "<div>" * depth + "x" + "</div>" * depth
    result = parse(html, positions=False)
    format_html(result.dom, FormatOptions(indent=2))
    formatted = result.dom.serialize(0)
    assert "x" in formatted
    assert formatted.count("<div>") == depth

    result2 = parse(html, positions=False)
    styled = stylize_html(result2.dom, 0)
    assert styled.count("div") >= 2 * depth

    # synthetic-node walkers too (instantiate + remove)
    result3 = parse("<table>" + "<div>" * depth + "</table>", positions=False)
    format_html(result3.dom, FormatOptions(instantiate_synthetic_nodes=True))
    assert result3.dom.serialize(0)
