"""Quirk corpus (FIXTURES.md §5) — behaviors forced by the reference source
even though its own tests don't cover them (SURVEY.md §2.7). The engine
must match these exactly, not "fix" them.
"""

from dompa_spark import oracle
from dompa_spark.constants import TEXT_NAME


def names(nodes):
    return [n["name"] for n in nodes or []]


def test_q01_single_char_doc_dropped():
    # Q2: clause 1 only sets state; 1-char docs emit nothing
    assert oracle.compose("a") == []
    assert oracle.parse("a") == []


def test_q02_trailing_single_char_dropped():
    assert oracle.parse("<div></div>h") == [{"name": "div", "attrs": {}}]


def test_q03_quote_unaware_tokenizer():
    # tag coordinate ends at the FIRST '>', even inside a quoted value
    html = '<div data-x="a>b">x</div>'
    coords = oracle.compose(html)
    assert coords[0] == (0, 14)  # '<div data-x="a>' — ends at first >
    # the 'b">' remainder becomes a text run ending (inclusive) at the '>'
    assert (15, 17) in coords


def test_q04_crossed_tags():
    # <b><i>x</b></i>: </b> dropped (stack top is i), b never closes
    nodes = oracle.parse("<b><i>x</b></i>")
    assert nodes == [
        {"name": "i", "attrs": {}, "children": [{"name": TEXT_NAME, "value": "x"}]}
    ]


def test_q05_comment_vanishes():
    nodes = oracle.parse("<!-- note --><p>x</p>")
    assert names(nodes) == ["p"]
    assert nodes[0]["children"] == [{"name": TEXT_NAME, "value": "x"}]


def test_q06_duplicate_attr_last_wins_first_position():
    nodes = oracle.parse('<div a="1" b="2" a="3">x</div>')
    assert nodes[0]["attrs"] == {"a": "3", "b": "2"}
    assert list(nodes[0]["attrs"].keys()) == ["a", "b"]


def test_q07_single_quotes_retained():
    nodes = oracle.parse("<div a='x'>y</div>")
    assert nodes[0]["attrs"] == {"a": "'x'"}


def test_q08_entity_verbatim_but_literal_gt_splits_text():
    # entities are opaque text
    nodes = oracle.parse("<p>5 &gt; 3</p>")
    assert nodes[0]["children"] == [{"name": TEXT_NAME, "value": "5 &gt; 3"}]
    # a literal '>' in text ends the text run AT it (inclusive)
    coords = oracle.compose("<p>5 > 3</p>")
    assert coords == [(0, 2), (3, 5), (6, 7), (8, 11)]
    # '5 >' text, then ' 3' text, then </p> closes p
    nodes = oracle.parse("<p>5 > 3</p>")
    assert nodes == [
        {
            "name": "p",
            "attrs": {},
            "children": [
                {"name": TEXT_NAME, "value": "5 >"},
                {"name": TEXT_NAME, "value": " 3"},
            ],
        }
    ]


def test_q09_void_set_case_sensitive():
    # lowercase param is void; uppercase PARAM is a non-void opener that
    # never closes and is dropped
    assert oracle.parse("<param x>") == [{"name": "param", "attrs": {"x": True}}]
    assert oracle.parse("<PARAM x>") == []


def test_q10_empty_tag_dropped():
    assert oracle.parse("<>") == []


def test_q11_truncated_tag_coordinate():
    # clause 4: '<' while in tag emits a truncated coordinate; its name
    # parse drops '<' and '/' chars and the (exclusive) final char
    assert oracle.compose("<div<p>x</p>") == [(0, 3), (4, 6), (7, 7), (8, 11)]
    # '<div' truncated -> name 'di' (subs end-exclusive drops 'v'),
    # never closed -> dropped; p survives
    assert names(oracle.parse("<div<p>x</p>")) == ["p"]


def test_q12_doctype_is_parser_void():
    nodes = oracle.parse("<!DOCTYPE html><html><p>xx</p></html>")
    assert names(nodes) == ["!DOCTYPE", "html"]
    assert nodes[0]["attrs"] == {"html": True}


def test_q13_attr_order_preserved_roundtrip():
    html = '<div b="2" a="1" c="3">x</div>'
    assert oracle.to_html(oracle.parse(html)) == html


def test_q14_newline_absorbed_into_tag_name():
    # Q4: only a literal space terminates tag names; a newline is absorbed
    nodes = oracle.parse('<div\nid="z">x</div\nid="z">')
    # the whole '<div\nid="z">' loses only space/'>' terminators
    assert nodes[0]["name"] == 'div\nid="z"'


def test_traverse_adds_children_key_to_leaves():
    # Q9: traverse re-assocs children onto every surviving node
    nodes = oracle.parse("<div>x</div>")
    out = oracle.traverse(nodes, lambda n: n)
    assert out[0]["children"][0] == {
        "name": TEXT_NAME,
        "value": "x",
        "children": [],
    }
