"""DSL (`h` == reference `$`, `defhtml`) — cases ported from
/root/reference/test/dompa/nodes_test.cljc:16-117.
"""

from dompa_spark.constants import FRAGMENT_NAME, TEXT_NAME
from dompa_spark.dsl import defhtml, el, h
from dompa_spark.kernel import serialize_nodes


def t(v):
    return {"name": TEXT_NAME, "value": v}


def test_simple_node():
    assert h(el("div"), "hello world") == {
        "name": "div",
        "children": [t("hello world")],
    }


def test_fragment_node():
    got = h(
        el(":<>"),
        h(el("span"), h("hello")),
        h(el("span"), h("world")),
    )
    assert got == {
        "name": FRAGMENT_NAME,
        "children": [
            {"name": "span", "children": [t("hello")]},
            {"name": "span", "children": [t("world")]},
        ],
    }


def test_nil_node():
    assert h(None) is None


def test_string_node():
    assert h("hello world") == t("hello world")


def test_multi_subnodes_stringified():
    assert h("hello", 12345, None, 123.3, "world") == {
        "name": FRAGMENT_NAME,
        "children": [t("hello"), t("12345"), t("123.3"), t("world")],
    }


def test_nested_seq_becomes_fragment():
    inner = [h(c) for c in "world"]
    got = h("hello", 12345, inner)
    assert got == {
        "name": FRAGMENT_NAME,
        "children": [
            t("hello"),
            t("12345"),
            {"name": FRAGMENT_NAME, "children": [t(c) for c in "world"]},
        ],
    }


def test_deep_nested_fragments():
    got = h("hello", [h("w"), [h("o"), h("r"), [h("l"), h("d")]]])
    assert serialize_nodes([got]) == "helloworld"


def test_attrs_map_detected():
    got = h(el("a"), {"href": "/x", "download": True}, "file")
    assert got == {
        "name": "a",
        "attrs": {"href": "/x", "download": True},
        "children": [t("file")],
    }
    assert serialize_nodes([got]) == '<a href="/x" download>file</a>'


def test_defhtml_decorator():
    @defhtml
    def hello(who):
        return h(el("div"), h("hello ", who))

    assert hello("world") == "<div>hello world</div>"


def test_defhtml_list_items():
    @defhtml
    def list_items(items):
        return h(el("ul"), [h(el("li"), item) for item in items])

    assert list_items(["one", "two", "three"]) == (
        "<ul><li>one</li><li>two</li><li>three</li></ul>"
    )
