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


# ---------------------------------------------------------------------------
# Head-dispatch divergence, pinned (VERDICT r01 item 8).
#
# The reference `$` dispatches on `(keyword? (first opts))`
# (nodes.cljc:194-197): keyword head -> element (node-from-opts,
# nodes.cljc:161-174), anything else -> text/fragment (nodes-from-opts,
# nodes.cljc:176-183). Python has no keyword type and plain strings ARE
# the text payload, so `h` treats only `el(...)`-wrapped heads as element
# names. These tests pin the adapted behavior explicitly so the
# divergence is a documented contract, not an accident.
# ---------------------------------------------------------------------------

def test_plain_string_head_is_text_not_element():
    """`($ :div "hello")` (nodes_test.cljc:35-39) needs el("div") here;
    a PLAIN "div" head takes the nodes-from-opts path like any string
    (nodes.cljc:176-183) and must NOT silently become an element."""
    got = h("div", "hello")
    assert got == {
        "name": FRAGMENT_NAME,
        "children": [t("div"), t("hello")],
    }


def test_el_head_matches_keyword_dispatch():
    """el("div") == :div head: same structure as nodes_test.cljc:35-39."""
    assert h(el("div"), "hello world") == {
        "name": "div",
        "children": [t("hello world")],
    }


def test_none_child_in_element_path_stringifies_empty():
    """node-from-opts does NOT drop nil children — nodes-from-opt's
    :else branch renders (str nil) = "" (nodes.cljc:157-159, 167-173);
    only the non-keyword path removes nils (nodes.cljc:177)."""
    assert h(el("div"), None) == {
        "name": "div",
        "children": [t("")],
    }
    assert h(el("div"), "a", None, "b") == {
        "name": "div",
        "children": [t("a"), t(""), t("b")],
    }


def test_element_with_attrs_only_has_no_children_key():
    """(seq children-nodes) gates the :node/children key
    (nodes.cljc:173-174): attrs-only and bare elements omit it."""
    assert h(el("div"), {"class": "x"}) == {
        "name": "div",
        "attrs": {"class": "x"},
    }
    assert h(el("hr")) == {"name": "hr"}


def test_attrs_dict_with_name_key_is_child_not_attrs():
    """A second opt that IS a node (contains the name key) must be a
    child, not attrs — mirrors the (contains? second-op :node/name)
    guard (nodes.cljc:165-166)."""
    child = {"name": "span", "children": [t("x")]}
    assert h(el("div"), child) == {"name": "div", "children": [child]}


def test_deep_nested_fragment_structure_exact():
    """Structural (not just serialized) port of nodes_test.cljc:94-117."""
    got = h(
        "hello",
        [h("w"), [h("o"), h("r"), [h("l"), h("d")]]],
    )
    assert got == {
        "name": FRAGMENT_NAME,
        "children": [
            t("hello"),
            {
                "name": FRAGMENT_NAME,
                "children": [
                    t("w"),
                    {
                        "name": FRAGMENT_NAME,
                        "children": [
                            t("o"),
                            t("r"),
                            {
                                "name": FRAGMENT_NAME,
                                "children": [t("l"), t("d")],
                            },
                        ],
                    },
                ],
            },
        ],
    }
