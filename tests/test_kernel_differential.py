"""Differential tests: the vectorized kernel must match the char-exact
oracle bit-for-bit — on the golden corpus, on adversarial quirk inputs,
and on thousands of seeded random documents over a hostile alphabet.
"""

import numpy as np
import pytest

from dompa_spark import kernel, oracle
from dompa_spark.constants import TEXT_NAME

GOLDEN = [
    "<div>hello</div>",
    "<div>hello",
    "<div>hello</span>",
    "<div",
    "div>",
    "<>",
    "hello",
    "hello<div></div>",
    "<div></div>hello",
    "<hr />",
    '<meta name="route-pattern" content="/:user_id/:repository" data-turbo-transient>',
    '<div class="some test classes" data-attr="something" checked>hello</div>',
    '<b>bold</b><img src="img.png" />Hello, <span>wor<i>l<b>d</b></i></span>',
    "<div><p>hello</p><p>world</p></div>",
    "a",
    "<div></div>h",
    '<div data-x="a>b">x</div>',
    "<b><i>x</b></i>",
    "<!-- note --><p>x</p>",
    '<div a="1" b="2" a="3">x</div>',
    "<div a='x'>y</div>",
    "<p>5 &gt; 3</p>",
    "<p>5 > 3</p>",
    "<param x>",
    "<PARAM x>",
    '<input type="checkbox" checked />',
    "<div<p>x</p>",
    "<!DOCTYPE html><html><p>xx</p></html>",
    '<div\nid="z">x</div\nid="z">',
    "",
    "<",
    ">",
    ">>",
    "<<",
    "<<<>>>",
    "é",
    "héllo wörld",
    "<div>héllo</div>ü",
    "<p>漢字テスト content</p>",
]


def flat_to_tree(doc: kernel.FlatDoc):
    """FlatDoc -> oracle-style nested dicts (presence semantics preserved)."""
    n = len(doc)
    nodes = []
    for i in range(n):
        if doc.name[i] == TEXT_NAME:
            nodes.append({"name": TEXT_NAME, "value": doc.value[i]})
        else:
            nodes.append({"name": doc.name[i], "attrs": doc.attrs[i]})
    roots = []
    for i in range(n):
        p = doc.parent[i]
        if p < 0:
            roots.append(nodes[i])
        else:
            nodes[p].setdefault("children", []).append(nodes[i])
    return roots


@pytest.mark.parametrize("html", GOLDEN, ids=range(len(GOLDEN)))
def test_golden_compose(html):
    assert kernel.compose_coords(html) == oracle.compose(html)


@pytest.mark.parametrize("html", GOLDEN, ids=range(len(GOLDEN)))
def test_golden_tree(html):
    assert flat_to_tree(kernel.parse_flat(html)) == oracle.parse(html)


@pytest.mark.parametrize("html", GOLDEN, ids=range(len(GOLDEN)))
def test_golden_serialize(html):
    assert kernel.serialize_flat(kernel.parse_flat(html)) == oracle.to_html(
        oracle.parse(html)
    )


@pytest.mark.parametrize("html", GOLDEN, ids=range(len(GOLDEN)))
def test_golden_extract(html):
    doc = [{"kind": "html", "text": html, "media_ref": None, "offset": 0}]
    assert kernel.extract_document(doc) == oracle.extract_document(doc)


def test_fixture_roundtrip_through_kernel():
    import os

    path = "/root/reference/test/dompa/html/michiel_borkent.html"
    if not os.path.exists(path):
        pytest.skip("reference fixture absent")
    with open(path, encoding="utf-8") as f:
        html = f.read()
    flat = kernel.parse_flat(html)
    assert kernel.serialize_flat(flat) == html
    assert flat_to_tree(flat) == oracle.parse(html)
    doc = [{"kind": "html", "text": html, "media_ref": None, "offset": 0}]
    assert kernel.extract_document(doc) == oracle.extract_document(doc)


# --- seeded random fuzz over a hostile alphabet ----------------------------

ALPHABET = list('<>/"= abdiv\nptext!-.\'&;é漢')
TAGS = ["div", "p", "span", "a", "b", "i", "img", "br", "hr", "meta",
        "script", "nav", "ul", "li", "PARAM", "param", "h1", "!DOCTYPE"]
ATTRS = ['', ' class="x y"', " checked", ' href="/a?b=c"', " a='q'",
         ' data-x="a>b"', ' a="1" a="2"', ' src="im.png"', ' k="v" /',
         " x= y", ' ="odd"', '  double  spaced="v"']


def random_doc(rng) -> str:
    kind = rng.integers(0, 3)
    if kind == 0:
        # pure character soup — exercises the tokenizer FSM quirks
        n = int(rng.integers(0, 60))
        return "".join(rng.choice(ALPHABET, n))
    # structured-ish markup with injected malformations
    parts = []
    depth = 0
    for _ in range(int(rng.integers(1, 25))):
        r = rng.random()
        if r < 0.35:
            tag = TAGS[int(rng.integers(0, len(TAGS)))]
            attr = ATTRS[int(rng.integers(0, len(ATTRS)))]
            close = " /" if rng.random() < 0.15 else ""
            parts.append(f"<{tag}{attr}{close}>")
            depth += 1
        elif r < 0.6 and depth >= 0:
            tag = TAGS[int(rng.integers(0, len(TAGS)))]
            parts.append(f"</{tag}>")
            depth -= 1
        elif r < 0.9:
            n = int(rng.integers(1, 12))
            parts.append("".join(rng.choice(ALPHABET, n)))
        else:
            parts.append(rng.choice(["<", ">", "<>", "<!-- c -->", "<div"]))
    return "".join(parts)


def _rewriter(node):
    """Deterministic traverser used for differential traverse tests."""
    if node["name"] == "b":
        return None
    if node["name"] == TEXT_NAME:
        return {**node, "value": node["value"][::-1]}
    return node


@pytest.mark.parametrize("html", GOLDEN, ids=range(len(GOLDEN)))
def test_golden_traverse(html):
    k_nodes = kernel.flat_to_nested(kernel.parse_flat(html))
    o_nodes = oracle.parse(html)
    assert kernel.traverse(k_nodes, _rewriter) == oracle.traverse(
        o_nodes, _rewriter
    )
    assert kernel.serialize_nodes(
        kernel.traverse(k_nodes, _rewriter)
    ) == oracle.to_html(oracle.traverse(o_nodes, _rewriter))


def test_fuzz_differential():
    rng = np.random.default_rng(42)
    for trial in range(3000):
        html = random_doc(rng)
        try:
            assert kernel.compose_coords(html) == oracle.compose(html), html
            k_tree = flat_to_tree(kernel.parse_flat(html))
            o_tree = oracle.parse(html)
            assert k_tree == o_tree, html
            assert kernel.serialize_flat(
                kernel.parse_flat(html)
            ) == oracle.to_html(o_tree), html
            doc = [{"kind": "html", "text": html, "media_ref": None, "offset": 0}]
            assert kernel.extract_document(doc) == oracle.extract_document(doc), html
        except AssertionError:
            print(f"FUZZ MISMATCH trial={trial} html={html!r}")
            raise
