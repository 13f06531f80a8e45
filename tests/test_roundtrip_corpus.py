"""Byte-identical round-trip over our own generated round-trip-safe
pages (independent of the reference's fixture file), through BOTH the
oracle and the vectorized kernel."""

from dompa_spark import corpus, kernel, oracle


def test_roundtrip_200_generated_pages():
    for i in range(200):
        html = corpus.gen_roundtrip_html(i, target_chars=2000 + 40 * i)
        flat = kernel.parse_flat(html)
        assert kernel.serialize_flat(flat) == html, i
        assert oracle.to_html(oracle.parse(html)) == html, i
        assert kernel.flat_to_nested(flat) == oracle.parse(html), i


def test_roundtrip_traverse_identity():
    html = corpus.gen_roundtrip_html(3)
    nodes = kernel.flat_to_nested(kernel.parse_flat(html))
    assert kernel.serialize_nodes(kernel.traverse(nodes, lambda n: n)) == html
