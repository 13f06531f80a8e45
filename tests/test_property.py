"""Property-based differential tests (hypothesis) + corpus-grammar
differential: kernel == oracle on arbitrary text over a hostile alphabet
and on 1,000 docs of the full synthetic grammar (malformed, comments,
entities, media interleave, heavy tail)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from dompa_spark import corpus, kernel, oracle

ALPHABET = st.sampled_from(list('<>/"= abdivptex!-.\'&;é漢\n\t\x00'))
HTML = st.text(alphabet=ALPHABET, min_size=0, max_size=120)


@settings(max_examples=500, deadline=None)
@given(HTML)
def test_compose_matches_oracle(html):
    assert kernel.compose_coords(html) == oracle.compose(html)


@settings(max_examples=500, deadline=None)
@given(HTML)
def test_parse_serialize_extract_match_oracle(html):
    o_nodes = oracle.parse(html)
    flat = kernel.parse_flat(html)
    assert kernel.flat_to_nested(flat) == o_nodes
    assert kernel.serialize_flat(flat) == oracle.to_html(o_nodes)
    doc = [{"kind": "html", "text": html, "media_ref": None, "offset": 0}]
    assert kernel.extract_document(doc) == oracle.extract_document(doc)


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=60))  # fully arbitrary unicode
def test_arbitrary_unicode_matches_oracle(html):
    assert kernel.compose_coords(html) == oracle.compose(html)
    assert kernel.flat_to_nested(kernel.parse_flat(html)) == oracle.parse(html)


def test_corpus_grammar_differential():
    mismatches = []
    checked = 0
    for i in range(1000):
        doc_id, spans = corpus.gen_doc(i)
        # cap at 20k chars: the oracle's per-level interval filtering is
        # O(k^2) like the reference's (coordinates.cljc:169-187) — heavy
        # docs are grammar-identical, and the Spark e2e suite covers the
        # full distribution through the kernel
        if sum(len(s["text"] or "") for s in spans) > 20_000:
            continue
        checked += 1
        if kernel.extract_document(spans) != oracle.extract_document(spans):
            mismatches.append(doc_id)
    assert mismatches == []
    assert checked > 900
