"""Extraction-heuristics golden corpus (FIXTURES.md §6) against the oracle.

The heuristics (tag whitelist -> bottom-up text density -> bottom-up link
density -> span emission) are this repo's frozen spec (constants.py,
SURVEY.md §2.6) — they are not in the reference.
"""

from dompa_spark import oracle


def html_span(text, offset=0):
    return {"kind": "html", "text": text, "media_ref": None, "offset": offset}


def out(kind, text=None, media_ref=None, offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_e01_boilerplate_head_stripped():
    body = "Main content paragraph with enough characters to pass the density gate."
    doc = [
        html_span(
            f"<html><head><title>T</title></head><body><p>{body}</p></body></html>"
        )
    ]
    assert oracle.extract_document(doc) == [out("text", body)]


def test_e02_link_dense_child_dropped():
    body = "Long enough body text for density."
    doc = [
        html_span(
            f'<div><p>{body}</p><div><a href="x">nav</a> <a href="y">more</a>'
            "</div></div>"
        )
    ]
    assert oracle.extract_document(doc) == [out("text", body)]


def test_e03_media_passthrough_interleaved():
    doc = [
        html_span("<p>Before media text long enough to keep.</p>", 0),
        {"kind": "image", "text": None, "media_ref": "img://123", "offset": 1},
        html_span("<p>After media text long enough to keep.</p>", 2),
    ]
    assert oracle.extract_document(doc) == [
        out("text", "Before media text long enough to keep.", None, 0),
        out("media", None, "img://123", 1),
        out("text", "After media text long enough to keep.", None, 2),
    ]


def test_e04_script_dropped_img_kept():
    doc = [
        html_span(
            "<body><script>var x=1;</script>"
            '<p>Kept paragraph text content here.</p><img src="a.png"></body>'
        )
    ]
    assert oracle.extract_document(doc) == [
        out("text", "Kept paragraph text content here.", None, 0),
        out("media", None, "a.png", 1),
    ]


def test_text_kind_passthrough():
    doc = [
        {"kind": "text", "text": "plain text span", "media_ref": None, "offset": 0},
        html_span("<p>Html span with enough text to keep around.</p>", 1),
    ]
    assert oracle.extract_document(doc) == [
        out("text", "plain text span", None, 0),
        out("text", "Html span with enough text to keep around.", None, 1),
    ]


def test_offsets_reorder_and_densify():
    # input spans processed in ascending offset order, output offsets dense
    doc = [
        {"kind": "video", "text": None, "media_ref": "v://9", "offset": 5},
        {"kind": "text", "text": "first", "media_ref": None, "offset": 2},
    ]
    assert oracle.extract_document(doc) == [
        out("text", "first", None, 0),
        out("media", None, "v://9", 1),
    ]


def test_short_doc_fully_dropped():
    # td(html) too low everywhere, no media -> nothing survives
    assert oracle.extract_document([html_span("<div><p>tiny</p></div>")]) == []


def test_nav_whitelist_drop():
    body = "Real article body text that is long enough to stay."
    doc = [
        html_span(
            f'<body><nav><a href="/">home</a><a href="/x">x</a></nav>'
            f"<article><p>{body}</p></article></body>"
        )
    ]
    assert oracle.extract_document(doc) == [out("text", body)]
