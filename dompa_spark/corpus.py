"""Deterministic synthetic corpus generator (FIXTURES.md §7).

Generates the interleaved text+media documents table of exactly the
BASELINE input_hint shape:

    doc_id : string
    spans  : array<struct<kind, text, media_ref, offset:int32>>

Each document's content is derived ONLY from (seed, doc index) via a
per-document numpy Generator, so generation is order- and
chunking-independent: any subset of docs can be (re)generated anywhere
and is bit-identical — this is what makes the scale corpus reproducible
across parallelism levels without shipping data.

The grammar exercises the full quirk surface: malformed docs (unclosed /
mismatched / crossed tags, bare '<'/'>', 1-char docs), comments,
entities, single-quoted and duplicate attrs, boilerplate subtrees, a
log-normal size distribution with a heavy tail, and 1-4 media spans in
~10% of docs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = (
    "the quick brown fox jumps over lazy dog lorem ipsum dolor sit amet "
    "consectetur adipiscing elit sed do eiusmod tempor incididunt labore "
    "dolore magna aliqua enim minim veniam quis nostrud exercitation "
    "content article paragraph heading navigation sidebar footer banner "
    "spark parquet arrow batch shuffle partition executor driver kernel"
).split()

_CONTENT_TAGS = [
    "div", "p", "span", "a", "li", "ul", "ol", "h1", "h2", "h3", "b", "i",
    "strong", "em", "article", "section", "blockquote", "pre", "code",
    "table", "tr", "td",
]
_VOID_TAGS = ["br", "hr", "img", "input", "meta", "link"]
_BOILER_TAGS = ["script", "style", "nav", "aside", "footer", "header", "form"]
_ENTITIES = ["&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;"]
_JUNK = ["<", ">", "<>", "<div", "div>", "<PARAM x>", "<!-- hidden -->",
         "a", "<b><i>x</b></i>"]

SEED = 42


def _text_run(rng, max_words=14) -> str:
    k = int(rng.integers(1, max_words))
    words = [_WORDS[int(w)] for w in rng.integers(0, len(_WORDS), k)]
    if rng.random() < 0.08:
        words.insert(int(rng.integers(0, len(words))),
                     _ENTITIES[int(rng.integers(0, len(_ENTITIES)))])
    return " ".join(words)


def _attrs(rng) -> str:
    r = rng.random()
    if r < 0.5:
        return ""
    parts = []
    n_attrs = int(rng.integers(1, 4))
    keys = ["class", "id", "href", "data-x", "title", "role"]
    for _ in range(n_attrs):
        k = keys[int(rng.integers(0, len(keys)))]
        r2 = rng.random()
        if r2 < 0.10:
            parts.append(k)  # boolean attr
        elif r2 < 0.12:
            parts.append(f"{k}='sq{int(rng.integers(0, 99))}'")  # single-quoted
        else:
            parts.append(f'{k}="v{int(rng.integers(0, 999))} w{int(rng.integers(0, 99))}"')
    if rng.random() < 0.02 and parts:
        parts.append(parts[0])  # duplicate key
    return " " + " ".join(parts)


def _gen_html(rng, target_chars: int, malformed: bool) -> str:
    parts: list[str] = []
    stack: list[str] = []
    size = 0
    while size < target_chars:
        r = rng.random()
        if r < 0.30 and len(stack) < 12:
            if rng.random() < 0.12:
                tag = _BOILER_TAGS[int(rng.integers(0, len(_BOILER_TAGS)))]
            else:
                tag = _CONTENT_TAGS[int(rng.integers(0, len(_CONTENT_TAGS)))]
            piece = f"<{tag}{_attrs(rng)}>"
            stack.append(tag)
        elif r < 0.45 and stack:
            if malformed and rng.random() < 0.25:
                # mismatched closer (dropped by the parser) or skipped close
                piece = f"</{_CONTENT_TAGS[int(rng.integers(0, len(_CONTENT_TAGS)))]}>"
            else:
                piece = f"</{stack.pop()}>"
        elif r < 0.52:
            tag = _VOID_TAGS[int(rng.integers(0, len(_VOID_TAGS)))]
            if tag == "img":
                piece = f'<img src="im{int(rng.integers(0, 9999))}.png"{" /" if rng.random() < 0.3 else ""}>'
            else:
                piece = f"<{tag}{_attrs(rng)}>"
        elif r < 0.55 and rng.random() < 0.5:
            piece = f"<!-- {_text_run(rng, 4)} -->"
        elif malformed and r < 0.60:
            piece = _JUNK[int(rng.integers(0, len(_JUNK)))]
        else:
            piece = _text_run(rng)
        parts.append(piece)
        size += len(piece)
    if not malformed or rng.random() < 0.5:
        while stack:
            parts.append(f"</{stack.pop()}>")
    return "".join(parts)


def gen_roundtrip_html(i: int, seed: int = SEED, target_chars: int = 4000) -> str:
    """Round-trip-SAFE page: properly nested, double-quoted single-spaced
    attrs, voids without '/', no comments/malformed tokens — the subset
    where parse∘serialize must be byte-identical (our own stand-in for
    the reference's fixture test, independent of /root/reference)."""
    rng = np.random.default_rng([seed, 7_000_003, i])
    parts = ["<!DOCTYPE html><html><head>"]
    parts.append(f"<title>{_text_run(rng, 5)}</title>")
    parts.append('<meta charset="utf-8"><link href="c.css" rel="stylesheet">')
    parts.append("</head><body>")
    stack = ["body"]
    size = 0
    while size < target_chars:
        r = rng.random()
        if r < 0.3 and len(stack) < 10:
            tag = _CONTENT_TAGS[int(rng.integers(0, len(_CONTENT_TAGS)))]
            n_attrs = int(rng.integers(0, 3))
            attrs = "".join(
                f' data-k{j}="v{int(rng.integers(0, 99))}"' for j in range(n_attrs)
            )
            piece = f"<{tag}{attrs}>"
            stack.append(tag)
        elif r < 0.5 and len(stack) > 1:
            piece = f"</{stack.pop()}>"
        elif r < 0.58:
            piece = f'<img src="i{int(rng.integers(0, 999))}.png">' \
                if rng.random() < 0.5 else "<br>"
        else:
            piece = _text_run(rng)
        parts.append(piece)
        size += len(piece)
    while len(stack) > 1:
        parts.append(f"</{stack.pop()}>")
    parts.append("</body></html>")
    return "".join(parts)


def gen_doc(i: int, seed: int = SEED):
    """Generate document i -> (doc_id, spans list). Pure in (seed, i)."""
    rng = np.random.default_rng([seed, i])
    doc_id = f"doc-{i:08d}"
    # log-normal sizes, median ~1 KB; 1% heavy tail ~x100
    target = int(np.exp(rng.normal(np.log(900.0), 0.9)))
    if rng.random() < 0.01:
        target *= 100
    target = max(8, min(target, 2_000_000))
    malformed = rng.random() < 0.05
    if rng.random() < 0.004:
        # pathological micro-docs exercising Q2/Q10 etc.
        html = ["a", "<", ">", "<>", "<div", "x<p>y</p>z"][int(rng.integers(0, 6))]
        return doc_id, [
            {"kind": "html", "text": html, "media_ref": None, "offset": 0}
        ]
    n_media = int(rng.integers(1, 5)) if rng.random() < 0.10 else 0
    n_html = 1 + (int(rng.integers(0, 2)) if n_media else 0)
    spans = []
    for j in range(n_html + n_media):
        if j < n_html:
            spans.append(
                {
                    "kind": "html",
                    "text": _gen_html(rng, target // n_html, malformed),
                    "media_ref": None,
                    "offset": j,
                }
            )
        else:
            kind = ["image", "video", "audio"][int(rng.integers(0, 3))]
            spans.append(
                {
                    "kind": kind,
                    "text": None,
                    "media_ref": f"{kind}://blob/{int(rng.integers(0, 10**9))}",
                    "offset": j,
                }
            )
    # interleave media between html spans deterministically: re-assign
    # offsets by a fixed permutation of positions
    order = rng.permutation(len(spans))
    for pos, j in enumerate(order):
        spans[int(j)]["offset"] = pos
    return doc_id, spans


def gen_batch(lo: int, hi: int, seed: int = SEED) -> pa.Table:
    doc_ids = []
    span_col = []
    for i in range(lo, hi):
        doc_id, spans = gen_doc(i, seed)
        doc_ids.append(doc_id)
        span_col.append(spans)
    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(span_col, span_type),
        }
    )


def _write_one(args) -> None:
    path, fidx, lo, hi, seed = args
    table = gen_batch(lo, hi, seed)
    pq.write_table(
        table,
        os.path.join(path, f"part-{fidx:05d}.parquet"),
        row_group_size=2_000,
        compression="zstd",
    )


def write_corpus(path: str, n_docs: int, seed: int = SEED,
                 rows_per_file: int = 20_000, procs: int = 0) -> None:
    """Write the corpus as a parquet directory (row-group per ~2k docs so
    Spark's maxPartitionBytes splitting keeps input splits balanced).
    Per-doc seeding makes parallel generation bit-identical to serial."""
    os.makedirs(path, exist_ok=True)
    jobs = [
        (path, fidx, lo, min(lo + rows_per_file, n_docs), seed)
        for fidx, lo in enumerate(range(0, n_docs, rows_per_file))
    ]
    if procs == 0:
        procs = min(16, os.cpu_count() or 1, len(jobs))
    if procs <= 1 or len(jobs) <= 1:
        for j in jobs:
            _write_one(j)
    else:
        import multiprocessing as mp

        with mp.Pool(procs) as pool:
            pool.map(_write_one, jobs)
