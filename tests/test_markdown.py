"""Markdown rendering (constants.py "Markdown rendering" spec).

Unit tests pin every block/inline rule on hand-written HTML; the
differential test re-derives the spec as an INDEPENDENT renderer over
the ORACLE parser (different parser, different recursion style) and
checks byte-identical markdown on the messy synthesized corpus —
malformed tags, comments, entities, heavy-tail docs included."""

import pyspark.sql.functions as F
import pytest

from dompa_spark import corpus, kernel, oracle, pipeline, textops
from dompa_spark.constants import (
    DROP_TAGS,
    MD_CONTAINERS,
    MD_HEADINGS,
    TEXT_NAME,
)


def md(html: str) -> str:
    return "\n\n".join(kernel.markdown_blocks(html))


# ---------------------------------------------------------------------------
# Block rules
# ---------------------------------------------------------------------------

def test_headings_all_levels():
    html = "".join(f"<h{i}>t{i}</h{i}>" for i in range(1, 7))
    assert md(html) == "\n\n".join("#" * i + f" t{i}" for i in range(1, 7))


def test_empty_heading_keeps_marker_rstripped():
    assert md("<h2></h2>") == "##"


def test_paragraph_stripped_and_empty_dropped():
    assert md("<p>  a b  </p><p>   </p><p>c</p>") == "a b\n\nc"


def test_implicit_paragraph_flushes_at_block_boundary():
    assert md("loose <b>x</b><h1>H</h1>tail") == "loose **x**\n\n# H\n\ntail"


def test_blockquote_and_empty_dropped():
    assert md("<blockquote> q </blockquote><blockquote></blockquote>") == "> q"


def test_ul_ol_direct_li_only_and_nested_markup():
    html = ("<ul><li>a</li><li>b <b>c</b></li><p>decoy</p></ul>"
            "<ol><li>x</li><li>y</li></ol>")
    assert md(html) == "- a\n- b **c**\n\n1. x\n2. y"


def test_empty_list_emits_nothing():
    assert md("<ul><p>no items</p></ul>") == ""


def test_pre_fenced_rawtext_keeps_markup_text_unstripped():
    assert md("<pre> a <b>bold</b>\nc </pre>") == "```\n a bold\nc \n```"


def test_hr_and_container_recursion():
    assert md("<div><section>inner</section><hr></div>") == "inner\n\n---"


def test_table_with_thead_tbody_and_separator():
    html = ("<table><thead><tr><th>h1</th><th>h2</th></tr></thead>"
            "<tbody><tr><td>a</td><td>b</td></tr></tbody></table>")
    assert md(html) == "| h1 | h2 |\n| --- | --- |\n| a | b |"


def test_orphan_tr_renders_inline_not_table():
    # a tr outside any table is transparent inline content
    assert md("<tr><td>x</td></tr>") == "x"


def test_empty_table_and_cell_less_row():
    assert md("<table><tr></tr></table>") == ""


def test_drop_tags_subtrees_vanish_block_and_inline():
    html = ("<p>keep <script>var x;</script>also</p>"
            "<nav><a href='u'>menu</a></nav><h1>H</h1>")
    assert md(html) == "keep also\n\n# H"


def test_comment_dropped():
    assert md("<p>a<!-- hidden -->b</p>") == "ab"


# ---------------------------------------------------------------------------
# Inline rules
# ---------------------------------------------------------------------------

def test_inline_emphasis_code_link_image_br():
    html = ('<p><b>b</b> <strong>s</strong> <i>i</i> <em>e</em> '
            '<code>c</code> <a href="u">t</a> '
            '<img src="s.png" alt="A"> x<br>y</p>')
    assert md(html) == "**b** **s** *i* *e* `c` [t](u) ![A](s.png) x\ny"


def test_empty_emphasis_never_bare_markers():
    assert md("<p>a<b></b><i></i><code></code>b</p>") == "ab"


def test_boolean_and_missing_attrs_render_empty():
    assert md('<p><a href>x</a><img src alt="a"><img></p>') == "[x]()![a]()![]()"


def test_unknown_elements_transparent():
    assert md("<p><span>a <u>b</u></span></p>") == "a b"


# ---------------------------------------------------------------------------
# Document form (spans)
# ---------------------------------------------------------------------------

def test_document_cols_span_order_and_kinds():
    blocks = kernel.markdown_document_cols(
        ["media", "html", "text", "text"],
        [None, "<h1>T</h1>", "  plain  ", "   "],
        ["m://x", None, None, None],
        [2, 0, 1, 3],
    )
    assert blocks == ["# T", "plain", "![](m://x)"]


def test_document_cols_null_media_ref():
    assert kernel.markdown_document_cols(
        ["image"], [None], [None], [0]
    ) == ["![]()"]


# ---------------------------------------------------------------------------
# Differential: independent renderer over the ORACLE parser
# ---------------------------------------------------------------------------

def _ref_inline(n) -> str:
    name = n["name"]
    if name == TEXT_NAME:
        return n.get("value") or ""
    if name in DROP_TAGS or name.startswith("!--"):
        return ""
    kids = "".join(_ref_inline(c) for c in n.get("children") or [])
    if name in ("b", "strong"):
        return f"**{kids}**" if kids else ""
    if name in ("i", "em"):
        return f"*{kids}*" if kids else ""
    if name == "code":
        return f"`{kids}`" if kids else ""
    if name == "a":
        href = (n.get("attrs") or {}).get("href")
        return f"[{kids}]({href if isinstance(href, str) else ''})"
    if name == "img":
        at = n.get("attrs") or {}
        alt, src = at.get("alt"), at.get("src")
        return (f"![{alt if isinstance(alt, str) else ''}]"
                f"({src if isinstance(src, str) else ''})")
    if name == "br":
        return "\n"
    return kids


def _ref_raw(n) -> str:
    if n["name"] == TEXT_NAME:
        return n.get("value") or ""
    if n["name"] in DROP_TAGS or n["name"].startswith("!--"):
        return ""
    return "".join(_ref_raw(c) for c in n.get("children") or [])


def _ref_blocks(nodes) -> list[str]:
    out: list[str] = []
    pend = ""

    def flush():
        nonlocal pend
        if pend.strip():
            out.append(pend.strip())
        pend = ""

    for n in nodes:
        name = n["name"]
        if name == TEXT_NAME:
            pend += n.get("value") or ""
            continue
        if name in DROP_TAGS or name.startswith("!--"):
            continue
        kids = n.get("children") or []
        if name in MD_HEADINGS:
            flush()
            t = "".join(_ref_inline(c) for c in kids).strip()
            out.append(("#" * int(name[1]) + " " + t).rstrip())
        elif name == "p":
            flush()
            t = "".join(_ref_inline(c) for c in kids).strip()
            if t:
                out.append(t)
        elif name == "blockquote":
            flush()
            t = "".join(_ref_inline(c) for c in kids).strip()
            if t:
                out.append("> " + t)
        elif name in ("ul", "ol"):
            flush()
            lis = [c for c in kids if c["name"] == "li"]
            lines = [
                ("- " if name == "ul" else f"{i + 1}. ")
                + "".join(
                    _ref_inline(c) for c in li.get("children") or []
                ).strip()
                for i, li in enumerate(lis)
            ]
            if lines:
                out.append("\n".join(lines))
        elif name == "pre":
            flush()
            out.append("```\n" + "".join(_ref_raw(c) for c in kids) + "\n```")
        elif name == "hr":
            flush()
            out.append("---")
        elif name == "table":
            flush()
            trs = []
            for c in kids:
                if c["name"] == "tr":
                    trs.append(c)
                elif c["name"] in ("thead", "tbody", "tfoot"):
                    trs += [
                        cc for cc in c.get("children") or []
                        if cc["name"] == "tr"
                    ]
            lines = []
            for tr in trs:
                cells = [
                    c for c in tr.get("children") or []
                    if c["name"] in ("td", "th")
                ]
                if not cells:
                    continue
                lines.append("| " + " | ".join(
                    "".join(
                        _ref_inline(x) for x in c.get("children") or []
                    ).strip()
                    for c in cells
                ) + " |")
                if len(lines) == 1:
                    lines.append("|" + " --- |" * len(cells))
            if lines:
                out.append("\n".join(lines))
        elif name in MD_CONTAINERS:
            flush()
            out.extend(_ref_blocks(kids))
        else:
            pend += _ref_inline(n)
    flush()
    return out


def _ref_markdown(spans) -> str:
    blocks: list[str] = []
    for s in sorted(
        enumerate(spans), key=lambda t: (t[1]["offset"], t[0])
    ):
        s = s[1]
        if s["kind"] == "html":
            blocks.extend(_ref_blocks(oracle.parse(s["text"] or "")))
        elif s["kind"] == "text":
            t = (s["text"] or "").strip()
            if t:
                blocks.append(t)
        else:
            blocks.append(f"![]({s['media_ref'] or ''})")
    return "\n\n".join(blocks)


def test_differential_vs_oracle_parser_on_messy_corpus():
    for i in range(300):
        doc_id, spans = corpus.gen_doc(i)
        got = "\n\n".join(
            kernel.markdown_document_cols(
                [s["kind"] for s in spans],
                [s["text"] for s in spans],
                [s["media_ref"] for s in spans],
                [s["offset"] for s in spans],
            )
        )
        assert got == _ref_markdown(spans), doc_id


def test_no_boilerplate_text_in_messy_corpus_markdown():
    # script/style/nav/... text must never surface in any rendered doc
    for i in range(80):
        _, spans = corpus.gen_doc(i)
        out = "\n\n".join(
            kernel.markdown_document_cols(
                [s["kind"] for s in spans],
                [s["text"] for s in spans],
                [s["media_ref"] for s in spans],
                [s["offset"] for s in spans],
            )
        )
        assert "var x=1;" not in out


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs_df(spark):
    rows = []
    for i in range(40):
        doc_id, spans = corpus.gen_doc(i)
        rows.append((doc_id, spans))
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_to_markdown_df_matches_kernel(spark, docs_df):
    got = {
        r.doc_id: (r.markdown, r.n_blocks)
        for r in pipeline.to_markdown_df(docs_df).collect()
    }
    for i in range(40):
        doc_id, spans = corpus.gen_doc(i)
        blocks = kernel.markdown_document_cols(
            [s["kind"] for s in spans],
            [s["text"] for s in spans],
            [s["media_ref"] for s in spans],
            [s["offset"] for s in spans],
        )
        assert got[doc_id] == ("\n\n".join(blocks), len(blocks))


def test_to_markdown_df_null_spans_row(spark):
    df = spark.createDataFrame(
        [("d0", None)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    assert pipeline.to_markdown_df(df).collect()[0].asDict() == {
        "doc_id": "d0", "markdown": "", "n_blocks": 0,
    }


def test_markdown_plan_is_single_map_stage(spark, docs_df):
    plan = (
        pipeline.to_markdown_df(docs_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Generate" not in plan


def test_markdown_wrapped_fixture_shape(spark):
    df = spark.createDataFrame(
        [(7, "alpha beta gamma"), (10, "delta eps")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in pipeline.to_markdown_df(
            textops.markdown_wrapped(df)
        ).collect()
    }
    assert out["7"].n_blocks == 11  # no ol branch
    assert out["10"].n_blocks == 12  # doc_id % 5 == 0 adds the ol
    assert out["7"].markdown.startswith("# Title 7\n\nalpha beta gamma")
    assert "1. o1 10\n2. o2" in out["10"].markdown
    assert out["7"].markdown.endswith("![](media://md/7)")
