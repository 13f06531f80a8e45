"""Training-data pipeline operators over the documents/embeddings tables,
plus deterministic HTML-template builders that feed the extraction engine
from the plain-text documents table.

Operators are pyspark.sql.functions expressions (JVM-side) except four
deliberately Arrow-vectorized kernels — shingle construction + minhash
signatures (fused), shingle sets, simhash (narrow + wide), and SRP
bucketing — where the expression formulation forces Spark's
interpreted higher-order-function path over per-element md5/dot work
(measured 4-100x slower than the hashlib/numpy batch equivalent; the
flattened-batch reduceat forms avoid per-row numpy call overhead too —
see each kernel's docstring). Never row-at-a-time Python: the plan suite
asserts no BatchEvalPython on any query. Each operator has a matching
ANSI-SQL oracle in __spark_entry__.py; hash functions are built on md5
so Spark and DuckDB produce identical 60-bit integers, and the
vectorized kernels use pure int64 arithmetic so the parity is
bit-exact.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "in", "over", "do", "sit", "sed"]


# ---------------------------------------------------------------------------
# HTML template builders (documents.text -> interleaved spans input)
# ---------------------------------------------------------------------------

def span(kind, text, media_ref, offset: int) -> Column:
    return F.struct(
        F.lit(kind).alias("kind") if isinstance(kind, str) else kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        F.lit(offset).cast("int").alias("offset"),
    )


def html_span(text: Column, offset: int) -> Column:
    return span("html", text, F.lit(None).cast("string"), offset)


BOILER_TEMPLATE_PRE = (
    "<html><head><title>T</title><script>var x=1;</script></head>"
    '<body><nav><a href="/">home</a> <a href="/about">about</a></nav>'
    "<article><p>"
)
BOILER_TEMPLATE_POST = "</p></article></body></html>"

# Survival threshold for text wrapped as html>body>p with a var-length
# payload: the bottom-up chain html>body>article>p needs
# len >= 10 * 4 = 40 (each wrapper adds one element to tag_count).
# With payload length = n_chars % 80 the gate splits the corpus.
MAIN_TEXT_GATE = 40


def boiler_wrapped(df: DataFrame) -> DataFrame:
    """Wrap a variable-length prefix of each doc's text in a boilerplate
    page template; payload length = n_chars % 80 so the density gate
    (>= 40 chars survives) actually discriminates."""
    payload = F.expr("substring(text, 1, n_chars % 80)")
    html = F.concat(
        F.lit(BOILER_TEMPLATE_PRE), payload, F.lit(BOILER_TEMPLATE_POST)
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


ROUNDTRIP_PRE = '<div class="wrap main"><p id="c">'
ROUNDTRIP_POST = '</p><img src="x.png"></div>'


def roundtrip_wrapped(df: DataFrame) -> DataFrame:
    html = F.concat(F.lit(ROUNDTRIP_PRE), F.col("text"), F.lit(ROUNDTRIP_POST))
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def wordlist_wrapped(df: DataFrame) -> DataFrame:
    """One <li> per word: node-count statistics become SQL-predictable."""
    html = F.concat(
        F.lit("<ul><li>"),
        F.regexp_replace("text", " ", "</li><li>"),
        F.lit("</li></ul>"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


LINKY_CLOSING = "Closing remarks long enough to pass the density gates."


def interleaved_wrapped(df: DataFrame) -> DataFrame:
    """Three spans per doc: html paragraph, media ref derived from the
    source column, html closing paragraph."""
    p1 = F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>"))
    p2 = F.lit(f"<p>{LINKY_CLOSING}</p>")
    media = F.concat(F.lit("media://"), F.col("source"), F.lit("/"),
                     F.col("doc_id").cast("string"))
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            html_span(p1, 0),
            span("image", F.lit(None).cast("string"), media, 1),
            html_span(p2, 2),
        ).alias("spans"),
    )


# Anchor text length 150 + n_chars % 100 ∈ [150, 249]; the link-density
# pass drops anchors with < 200 chars (LINK_DENSITY_TEXT_EXEMPT), keeps
# the rest — SQL-predictable either way.
def linkdense_wrapped(df: DataFrame) -> DataFrame:
    anchor_text = F.expr(
        "substring(repeat(concat(text, ' '), 6), 1, 150 + n_chars % 100)"
    )
    html = F.concat(
        F.lit("<div><p>"), F.col("text"), F.lit('</p><div><a href="#">'),
        anchor_text, F.lit("</a></div></div>"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def outlinks_wrapped(df: DataFrame) -> DataFrame:
    """Template with two href'd anchors (one carrying a second
    attribute) plus a bare name-anchor — the outlink-extraction
    fixture: hrefs and anchor text must come back through the REAL
    attr parser and parent-pointer tree, and the href-less <a> must
    not surface as an outlink."""
    sid = F.col("doc_id").cast("string")
    first_word = F.expr("element_at(split(text, ' '), 1)")
    html = F.concat(
        F.lit("<div><p>"), F.col("text"),
        F.lit('</p><ul><li><a href="https://ex.org/'), sid,
        F.lit('/0">first '), first_word,
        F.lit('</a></li><li><a href="https://ex.org/'), sid,
        F.lit('/1" rel="nofollow">second link</a></li></ul>'
              '<a name="top"></a></div>'),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def metadata_wrapped(df: DataFrame) -> DataFrame:
    """Full-page template with a <head> section — the html_metadata
    fixture. Engineered surface: a decoy meta (robots) and a decoy
    link (stylesheet) that must NOT be extracted; the description meta
    omitted for doc_id % 9 == 0 and the canonical link omitted for
    doc_id % 11 == 0 (the operator must emit NULL, not drop the row or
    grab the decoy); lang attribute keyed on doc_id % 7."""
    d = F.col("doc_id").cast("long")
    sid = F.col("doc_id").cast("string")
    first_word = F.expr("element_at(split(text, ' '), 1)")
    desc = F.when(
        d % 9 == 0, F.lit("")
    ).otherwise(
        F.concat(
            F.lit('<meta name="description" content="desc '), sid,
            F.lit(" "), first_word, F.lit('">'),
        )
    )
    canon = F.when(
        d % 11 == 0, F.lit("")
    ).otherwise(
        F.concat(
            F.lit('<link rel="canonical" href="https://ex.org/canon/'),
            sid, F.lit('">'),
        )
    )
    html = F.concat(
        F.lit('<html lang="en-'), (d % 7).cast("string"), F.lit('">'),
        F.lit("<head><title>Doc "), sid, F.lit(" "), first_word,
        F.lit("</title>"),
        desc,
        F.lit('<meta name="robots" content="noindex">'),
        canon,
        F.lit('<link rel="stylesheet" href="/s.css">'),
        F.lit("</head><body><p>"), F.col("text"),
        F.lit("</p></body></html>"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def _node_attr(node, key: str) -> Column:
    """Value of a node's first attribute named `key` (NULL if absent),
    through the REAL attr parser's (key, val) structs."""
    return F.get(
        F.filter(node["attrs"], lambda kv: kv["key"] == F.lit(key)), 0
    )["val"]


def html_metadata(nodes_df: DataFrame) -> DataFrame:
    """Page-metadata extraction from the flat parsed DOM — the head
    fields a crawl index keeps per page: <title> text, the description
    meta, the canonical link, and the html element's lang attribute.
    Input is parse_nodes_df's (doc_id, nodes) table; output one row per
    doc: (doc_id, title, meta_description, canonical_url, html_lang),
    NULL where the element/attribute is absent (one row per doc, never
    silently dropped). First match wins when markup repeats an element
    — the deterministic choice a malformed real-web page needs.

    Title contract: DIRECT child text nodes of the first <title>,
    concatenated in document order — same parent-pointer rule as
    outlink anchor text (markup nested inside <title> keeps its text).

    Scale shape: four F.filter/F.get HOF passes over each doc's
    in-memory nodes array — entirely map-side, zero shuffles, zero
    Python; composes with the chunk-staged extract pipeline's
    partitioning untouched."""
    from dompa_spark.constants import TEXT_NAME

    nodes = F.col("nodes")

    def first_named(name: str) -> Column:
        return F.get(F.filter(nodes, lambda n: n["name"] == name), 0)

    html_el = first_named("html")
    title_el = first_named("title")
    title_text = F.array_join(
        F.transform(
            F.filter(
                nodes,
                lambda n: (n["parent_id"] == title_el["node_id"])
                & (n["name"] == TEXT_NAME),
            ),
            lambda n: n["value"],
        ),
        "",
    )
    meta_desc = F.get(
        F.filter(
            nodes,
            lambda n: (n["name"] == "meta")
            & (_node_attr(n, "name") == F.lit("description")),
        ),
        0,
    )
    canonical = F.get(
        F.filter(
            nodes,
            lambda n: (n["name"] == "link")
            & (_node_attr(n, "rel") == F.lit("canonical")),
        ),
        0,
    )
    return nodes_df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(title_el.isNull(), F.lit(None).cast("string"))
        .otherwise(title_text)
        .alias("title"),
        _node_attr(meta_desc, "content").alias("meta_description"),
        _node_attr(canonical, "href").alias("canonical_url"),
        _node_attr(html_el, "lang").alias("html_lang"),
    )


# RFC 3986 authority parse, the RE2/Java-identical subset — ONE
# definition; anchor_text_agg, url_filter, and url_canon_cols all key
# hosts through here so cross-operator host keys cannot drift.
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_AUTHORITY_STRIP_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"  # no capture


def host_of(col: Column) -> Column:
    """Lowercased host (default-agnostic port strip) of a URL column;
    '' when there is no scheme://authority prefix."""
    hostport = F.lower(F.regexp_extract(col, _AUTHORITY_RE, 1))
    return F.regexp_replace(hostport, r":[0-9]+$", "")


def extract_outlinks_df(nodes_df: DataFrame) -> DataFrame:
    """Outlink/anchor extraction from the flat parsed DOM: hrefs via
    the real attr parser, anchor text via parent-pointer DIRECT child
    text nodes (markup nested inside an anchor keeps its own text —
    same contract as html_metadata's title). href-less anchors (name
    anchors) are excluded. Output: (doc_id, link_pos, href,
    anchor_text), link_pos = document-order index over the doc's
    href-carrying anchors.

    Scale shape: one map-side HOF pass over each doc's nodes array
    builds the per-doc link structs; the posexplode is the only
    Generate, emitting one slim row per link — the nodes array itself
    never leaves the projection."""
    from dompa_spark.constants import TEXT_NAME

    def href_of(a):
        return F.get(
            F.filter(a["attrs"], lambda kv: kv["key"] == "href"), 0
        )["val"]

    def anchor_of(a):
        kids = F.filter(
            F.col("nodes"),
            lambda n: (n["parent_id"] == a["node_id"])
            & (n["name"] == TEXT_NAME),
        )
        return F.array_join(F.transform(kids, lambda n: n["value"]), "")

    per = F.transform(
        F.filter("nodes", lambda n: n["name"] == "a"),
        lambda a: F.struct(
            href_of(a).alias("href"), anchor_of(a).alias("anchor_text")
        ),
    )
    ex = nodes_df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(per).alias("link_pos", "l"),
    )
    return ex.where(F.col("l.href").isNotNull()).select(
        "doc_id",
        F.col("link_pos").cast("long").alias("link_pos"),
        F.col("l.href").alias("href"),
        F.col("l.anchor_text").alias("anchor_text"),
    )


def linkfarm_wrapped(df: DataFrame) -> DataFrame:
    """Multi-host outlink template — the anchor_text_agg fixture. Three
    anchors per doc across a 97-host space: one doc-specific anchor
    text (the doc's first word) and two shared "read more" anchors, so
    hosts accumulate competing anchor texts with real count ties (the
    tie-break contract fires at every SF)."""
    d = F.col("doc_id").cast("long")
    first_word = F.expr("element_at(split(text, ' '), 1)")

    def a(host_expr, path, anchor):
        return F.concat(
            F.lit('<li><a href="https://s'), host_expr.cast("string"),
            F.lit(f'.org/{path}">'), anchor, F.lit("</a></li>"),
        )

    html = F.concat(
        F.lit("<div><p>"), F.col("text"), F.lit("</p><ul>"),
        a((d * 3 + 1) % 97, "a", first_word),
        a(F.expr("(CAST(doc_id AS BIGINT) div 7) % 97"), "b",
          F.lit("read more")),
        a((d * 5 + 2) % 97, "c", F.lit("read more")),
        F.lit("</ul></div>"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def anchor_text_agg(outlinks: DataFrame) -> DataFrame:
    """Per-target-host anchor text aggregation — the classic inbound
    relevance/quality signal (what the web CALLS a page beats what the
    page says about itself). Input: an outlinks table (doc_id, href,
    anchor_text), e.g. extract_outlinks_df's output. Output per host:
    n_inlinks (links), n_src_docs (distinct linking docs),
    n_unique_anchors, top_anchor + top_anchor_n (most frequent anchor
    text; ties break to the lexicographically SMALLEST anchor so the
    row is deterministic under any aggregation order). Links whose
    href has no parseable host are dropped (logged-shape rather than a
    NULL host group: at web scale that group is garbage concentration).

    Scale shape: host parse is map-side regex (same RE2-safe pattern
    as url_normalize); then two two-level partial-aggregatable
    aggregates — (host, anchor) counts rolled up with min(struct(-c,
    anchor)) for the top pick, and (host, doc) distinct rolled up to a
    count — joined on host (both sides are host-cardinality slim; AQE
    broadcasts the smaller). No windows: a viral host costs map-side
    combines, never a single-task sort."""
    host = host_of(F.col("href"))
    base = outlinks.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        host.alias("host"),
        F.col("anchor_text"),
    ).where(F.col("host") != "")
    # ONE pass over the upstream plan (which may be a full HTML parse +
    # link explode — the expensive part): pre-aggregate to slim
    # (host, anchor, doc) rows and localCheckpoint them, so both
    # consumers below read one materialization. Exchange reuse alone
    # does NOT save this plan: Catalyst column-prunes the two branches
    # through the pre-agg into DIFFERENT first exchanges
    # ((host,anchor,doc) vs (host,doc)), so without the checkpoint the
    # parse ran twice (measured 2x MapInArrow).
    # test_anchor_text_agg_single_parse pins the single-parse shape.
    l0 = (
        base.groupBy("host", "anchor_text", "doc_id")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    per_anchor = l0.groupBy("host", "anchor_text").agg(
        F.sum("c").alias("c")
    )
    tops = per_anchor.groupBy("host").agg(
        F.sum("c").alias("n_inlinks"),
        F.count("*").alias("n_unique_anchors"),
        F.min(F.struct((-F.col("c")).alias("nc"), "anchor_text")).alias(
            "t"
        ),
    )
    per_doc = l0.groupBy("host").agg(
        F.count_distinct("doc_id").alias("n_src_docs")
    )
    return tops.join(per_doc, "host").select(
        "host",
        "n_inlinks",
        "n_src_docs",
        "n_unique_anchors",
        F.col("t.anchor_text").alias("top_anchor"),
        (-F.col("t.nc")).cast("long").alias("top_anchor_n"),
    )


def tables_wrapped(df: DataFrame) -> DataFrame:
    """Table-extraction fixture through the REAL parser. Per doc: one
    2x2 table (a <th> header row keyed on the doc's first word, a data
    row whose second cell nests markup — <td>see <b>w</b></td> must
    surface as 'see ', the direct-child-text contract) plus, for
    doc_id % 4 == 0, a second one-cell table (table_idx enumeration).
    Decoy: an orphan <tr><td> OUTSIDE any table — cells must come back
    only through the td->tr->table parent chain."""
    d = F.col("doc_id").cast("long")
    sid = F.col("doc_id").cast("string")
    w1 = F.expr("element_at(split(text, ' '), 1)")
    t0 = F.concat(
        F.lit('<table id="t'), sid,
        F.lit('"><tr><th>key</th><th>val '), w1,
        F.lit("</th></tr><tr><td>r1 "), sid,
        F.lit("</td><td>see <b>"), w1,
        F.lit("</b></td></tr></table>"),
    )
    t1 = F.when(
        d % 4 == 0,
        F.concat(F.lit("<table><tr><td>x "), sid,
                 F.lit("</td></tr></table>")),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<div><p>"), F.col("text"), F.lit("</p>"), t0, t1,
        F.lit("<tr><td>orphan</td></tr></div>"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def sitemap_wrapped(df: DataFrame) -> DataFrame:
    """Sitemap-XML fixture through the REAL parser (the tokenizer is
    markup-generic — XML-shaped sitemaps parse on the same FSM as
    HTML). Per doc: a <urlset> with three <url> entries — one with an
    uppercase host, :443 default port, trailing slash and a <lastmod>;
    a loc-LESS decoy (priority only — must not emit, but must still
    occupy its document-order position); and one whose loc carries a
    utm param plus a fragment. Both loc URLs canonicalize to the SAME
    frontier key — the sitemap->frontier dup-group demo."""
    sid = F.col("doc_id").cast("string")
    month = (F.col("doc_id").cast("long") % 9 + 1).cast("string")
    html = F.concat(
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/'
              'sitemap/0.9"><url><loc>https://EX.org:443/p/'),
        sid, F.lit("/</loc><lastmod>2026-0"), month,
        F.lit("-15</lastmod></url>"
              "<url><priority>0.5</priority></url>"
              "<url><loc>https://ex.org/p/"),
        sid, F.lit("?utm_source=x#frag</loc></url></urlset>"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def sitemap_urls_df(nodes_df: DataFrame) -> DataFrame:
    """Sitemap ingestion for the URL frontier: walk the flat parsed
    DOM for <url> elements that are DIRECT children of a <urlset>,
    read each one's <loc> (direct-child text, required — loc-less
    entries are dropped) and <lastmod> (NULL when absent), and attach
    the SHARED frontier canonicalization (url_canon_cols — the same
    expressions url_normalize and the frontier stream key on, so a
    sitemap-discovered URL and a crawled link can never disagree about
    their dup group). Output: (doc_id, url_pos, loc, lastmod,
    url_canon, host); url_pos is the document-order index over the
    doc's urlset-chained <url> elements.

    Scale shape: map-side HOF passes per doc + one posexplode (the
    plan's only Generate); canonicalization is map-side regex on the
    slim exploded rows. Zero shuffles, zero Python. The intermediate
    id/struct arrays are materialized as real columns at projection
    boundaries — an inlined array expression inside a lambda is
    re-evaluated PER ELEMENT of the enclosing higher-order function
    (the first cut nested get(filter(nodes,...)) inside the per-node
    predicate: O(nodes^2) per url element, measured 18 s for the
    sf0.1 query vs ~2 s restructured)."""
    return _sitemap_entries(nodes_df, "urlset", "url", "url_pos")

def markdown_wrapped(df: DataFrame) -> DataFrame:
    """Markdown-rendering fixture through the REAL parser: one html
    span exercising every block rule of the constants.py markdown spec
    (heading, emphasis paragraph, ul with nested <code>, conditional
    <ol> on doc_id % 5 == 0, blockquote, fenced <pre> with a literal
    newline, a dropped <script>, link + inline image paragraph, hr,
    2x2 table with a th header row, stray trailing inline text), plus
    an interleaved text span and a media span — so the oracle's
    template algebra predicts the full markdown string byte-for-byte,
    blank-line joins included."""
    d = F.col("doc_id").cast("long")
    sid = F.col("doc_id").cast("string")
    w1 = F.expr("element_at(split(text, ' '), 1)")
    ol = F.when(
        d % 5 == 0,
        F.concat(F.lit("<ol><li>o1 "), sid, F.lit("</li><li>o2</li></ol>")),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<article><h1>Title "), sid, F.lit("</h1><p>"),
        F.col("text"), F.lit(" <b>"), w1, F.lit("</b> and <i>x"), sid,
        F.lit("</i></p><ul><li>one "), w1, F.lit("</li><li>two <code>c"),
        sid, F.lit("</code></li></ul>"), ol,
        F.lit("<blockquote>quoted "), w1,
        F.lit("</blockquote><pre>code "), sid, F.lit("\nline2"),
        F.lit('</pre><script>var x=1;</script><p>See <a href="https://ex.org/'),
        sid, F.lit('">link '), w1, F.lit('</a><img src="im'), sid,
        F.lit('.png" alt="pic '), sid,
        F.lit('"></p><hr><table><tr><th>k</th><th>v</th></tr><tr><td>id'
              "</td><td>"), sid,
        F.lit("</td></tr></table>stray tail "), w1, F.lit("</article>"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            html_span(html, 0),
            span("text", F.concat(F.lit("plain "), w1),
                 F.lit(None).cast("string"), 1),
            span("media", F.lit(None).cast("string"),
                 F.concat(F.lit("media://md/"), sid), 2),
        ).alias("spans"),
    )


def lists_wrapped(df: DataFrame) -> DataFrame:
    """List-extraction fixture through the REAL parser: one <ul> with
    two items (the second nests markup — direct-child-text contract),
    a conditional <ol> (doc_id % 5 == 0) exercising the ordered flag
    and list enumeration, and a stray <li> OUTSIDE any list (the
    li -> ul|ol chain rule must drop it)."""
    d = F.col("doc_id").cast("long")
    sid = F.col("doc_id").cast("string")
    w1 = F.expr("element_at(split(text, ' '), 1)")
    ol = F.when(
        d % 5 == 0,
        F.concat(F.lit("<ol><li>o1 "), sid, F.lit("</li></ol>")),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<div><p>"), F.col("text"), F.lit('</p><ul id="u"><li>one '),
        w1, F.lit("</li><li>two <b>"), sid, F.lit("</b></li></ul>"),
        ol, F.lit("<li>stray</li></div>"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def extract_lists_df(nodes_df: DataFrame) -> DataFrame:
    """List extraction from the flat parsed DOM: one row per list
    item, (doc_id, list_idx, item_idx, ordered, item_text) —
    document-order indices (list among the doc's <ul>/<ol> elements,
    <li> among the list's DIRECT items), ordered = the container is an
    <ol>, item text = concat of the item's DIRECT child text nodes
    (nested markup — including a nested sub-list — keeps its own
    text). An <li> surfaces ONLY through a li -> ul|ol parent chain;
    stray items in tag soup never emit. The extraction-tier sibling of
    extract_tables for enumerations (steps, ingredients, rankings).

    Scale shape: identical to extract_tables — one nested map-side HOF
    pass, one posexplode, zero shuffles, zero Python."""
    from dompa_spark.constants import TEXT_NAME

    nodes = F.col("nodes")

    def direct_text(el):
        kids = F.filter(
            nodes,
            lambda n: (n["parent_id"] == el["node_id"])
            & (n["name"] == TEXT_NAME),
        )
        return F.array_join(F.transform(kids, lambda n: n["value"]), "")

    per = F.flatten(F.transform(
        F.filter(nodes, lambda n: n["name"].isin("ul", "ol")),
        lambda lst, li: F.transform(
            F.filter(
                nodes,
                lambda n: (n["parent_id"] == lst["node_id"])
                & (n["name"] == "li"),
            ),
            lambda it, ii: F.struct(
                li.cast("long").alias("list_idx"),
                ii.cast("long").alias("item_idx"),
                (lst["name"] == "ol").alias("ordered"),
                direct_text(it).alias("item_text"),
            ),
        ),
    ))
    ex = nodes_df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(per).alias("it"),
    )
    return ex.select(
        "doc_id", "it.list_idx", "it.item_idx", "it.ordered",
        "it.item_text",
    )


def structured_wrapped(df: DataFrame) -> DataFrame:
    """Full-page fixture carrying EVERY structure family at once —
    head/title, a heading, two lists (one holding anchors), a table,
    and conditional extras (doc_id % 2 adds a list item, doc_id % 3 a
    second link) so the fused counts vary per doc."""
    d = F.col("doc_id").cast("long")
    sid = F.col("doc_id").cast("string")
    w1 = F.expr("element_at(split(text, ' '), 1)")
    extra_li = F.when(d % 2 == 0, F.lit("<li>three</li>")).otherwise(
        F.lit("")
    )
    link2 = F.when(
        d % 3 == 0,
        F.concat(F.lit('<li><a href="https://ex.org/'), sid,
                 F.lit('/b">more</a></li>')),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html lang="aa"><head><title>T '), sid,
        F.lit("</title></head><body><h1>H "), w1,
        F.lit("</h1><p>"), F.col("text"),
        F.lit("</p><ul><li>i1</li><li>i2</li>"), extra_li,
        F.lit("</ul><table><tr><td>c1</td><td>c2 "), sid,
        F.lit('</td></tr></table><ul><li><a href="https://ex.org/'),
        sid, F.lit('/a">go</a></li>'), link2,
        F.lit("</ul></body></html>"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def extract_structured(nodes_df: DataFrame) -> DataFrame:
    """The PRODUCTION composition of the structure extractors: parse
    ONCE, extract everything. Input: parse_nodes_df's (doc_id, nodes).
    Output one row per doc: (doc_id, n_cells, n_items, n_headings,
    n_links, title) — table cells, list items, outline headings,
    href-carrying anchors, and the page title, all off a single
    materialization of the parse (internal non-eager localCheckpoint —
    the anchor_text_agg lesson: Catalyst column-prunes sibling
    consumers into DIFFERENT first exchanges, so exchange reuse alone
    re-parses once per family; with five families that is a 5x parse
    tax at 10^12 docs). Counts are 0 (not NULL) for absent structure.

    Scale shape: one MapInArrow parse -> checkpointed nodes read by
    five slim per-doc aggregates -> doc_id equi-joins of count rows;
    the nodes array never crosses an exchange
    (test_extract_structured_single_parse pins the plan)."""
    nodes = nodes_df.localCheckpoint(eager=False)

    def cnt(out_df, name):
        return out_df.groupBy("doc_id").agg(
            F.count("*").cast("long").alias(name)
        )

    base = nodes.select(F.col("doc_id").cast("long").alias("doc_id"))
    joined = (
        base.join(cnt(extract_tables_df(nodes), "n_cells"), "doc_id", "left")
        .join(cnt(extract_lists_df(nodes), "n_items"), "doc_id", "left")
        .join(cnt(extract_headings_df(nodes), "n_headings"),
              "doc_id", "left")
        .join(cnt(extract_outlinks_df(nodes), "n_links"), "doc_id", "left")
        .join(html_metadata(nodes).select("doc_id", "title"),
              "doc_id", "left")
    )
    return joined.select(
        "doc_id",
        *[F.coalesce(c, F.lit(0)).cast("long").alias(c)
          for c in ("n_cells", "n_items", "n_headings", "n_links")],
        "title",
    )


def media_captions(spans_df: DataFrame) -> DataFrame:
    """Caption-candidate mining over an interleaved span table — the
    image-text pairing step a multimodal training pipeline runs on the
    extractor's output: for every NON-TEXT span, the nearest preceding
    and following text spans by offset (the two strings a caption
    classifier scores). Input: (doc_id, spans) in the engine's span
    shape (extract_df's output or the raw input table). Output one row
    per media span: (doc_id, media_ref, media_offset, prev_text,
    next_text), NULL where no text span exists on that side.

    Scale shape: the text spans are materialized once per row as a
    real column (HOF house rule, ROUND4 item 42), the per-media lookup
    is a count-of-smaller-offsets + NULL-safe F.get over that
    in-memory array, and the posexplode emits slim rows. Zero
    shuffles, zero Python; spans arrays never leave the projection."""
    texts = F.filter(
        F.col("spans"), lambda s: s["kind"] == "text"
    )
    t1 = spans_df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "spans",
        texts.alias("ts"),
    )
    def n_before(m):
        return F.size(
            F.filter(F.col("ts"), lambda t: t["offset"] < m["offset"])
        )

    per = F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] != "text"),
        lambda m: F.struct(
            m["media_ref"].alias("media_ref"),
            m["offset"].cast("long").alias("media_offset"),
            # F.get is 0-based and NULL on any out-of-bounds index
            # (element_at THROWS on index 0 even inside an untaken
            # CASE branch under codegen — measured, not theoretical)
            F.get(F.col("ts"), n_before(m) - 1)["text"].alias(
                "prev_text"
            ),
            F.get(F.col("ts"), n_before(m))["text"].alias("next_text"),
        ),
    )
    return t1.select("doc_id", F.explode(per).alias("m")).select(
        "doc_id", "m.media_ref", "m.media_offset", "m.prev_text",
        "m.next_text",
    )


def headings_wrapped(df: DataFrame) -> DataFrame:
    """Heading-outline fixture through the REAL parser: h1 -> h2 ->
    optional h3 (doc_id % 3 == 0) -> h2, so the nearest-smaller-level
    parent rule fires at every depth, including the skip-back case
    (the second h2's parent is the h1, jumping OVER the h3). The
    second h2 nests markup (<h2>Sec B <em>w</em></h2> -> 'Sec B ',
    the direct-child-text contract)."""
    d = F.col("doc_id").cast("long")
    sid = F.col("doc_id").cast("string")
    w1 = F.expr("element_at(split(text, ' '), 1)")
    h3 = F.when(
        d % 3 == 0,
        F.concat(F.lit("<h3>Sub "), sid, F.lit("</h3><p>deep</p>")),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<article><h1>Title "), sid, F.lit("</h1><p>"),
        F.col("text"), F.lit("</p><h2>Sec A "), w1,
        F.lit("</h2><p>aaa</p>"), h3,
        F.lit("<h2>Sec B <em>"), w1, F.lit("</em></h2><p>ccc</p></article>"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def extract_headings_df(nodes_df: DataFrame) -> DataFrame:
    """Document-outline extraction from the flat parsed DOM: one row
    per h1-h6 element, (doc_id, h_pos, level, heading_text,
    parent_pos) — h_pos is the document-order heading index,
    heading_text the concat of DIRECT child text nodes (markup inside
    a heading keeps its own text, the anchor/title/table-cell
    contract), and parent_pos the h_pos of the NEAREST PRECEDING
    heading with a strictly smaller level (NULL for top-level
    headings) — i.e. the outline tree a section chunker or a
    structure-aware quality gate consumes.

    Scale shape: one HOF pass materializes the per-doc heading structs
    as a real column (the sitemap/robots lesson: an inlined array
    re-evaluates per element of an enclosing lambda), a second pass
    links parents with O(headings^2) scans over that in-memory array,
    and the posexplode is the plan's only Generate. Zero shuffles,
    zero Python."""
    from dompa_spark.constants import TEXT_NAME

    nodes = F.col("nodes")
    hnames = ["h1", "h2", "h3", "h4", "h5", "h6"]
    hs = F.transform(
        F.filter(nodes, lambda n: n["name"].isin(*hnames)),
        lambda h: F.struct(
            F.substring(h["name"], 2, 1).cast("int").alias("level"),
            F.array_join(
                F.transform(
                    F.filter(
                        nodes,
                        lambda n: (n["parent_id"] == h["node_id"])
                        & (n["name"] == TEXT_NAME),
                    ),
                    lambda n: n["value"],
                ),
                "",
            ).alias("txt"),
        ),
    )
    t1 = nodes_df.select(
        F.col("doc_id").cast("long").alias("doc_id"), hs.alias("hs")
    )
    # parent link: the last index j < i with hs[j].level < hs[i].level
    per = F.transform(
        F.col("hs"),
        lambda h, i: F.struct(
            h["level"].cast("long").alias("level"),
            h["txt"].alias("heading_text"),
            F.array_max(
                F.filter(
                    F.sequence(F.lit(0), i),
                    lambda j: (j < i)
                    & (F.element_at(F.col("hs"), j + 1)["level"]
                       < h["level"]),
                )
            ).cast("long").alias("parent_pos"),
        ),
    )
    ex = t1.select("doc_id", F.posexplode(per).alias("h_pos", "h"))
    return ex.select(
        "doc_id",
        F.col("h_pos").cast("long").alias("h_pos"),
        "h.level", "h.heading_text", "h.parent_pos",
    )


def extract_tables_df(nodes_df: DataFrame) -> DataFrame:
    """Structured-table extraction from the flat parsed DOM — the
    extraction-tier step that turns HTML tables into trainable rows
    instead of boilerplate-stripped word soup. Output: one row per
    cell, (doc_id, table_idx, row_idx, col_idx, is_header, cell_text);
    indices are document-order positions (table among the doc's
    tables, <tr> among the table's DIRECT rows, <td>/<th> among the
    row's DIRECT cells). Cell text is the concat of the cell's DIRECT
    child text nodes — markup nested in a cell keeps its own text, the
    same parent-pointer contract as outlink anchors and <title>. A
    cell surfaces ONLY through a td/th -> tr -> table parent chain:
    orphan rows outside a table (real-web tag soup) never emit.

    Scale shape: one nested map-side HOF pass builds the per-doc cell
    structs inside the nodes array's row; the posexplode emits slim
    cell rows and is the plan's only Generate — zero shuffles, zero
    Python, and the nodes array never leaves the projection. Per-doc
    cost is O(cells x nodes) array scans over an in-memory array —
    bounded by the chunk-staged extract pipeline's doc-size contract,
    irrelevant to cluster topology at 10^12 docs."""
    from dompa_spark.constants import TEXT_NAME

    nodes = F.col("nodes")

    def direct_text(el):
        kids = F.filter(
            nodes,
            lambda n: (n["parent_id"] == el["node_id"])
            & (n["name"] == TEXT_NAME),
        )
        return F.array_join(F.transform(kids, lambda n: n["value"]), "")

    def kids_named(el, pred):
        return F.filter(
            nodes, lambda n: (n["parent_id"] == el["node_id"]) & pred(n)
        )

    per = F.flatten(F.flatten(F.transform(
        F.filter(nodes, lambda n: n["name"] == "table"),
        lambda t, ti: F.transform(
            kids_named(t, lambda n: n["name"] == "tr"),
            lambda r, ri: F.transform(
                kids_named(r, lambda n: n["name"].isin("td", "th")),
                lambda c, ci: F.struct(
                    ti.cast("long").alias("table_idx"),
                    ri.cast("long").alias("row_idx"),
                    ci.cast("long").alias("col_idx"),
                    (c["name"] == "th").alias("is_header"),
                    direct_text(c).alias("cell_text"),
                ),
            ),
        ),
    )))
    ex = nodes_df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(per).alias("cell"),
    )
    return ex.select(
        "doc_id", "cell.table_idx", "cell.row_idx", "cell.col_idx",
        "cell.is_header", "cell.cell_text",
    )


# ---------------------------------------------------------------------------
# Dedup / similarity / quality operators
# ---------------------------------------------------------------------------

def words(col="text") -> Column:
    return F.split(F.col(col), " ")


def shingles3(col="text") -> Column:
    """Distinct 3-word shingles (empty array for docs under 3 words)."""
    w = words(col)
    return F.when(
        F.size(w) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 2),
                lambda i: F.concat_ws(" ", F.slice(w, i, F.lit(3))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def dedup_key_col(prefix_words: int = 3) -> Column:
    """The exact-dedup key: first N words of the text."""
    return F.concat_ws(" ", F.slice(words(), 1, prefix_words))


def _dedup_flags(keyed: DataFrame) -> DataFrame:
    """(doc_id, dedup_key) -> keep/dup flags; see dedup_exact_prefix
    for the skew argument (map-side min + AQE-splittable flag join)."""
    keeper = keyed.groupBy("dedup_key").agg(
        F.min("doc_id").alias("keep_doc_id")
    )
    return keyed.join(keeper, "dedup_key").select(
        "doc_id",
        "dedup_key",
        "keep_doc_id",
        (F.col("doc_id") != F.col("keep_doc_id")).alias("is_dup"),
    )


def dedup_exact_prefix(df: DataFrame, prefix_words: int = 3) -> DataFrame:
    """Exact dedup on a derived key (first N words): keep the lowest
    doc_id per group, flag the rest as dups.

    Skew shape: the keeper per key comes from groupBy().agg(min) — a
    map-side partial aggregation collapses even a mega-group (one viral
    boilerplate prefix shared by 10^8 docs) to one row per key per task
    BEFORE the shuffle, so no task ever sorts a whole group. The flag
    join back on dedup_key is skewed on that same key, but joins (unlike
    windows) are AQE-skew-splittable: spark.sql.adaptive.skewJoin splits
    the fat partition across tasks. The previous row_number() window
    formulation sorted every row of the heaviest key in one task."""
    keyed = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        dedup_key_col(prefix_words).alias("dedup_key"),
    )
    return _dedup_flags(keyed)


def dedup_exact_normalized(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Exact dedup over the NORMALIZED canon (normalize_text's
    control/case/digit/whitespace-insensitive form) — catches the
    trivially perturbed byte-level copies raw exact dedup misses
    (re-encodes, case changes, counter/timestamp digits) at exact-dedup
    cost, the cheap middle ground before minhash. Same output contract
    and skew shape as dedup_exact_prefix (map-side min keeper +
    AQE-splittable flag join); the dedup key is md5(text_norm) so the
    shuffle carries a fixed-width hash, never document text."""
    norm = normalize_text(df, text_col=text_col)
    keyed = norm.select(
        "doc_id", F.md5(F.col("text_norm")).alias("dedup_key")
    )
    return _dedup_flags(keyed)


def with_near_dups(df: DataFrame, id_offset: int = 1_000_000) -> DataFrame:
    """Augment the corpus with a mutated copy of every 5th doc — gives the
    near-dup detectors real positives, deterministically."""
    mutated = (
        df.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + id_offset).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" nearly duplicate suffix")).alias("text"),
        )
    )
    return df.select(F.col("doc_id").cast("long"), "text").unionByName(mutated)


def dedup_recall(pairs: DataFrame, truth: DataFrame) -> DataFrame:
    """Detector-quality gauge: recall of a near-dup pair detector
    against a ground-truth positive set — the text-dedup sibling of
    ann_recall (a pipeline must not tune dedup aggressiveness blind;
    jaccard_min / band/row counts move this number). Inputs: pairs
    (doc_a, doc_b) from any pair operator; truth (doc_a, doc_b)
    known-positive pairs (e.g. engineered mutated copies, or a labeled
    sample of a production crawl). Output ONE row: n_truth,
    n_detected, recall (4 dp). Pair order is normalized on both sides
    and duplicates collapse, so callers need not care about (a,b) vs
    (b,a) or repeated labels.

    Scale shape: both sides reduce to slim normalized key pairs; the
    distinct + equi-join shuffle on (doc_a, doc_b); the final
    aggregate is a 1-row partial agg. Truth sets are typically tiny
    (labeled samples) — AQE broadcasts them into the join."""

    def norm(df: DataFrame) -> DataFrame:
        a, b = F.col("doc_a").cast("long"), F.col("doc_b").cast("long")
        return df.select(
            F.least(a, b).alias("doc_a"), F.greatest(a, b).alias("doc_b")
        ).distinct()

    t = norm(truth)
    hit = norm(pairs).withColumn("hit", F.lit(1))
    return (
        t.join(hit, ["doc_a", "doc_b"], "left")
        .agg(
            F.count("*").alias("n_truth"),
            F.coalesce(F.sum("hit"), F.lit(0))
            .cast("long")
            .alias("n_detected"),
            F.round(
                F.coalesce(F.sum("hit"), F.lit(0))
                / F.count("*").cast("double"),
                4,
            ).alias("recall"),
        )
    )


N_MINHASH = 16
LSH_BANDS = 4
LSH_ROWS = 4  # N_MINHASH = LSH_BANDS * LSH_ROWS

# Universal-hash family over one base md5 per shingle: h_j(s) =
# (a_j * (md5_60(s) mod P) + b_j) mod P with P = 2^31-1. One md5 per
# shingle instead of N_MINHASH — at 10^12 docs the md5 calls are the
# dominant minhash cost, and products stay < 2^62 (portable to DuckDB
# BIGINT arithmetic). a_j/b_j are md5-derived so both engines can
# rebuild the identical family.
MINHASH_P = 2147483647


def _minhash_coef(kind: str, j: int) -> int:
    import hashlib

    v = int(hashlib.md5(f"mh-{kind}:{j}".encode()).hexdigest()[:15], 16)
    return v % (MINHASH_P - 1) + 1  # in [1, P-1]


MINHASH_A = [_minhash_coef("a", j) for j in range(N_MINHASH)]
MINHASH_B = [_minhash_coef("b", j) for j in range(N_MINHASH)]


def minhash_sigs(df: DataFrame) -> DataFrame:
    """16 minhashes over distinct 3-shingles (one md5 per shingle,
    universal-hash family for the 16 permutations). One fused
    mapInPandas kernel builds the shingle arrays AND the signatures:
    Spark's higher-order array expressions are interpreted, not
    codegen'd, so the shingles3() expression alone cost more than all
    the hashing — Python's split/join + C-speed md5 with a segmented
    numpy minimum is ~2x faster end-to-end. Semantics are identical:
    str.split(' ') == F.split(text, ' ', -1) (keeps empties),
    dict.fromkeys == array_distinct (first-occurrence order), <3-word
    docs are dropped exactly like the old F.size(sh) > 0 filter, and
    the hash family matches the DuckDB oracle bit-for-bit."""
    import hashlib

    import numpy as np
    import pandas as pd

    A = list(MINHASH_A)
    B = list(MINHASH_B)

    def gen(batches):
        for pdf in batches:
            ids, shs = [], []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                if t is None:
                    continue
                ws = t.split(" ")
                if len(ws) < 3:
                    continue
                ids.append(int(did))
                shs.append(
                    list(
                        dict.fromkeys(
                            " ".join(ws[i:i + 3])
                            for i in range(len(ws) - 2)
                        )
                    )
                )
            if not ids:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "sh": pd.Series([], dtype=object),
                        "sig": pd.Series([], dtype=object),
                    }
                )
                continue
            n = len(ids)
            lens = np.fromiter((len(s) for s in shs), np.int64, count=n)
            h = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(s.encode()).digest()[:8], "big"
                    )
                    >> 4  # first 15 hex chars = top 60 bits
                    for sh in shs
                    for s in sh
                ),
                dtype=np.int64,
                count=int(lens.sum()),
            ) % MINHASH_P
            starts = np.zeros(n, np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            # one universal hash at a time: O(total) transient memory
            mins = np.empty((N_MINHASH, n), np.int64)
            for j in range(N_MINHASH):
                mins[j] = np.minimum.reduceat(
                    (A[j] * h + B[j]) % MINHASH_P, starts
                )
            yield pd.DataFrame(
                {"doc_id": ids, "sh": shs, "sig": list(mins.T)}
            )

    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).mapInPandas(gen, "doc_id long, sh array<string>, sig array<bigint>")


def _minhash_banded(sigs: DataFrame) -> DataFrame:
    """(doc_id, sig) -> one slim (doc_id, band, bkey) row per band; the
    band key is the comma-joined 4-minhash slice."""
    return sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * LSH_ROWS + 1, LSH_ROWS),
                            lambda v: v.cast("string"),
                        ),
                    ).alias("bkey"),
                ),
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"),
             F.col("bs.bkey").alias("bkey"))


# Text-LSH hot-bucket cap (same role as DEDUP_BUCKET_CAP for SRP-LSH):
# a bucket of B > cap same-key docs — one viral boilerplate cluster —
# would emit B^2/2 candidate pairs; splitting it into ceil(B/cap) salt
# groups bounds the bucket's pair count at ~B*cap/2, linear in B.
TEXT_LSH_BUCKET_CAP = 64


def _salt_hot_buckets(
    banded: DataFrame, cap: int, group_col: str = "band",
    extras: tuple = (),
) -> DataFrame:
    """(doc_id, <group_col>, bkey) -> same rows with bkey replaced by a
    salted string key: buckets holding > cap rows split into
    ceil(B/cap) salt groups by md5(doc_id:group). The within-salt
    self-join then emits at most ~B*cap/2 pairs per hot bucket instead
    of B^2/2 — the srp_candidate_pairs guard, shared by the text-LSH
    pair operators. `extras` columns are carried through unchanged
    (they never affect the salt — dedup_incremental uses this for its
    old/new side tag). Recall cost: only pairs split across salt groups in
    EVERY band they co-occur in are lost, and only inside
    over-cap buckets (which exact-dup handling should collapse first).

    Cost shape: the counts side is filtered to the HOT buckets only
    before the join — in the common regime (dup clusters are rare)
    that's a handful of rows, so AQE converts the left join to a
    runtime broadcast and the salt step costs one aggregate plus a
    map-side join; in the pathological every-bucket-hot regime (n >
    cap * keyspace) it degrades gracefully to a shuffle join of two
    slim tables. bucket_n is non-null exactly for hot rows."""
    hot = (
        banded.groupBy(group_col, "bkey")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") > cap)
    )
    n_split = F.ceil(F.col("bucket_n") / F.lit(float(cap)))
    salt = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col(group_col).cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % n_split
    )
    return (
        banded.join(hot, [group_col, "bkey"], "left")
        .withColumn(
            "skey",
            F.when(
                F.col("bucket_n").isNotNull(),
                F.concat_ws(":", F.col("bkey").cast("string"), salt),
            ).otherwise(F.col("bkey").cast("string")),
        )
        .select("doc_id", group_col, F.col("skey").alias("bkey"), *extras)
    )


def _bucket_stats(
    banded: DataFrame, cap: int, group_col: str = "band"
) -> DataFrame:
    """Hot-bucket telemetry per band/table: occupancy extremes plus the
    raw vs capped candidate-pair bounds. At 100 TB the cap firing
    silently is the difference between 'ran fine' and 'silently dropped
    recall' — ship this row next to every LSH dedup output."""
    per_bucket = banded.groupBy(group_col, "bkey").agg(
        F.count("*").alias("bucket_n")
    )
    n_split = F.ceil(F.col("bucket_n") / F.lit(float(cap)))
    # capped bound: B split into g=ceil(B/cap) salt groups of ~B/g rows
    # -> g * (B/g choose 2) <= B*cap/2; computed exactly per bucket on
    # the even split floor/ceil partition
    b, g = F.col("bucket_n"), n_split
    lo = F.floor(b / g)
    hi_cnt = b - lo * g  # groups holding lo+1 rows
    capped = (
        hi_cnt * ((lo + 1) * lo) / 2 + (g - hi_cnt) * (lo * (lo - 1)) / 2
    )
    return (
        per_bucket.groupBy(F.col(group_col).cast("long").alias(group_col))
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("bucket_n").cast("long").alias("n_rows"),
            F.max("bucket_n").cast("long").alias("max_bucket_n"),
            F.sum((F.col("bucket_n") > cap).cast("long"))
            .cast("long")
            .alias("n_hot_buckets"),
            F.sum(F.col("bucket_n") * (F.col("bucket_n") - 1) / 2)
            .cast("long")
            .alias("raw_pair_bound"),
            F.sum(capped).cast("long").alias("capped_pair_bound"),
        )
        .orderBy(group_col)
    )


def minhash_bucket_stats(
    df: DataFrame, cap: int = TEXT_LSH_BUCKET_CAP
) -> DataFrame:
    """Per-band minhash-LSH bucket telemetry (see _bucket_stats)."""
    return _bucket_stats(_minhash_banded(minhash_sigs(df)), cap)


def minhash_band_edges(df: DataFrame) -> DataFrame:
    """LINEAR-size dedup edge list: each doc contributes at most one
    star edge per band, to the minimum doc_id of its band bucket. The
    connected components of this graph equal those of the full
    same-bucket candidate-pair graph (any same-bucket pair is joined
    through the bucket minimum), but a clique of B identical docs costs
    B edges instead of B^2/2 pairs — the web-scale clustering path when
    the pair output itself would be the quadratic object. No Jaccard
    verification (bucket collisions merge clusters); use
    minhash_lsh_pairs + dedup_components when verified precision
    matters at moderate dup density."""
    sigs = minhash_sigs(df)
    # cached: (doc_id, band, bkey) is 4 slim rows/doc, but deriving it
    # costs the full shingle+minhash pass — consumed twice below
    # (bucket minima + the join back)
    banded = _minhash_banded(sigs).cache()
    return _band_star_edges(banded)


def _band_star_edges(banded: DataFrame) -> DataFrame:
    bucket_min = banded.groupBy("band", "bkey").agg(
        F.min("doc_id").alias("doc_a")
    )
    return (
        banded.join(bucket_min, ["band", "bkey"])
        .filter(F.col("doc_id") != F.col("doc_a"))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_band_edges_with_stats(
    df: DataFrame, cap: int = TEXT_LSH_BUCKET_CAP
) -> tuple[DataFrame, DataFrame]:
    """Fused linear-edge clustering input + telemetry: (star edges,
    bucket_stats) off ONE shingle+minhash pass, via the same cached
    banded projection minhash_band_edges already holds. The star-edge
    path has no salt cap (its output is linear by construction), but
    the telemetry still matters at 100 TB: max_bucket_n tells you how
    big the viral clusters the clustering is about to merge are, for
    free. Cache lifecycle is caller-owned (see curate_corpus's CACHE
    LIFECYCLE note)."""
    banded = _minhash_banded(minhash_sigs(df)).cache()
    return _band_star_edges(banded), _bucket_stats(banded, cap)


def _minhash_pairs_from(
    sigs: DataFrame, banded_salted: DataFrame, jaccard_min: float
) -> DataFrame:
    """Candidate + verify stages shared by minhash_lsh_pairs and
    minhash_lsh_with_stats: self-join on the (salted) band key, then
    exact shingle Jaccard on the deduped candidate set. Both inputs
    are expected cached by the caller (each is consumed twice)."""
    a = banded_salted.alias("a")
    b = banded_salted.alias("b")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_only = sigs.select("doc_id", "sh")
    cand = (
        cand.join(
            sh_only.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh_only.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= jaccard_min)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    jaccard_min: float = 0.7,
    bucket_cap: int = TEXT_LSH_BUCKET_CAP,
) -> DataFrame:
    """LSH banding: docs sharing any band signature become candidate
    pairs; candidates are verified with exact shingle Jaccard. The join
    is on the band key (bounded buckets), never all-pairs; buckets over
    `bucket_cap` rows are salt-split (_salt_hot_buckets) so a clique of
    B identical docs emits ~B*cap/2 candidates, not B^2/2 — without the
    guard a viral 10^6-doc boilerplate cluster lands in one (band, bkey)
    bucket and emits 5x10^11 pairs before any Jaccard filter.

    Shipping telemetry next to the pair output? Use
    minhash_lsh_with_stats — it emits the _bucket_stats row off the
    SAME hashing pass instead of re-shingling the corpus."""
    # cache: the 16-minhash expression tree is the expensive part and the
    # self-join + two shingle joins would otherwise recompute it 4x
    sigs = minhash_sigs(df).cache()
    # band on (band_idx, 4-minhash key) only — the heavy shingle arrays do
    # NOT travel through the band join; they come back via two slim joins
    # on the (usually tiny) deduped candidate-pair set. The salted keys
    # are cached (4 slim rows/doc) so the explode + hot-join + salt md5
    # run once, not once per self-join side.
    banded = _salt_hot_buckets(
        _minhash_banded(sigs), bucket_cap
    ).cache()
    return _minhash_pairs_from(sigs, banded, jaccard_min)


def minhash_lsh_with_stats(
    df: DataFrame,
    jaccard_min: float = 0.7,
    bucket_cap: int = TEXT_LSH_BUCKET_CAP,
) -> tuple[DataFrame, DataFrame]:
    """Fused dedup + telemetry: (pairs, bucket_stats) off ONE
    shingle+minhash pass. The standalone minhash_bucket_stats rebuilds
    the full signature stage the dedup just ran — at 100 TB that
    doubles the pipeline's most expensive hashing pass for any job that
    (correctly) ships the hot-bucket telemetry next to its dedup
    output. Here the pre-salt banded projection (4 slim rows/doc) is
    cached and feeds BOTH the _bucket_stats aggregate and the salt
    step, so materializing pairs first makes the stats side a pure
    cache read (pinned by test_minhash_fused_single_hash_pass).

    Results are independent DataFrames: identical values to the
    standalone minhash_lsh_pairs / minhash_bucket_stats (same plans
    below the shared cache), so the oracles are unchanged.

    Cache lifecycle is caller-owned, as for every operator-internal
    cache here (see curate_corpus's CACHE LIFECYCLE note): one-shot
    jobs can ignore it; long-lived sessions invoking this repeatedly
    should clear caches between invocations as bench.py does."""
    sigs = minhash_sigs(df).cache()
    banded = _minhash_banded(sigs).cache()
    stats = _bucket_stats(banded, bucket_cap)
    salted = _salt_hot_buckets(banded, bucket_cap).cache()
    return _minhash_pairs_from(sigs, salted, jaccard_min), stats


def dedup_incremental(
    new_docs: DataFrame = None,
    old_docs: DataFrame = None,
    *,
    new_sigs: DataFrame = None,
    old_sigs: DataFrame = None,
    jaccard_min: float = 0.7,
    bucket_cap: int = TEXT_LSH_BUCKET_CAP,
) -> DataFrame:
    """Crawl-over-crawl dedup: flag each NEW doc that is a near-dup
    (exact shingle Jaccard >= jaccard_min) of ANY doc in the OLD
    (prior-snapshot) corpus, WITHOUT pairing new-vs-new — the monthly
    re-crawl shape, where the incoming snapshot must be deduped against
    the 100x-larger accumulated corpus but not against itself (that is
    minhash_lsh_pairs' job, run separately on the survivors).

    Output: one row per hashable new doc (>= 3 words and non-null text,
    minhash_sigs' dropped-row contract):
      (doc_id, is_dup_of_prior, match_id, jaccard)
    where match is the verified old doc with the highest Jaccard
    (ties -> lowest old doc_id); match_id/jaccard are NULL for novel
    docs. doc_id must be unique across BOTH corpora (use xxhash64
    surrogates as jobs/pretrain_corpus.py does for string ids).

    Scale shape: candidate generation is a band equi-join of two SLIM
    (doc_id, band, bkey) projections — the old corpus's text/shingles
    reach only the verify join, and only for docs that band-collided
    with a new doc (AQE-broadcastable when the new crawl is small
    relative to the index). Hot buckets (viral boilerplate present in
    BOTH snapshots) are salt-split over the UNION of the two sides with
    the shared _salt_hot_buckets cap, so a B_old x B_new bucket emits
    ~(B/g)^2 * g cross-candidates instead of B_old*B_new; the recall
    cost is the documented salt-cap contract. At 10^12 docs you would
    persist `minhash_sigs(old)` once and pass it via `old_sigs=` — the
    signatures are a pure deterministic function of the text, so a
    stored table and a recompute are interchangeable; `new_sigs=` is
    the symmetric hatch (jobs/incremental_dedup.py hashes the new
    crawl once and shares the table between the flags and the
    --save-sigs union).

    Cache lifecycle is caller-owned, as for every operator-internal
    cache here (see curate_corpus's CACHE LIFECYCLE note).
    """
    if old_sigs is None:
        if old_docs is None:
            raise ValueError("dedup_incremental needs old_docs or old_sigs")
        old_sigs = minhash_sigs(old_docs)
    if new_sigs is None:
        if new_docs is None:
            raise ValueError("dedup_incremental needs new_docs or new_sigs")
        new_sigs = minhash_sigs(new_docs)
    # both sig tables feed the band join AND the verify join
    new_sigs = new_sigs.cache()
    old_sigs = old_sigs.cache()
    banded = (
        _minhash_banded(new_sigs)
        .withColumn("is_new", F.lit(True))
        .unionByName(
            _minhash_banded(old_sigs).withColumn("is_new", F.lit(False))
        )
    )
    salted = _salt_hot_buckets(
        banded, bucket_cap, extras=("is_new",)
    ).cache()
    n = salted.filter(F.col("is_new")).alias("n")
    o = salted.filter(~F.col("is_new")).alias("o")
    cand = (
        n.join(o, ["band", "bkey"])
        .select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("o.doc_id").alias("match_id"),
        )
        .dropDuplicates(["doc_id", "match_id"])
    )
    withsh = cand.join(
        new_sigs.select("doc_id", F.col("sh").alias("sh_n")), "doc_id"
    ).join(
        old_sigs.select(
            F.col("doc_id").alias("match_id"), F.col("sh").alias("sh_o")
        ),
        "match_id",
    )
    jac = F.size(F.array_intersect("sh_n", "sh_o")) / F.size(
        F.array_union("sh_n", "sh_o")
    )
    # best verified match per new doc: max jaccard, ties -> lowest old
    # doc_id. max(struct) keeps the aggregate partial (map-side combine)
    # where a window would shuffle-and-sort the candidate set.
    best = (
        withsh.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= jaccard_min)
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(
                    F.col("jaccard"), (-F.col("match_id")).alias("neg_id")
                )
            ).alias("m")
        )
    )
    return (
        new_sigs.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.col("m").isNotNull().alias("is_dup_of_prior"),
            (-F.col("m.neg_id")).cast("long").alias("match_id"),
            F.col("m.jaccard").alias("jaccard"),
        )
    )


# 60 bits: the md5-15-hex word hash carries exactly 60 significant bits
# (the portable integer both Spark and DuckDB share); a "64-bit" simhash
# would have 4 dead always-zero bits polluting one band's key space.
SIMHASH_BITS = 60


def _simhash_halves(texts, n_halves: int = 1):
    """Shared flattened simhash kernel: ONE md5 digest per word for up
    to two independent 60-bit families — half 1 is hex chars 1-15 of
    the digest (bytes [0:8] >> 4), half 2 is hex chars 17-31 (bytes
    [8:16] >> 4). md5's avalanche makes disjoint digest bit ranges
    independent families, so the wide fingerprint costs NO extra
    hashing over the narrow one (a salted second md5 stream would
    double the kernel's dominant cost). Per-doc bit one-counts via a
    segmented add.reduceat, majority rule per bit (2*ones_b > n_words —
    identical to the ±1 sign-sum spec). Returns (null_mask, [per-half
    int64 arrays over the non-null rows])."""
    import hashlib

    import numpy as np

    null_mask = [t is None for t in texts]
    split = [t.split(" ") for t in texts if t is not None]
    m = len(split)
    if m == 0:
        return null_mask, [np.empty(0, np.int64) for _ in range(n_halves)]
    lens = np.fromiter((len(ws) for ws in split), np.int64, count=m)
    digs = [hashlib.md5(w.encode()).digest() for ws in split for w in ws]
    starts = np.zeros(m, np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    outs = []
    for half in range(n_halves):
        b0, b1 = (0, 8) if half == 0 else (8, 16)
        h = np.fromiter(
            (int.from_bytes(d[b0:b1], "big") >> 4 for d in digs),
            dtype=np.int64,
            count=len(digs),
        )
        # bit-planes in chunks of 4: one 2-D reduceat covers 4 planes
        # (15 numpy passes instead of 60) while transient memory stays
        # ~32 B/word — the full (total, 60) matrix would hit GBs on
        # heavy-tail batches
        sim = np.zeros(m, np.int64)
        for c in range(0, SIMHASH_BITS, 4):
            bits = np.arange(c, c + 4, dtype=np.int64)
            ones = np.add.reduceat(
                (h[:, None] >> bits) & 1, starts, axis=0
            )  # (m, 4)
            sim |= (
                ((ones * 2 > lens[:, None]).astype(np.int64) << bits)
            ).sum(axis=1)
        outs.append(sim)
    return null_mask, outs


def _simhash_udf():
    """Arrow-vectorized 60-bit simhash (see _simhash_halves). Pure
    integer arithmetic, bit-identical to the SQL-expression formulation
    (the interpreted-HOF path walked every word x 60 bits per doc);
    parity pinned by the DuckDB oracle."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def f(texts):
        null_mask, (sims,) = _simhash_halves(texts, 1)
        out, i = [], 0
        for is_null in null_mask:
            if is_null:  # null text -> null simhash, like the old
                out.append(None)  # JVM expression formulation
            else:
                out.append(int(sims[i]))
                i += 1
        return pd.Series(out, dtype="Int64")  # nullable: null rows pass through

    f.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(f, "long")


def simhash(df: DataFrame) -> DataFrame:
    """Word-level simhash (60 bits of md5-derived word hashes, sign-
    summed per bit), computed in the Arrow-vectorized kernel
    (_simhash_udf)."""
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _simhash_udf()("text").alias("simhash"),
    )


SIMHASH_BANDS = 4  # 60 bits -> 4 x 15-bit bands; hamming<=3 share >=1 band
SIMHASH_BAND_BITS = 15  # 32,768 key values per band: at n docs a bucket
# holds ~n/2^15 rows, so the candidate self-join stays ~linear in n
# (the previous 8-bit bands went quadratic at ~n/256 per bucket)
SIMHASH_BAND_MASK = (1 << SIMHASH_BAND_BITS) - 1
SIMHASH_HAMMING_MAX = 3

# Wide fingerprint for the 10^9+ tier: two disjoint 60-bit ranges of ONE
# md5 digest per word give 120 bits -> 4 x 30-bit bands. The hamming<=3
# pigeonhole still allows exactly 4 bands, but each band key now spans
# 2^30 values, so uniform-corpus candidate growth is ~n^2/2^32 — linear
# to ~10^10 docs before the hot-bucket cap even fires. Each 60-bit half
# stays a separate BIGINT (DuckDB-portable: substr(md5, 1|17, 15); a
# single 120-bit int is not).
SIMHASH_WIDE_HALF2_HEX_START = 17  # 1-based hex offset of the hi half
SIMHASH_WIDE_BAND_BITS = 30
SIMHASH_WIDE_BAND_MASK = (1 << SIMHASH_WIDE_BAND_BITS) - 1


def _simhash_wide_udf():
    """Arrow-vectorized 120-bit simhash as two 60-bit halves from the
    two disjoint hex ranges of one md5 digest per word (see
    _simhash_halves — no extra hashing over the narrow simhash).
    Returns array<bigint> [lo, hi]."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def f(texts):
        null_mask, (lo, hi) = _simhash_halves(texts, 2)
        out, i = [], 0
        for is_null in null_mask:
            if is_null:  # null text -> null fingerprint
                out.append(None)
            else:
                out.append([int(lo[i]), int(hi[i])])
                i += 1
        return pd.Series(out, dtype=object)

    f.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(f, "array<bigint>")


def simhash_wide(df: DataFrame) -> DataFrame:
    """120-bit simhash as (simhash_lo, simhash_hi) BIGINT halves."""
    arr = _simhash_wide_udf()(F.col("text"))
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"), arr.alias("wh")
    ).select(
        "doc_id",
        F.element_at("wh", 1).alias("simhash_lo"),
        F.element_at("wh", 2).alias("simhash_hi"),
    )


def _simhash_wide_banded(sh: DataFrame) -> DataFrame:
    """(doc_id, simhash_lo, simhash_hi) -> 4 slim (doc_id, band, bkey)
    rows: bands 0/1 are the low/high 30 bits of the lo half, 2/3 of the
    hi half."""
    halves = [("simhash_lo", 0), ("simhash_lo", SIMHASH_WIDE_BAND_BITS),
              ("simhash_hi", 0), ("simhash_hi", SIMHASH_WIDE_BAND_BITS)]
    return sh.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(band).alias("band"),
                    F.shiftright(col, shift)
                    .bitwiseAND(F.lit(SIMHASH_WIDE_BAND_MASK))
                    .alias("bkey"),
                )
                for band, (col, shift) in enumerate(halves)
            ])
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"),
             F.col("bb.bkey").alias("bkey"))


def simhash_bucket_stats(
    df: DataFrame, cap: int = TEXT_LSH_BUCKET_CAP
) -> DataFrame:
    """Per-band wide-simhash bucket telemetry (see _bucket_stats);
    includes the near-dup augmentation so the numbers describe exactly
    what simhash_dedup's self-join will see."""
    sh = simhash_wide(with_near_dups(df))
    return _bucket_stats(_simhash_wide_banded(sh), cap)


def simhash_dedup(
    df: DataFrame,
    max_hamming: int = SIMHASH_HAMMING_MAX,
    bucket_cap: int = TEXT_LSH_BUCKET_CAP,
) -> DataFrame:
    """SimHash near-dup pairs over the 120-bit wide fingerprint:
    pigeonhole banding (any pair within `max_hamming` < 4 bits must
    agree on at least one of the 4 disjoint 30-bit bands) makes the
    candidate join an equi-join on (band, bkey); candidates verify with
    exact popcount over both 60-bit halves. Scale shape: uniform-corpus
    buckets hold ~n/2^30 rows (candidates ~n^2/2^32, linear to ~10^10
    docs), and any over-`bucket_cap` bucket — a viral boilerplate
    cluster banding cannot split — is salt-capped to ~B*cap/2 pairs
    (_salt_hot_buckets). Never an all-pairs comparison. Includes an
    augmented near-dup corpus (suffix mutation flips few low-margin
    bits -> small hamming distance).

    Shipping telemetry next to the pair output? Use
    simhash_dedup_with_stats — it emits the _bucket_stats row off the
    SAME fingerprint pass instead of re-hashing the corpus."""
    # cache: (doc_id, lo, hi) is ~24 bytes/doc, but the fingerprint
    # behind it costs 2 md5s per word — consumed by the banding pass
    # plus both sides of the verify join
    sh = simhash_wide(with_near_dups(df)).cache()
    # salted keys cached: band explode + hot-join + salt md5 run once,
    # not once per self-join side
    banded = _salt_hot_buckets(
        _simhash_wide_banded(sh), bucket_cap
    ).cache()
    return _simhash_pairs_from(sh, banded, max_hamming)


def _simhash_pairs_from(
    sh: DataFrame, banded_salted: DataFrame, max_hamming: int
) -> DataFrame:
    """Candidate + verify stages shared by simhash_dedup and
    simhash_dedup_with_stats: self-join on the (salted) band key, then
    exact popcount over both 60-bit halves on the deduped candidate
    set. Both inputs are expected cached by the caller."""
    a = banded_salted.alias("a")
    b = banded_salted.alias("b")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # fingerprints come back on the (small) deduped candidate set only —
    # the band self-join moves nothing but (doc_id, band, bkey)
    ham = (
        F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
        + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    ).cast("long")
    return (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"),
                      F.col("simhash_lo").alias("lo_a"),
                      F.col("simhash_hi").alias("hi_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"),
                      F.col("simhash_lo").alias("lo_b"),
                      F.col("simhash_hi").alias("hi_b")),
            "doc_b",
        )
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_dedup_with_stats(
    df: DataFrame,
    max_hamming: int = SIMHASH_HAMMING_MAX,
    bucket_cap: int = TEXT_LSH_BUCKET_CAP,
) -> tuple[DataFrame, DataFrame]:
    """Fused dedup + telemetry: (pairs, bucket_stats) off ONE wide-
    fingerprint pass (see minhash_lsh_with_stats for the rationale —
    the standalone simhash_bucket_stats re-hashes every word of the
    corpus the dedup just fingerprinted). The pre-salt banded
    projection is cached and feeds both the _bucket_stats aggregate and
    the salt step; values are identical to the standalone operators, so
    the oracles are unchanged. Cache lifecycle is caller-owned (see
    curate_corpus's CACHE LIFECYCLE note)."""
    sh = simhash_wide(with_near_dups(df)).cache()
    banded = _simhash_wide_banded(sh).cache()
    stats = _bucket_stats(banded, bucket_cap)
    salted = _salt_hot_buckets(banded, bucket_cap).cache()
    return _simhash_pairs_from(sh, salted, max_hamming), stats


def shingle_sets(df: DataFrame, keep_empty: bool = False) -> DataFrame:
    """(doc_id, sh): distinct 3-word shingles per doc via a fused
    mapInPandas kernel — same set, order, and empty-doc semantics as
    the shingles3() expression (str.split(' ') keeps empties,
    dict.fromkeys preserves first occurrence), but without Spark's
    interpreted per-element HOF walk. keep_empty=True emits <3-word
    docs with an empty array (shingles3's behavior); False drops them
    (the minhash/contamination filter)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids, shs = [], []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                if t is None:
                    if keep_empty:
                        ids.append(int(did))
                        shs.append([])
                    continue
                ws = t.split(" ")
                if len(ws) < 3:
                    if keep_empty:
                        ids.append(int(did))
                        shs.append([])
                    continue
                ids.append(int(did))
                shs.append(
                    list(
                        dict.fromkeys(
                            " ".join(ws[i:i + 3])
                            for i in range(len(ws) - 2)
                        )
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sh": pd.Series(shs, dtype=object),
                }
            )

    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).mapInPandas(gen, "doc_id long, sh array<string>")


def ngram_jaccard_neighbors(df: DataFrame) -> DataFrame:
    """Jaccard of 3-shingle sets between doc i and doc i+1 (a cheap,
    SQL-checkable pairwise similarity probe)."""
    # cache: the shingle kernel would otherwise run once per self-join
    # side; keep_empty matches shingles3 (empty-set docs score 0.0)
    sh = shingle_sets(df, keep_empty=True).cache()
    a = sh.alias("a")
    b = sh.alias("b")
    jac = F.when(
        F.size(F.array_union("a.sh", "b.sh")) > 0,
        F.size(F.array_intersect("a.sh", "b.sh"))
        / F.size(F.array_union("a.sh", "b.sh")),
    ).otherwise(F.lit(0.0))
    return (
        a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
    )


def _quality_parts() -> tuple[Column, Column, Column]:
    """(n_tokens, n_stop, mean_len) over the text column — the shared
    inputs of quality_scores and the curate quality gate."""
    w = words()
    n_tokens = F.size(w).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(
        F.filter(w, lambda x: F.array_contains(stop_arr, x))
    ).cast("long")
    mean_len = (F.length("text") - (n_tokens - 1)) / n_tokens  # avg word len
    return n_tokens, n_stop, mean_len


def quality_score_col() -> Column:
    """The deterministic composite quality score as a single map-side
    expression (identical arithmetic to quality_scores' score column)."""
    n_tokens, n_stop, mean_len = _quality_parts()
    stop_ratio = F.round(n_stop / n_tokens, 4)
    return F.round(
        F.least(F.lit(1.0), n_tokens / F.lit(64.0)) * 0.5
        + stop_ratio * 0.3
        + F.least(F.lit(1.0), mean_len / F.lit(8.0)) * 0.2,
        4,
    )


def quality_scores(df: DataFrame) -> DataFrame:
    """Shallow text-quality features + a deterministic composite score."""
    n_tokens, n_stop, mean_len = _quality_parts()
    stop_ratio = F.round(n_stop / n_tokens, 4)
    score = quality_score_col()
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stop"),
        stop_ratio.alias("stop_ratio"),
        F.round(mean_len, 4).alias("mean_word_len"),
        score.alias("quality_score"),
    )


def lang_id_heuristic(df: DataFrame) -> DataFrame:
    """Deterministic stopword-hit language heuristic (the label column is
    synthetic, so the heuristic is its own spec — oracle-checkable)."""
    w = words()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    ratio = hits / F.size(w)
    pred = (
        F.when(ratio >= 0.12, F.lit("en"))
        .when(ratio >= 0.05, F.lit("mixed"))
        .otherwise(F.lit("other"))
    )
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round(ratio, 4).alias("stop_hit_ratio"),
        pred.alias("lang_pred"),
    )


def doc_fingerprints(df: DataFrame) -> DataFrame:
    """Position-weighted rolling fingerprint over word hashes, mod 2^31-1
    (products stay < 2^63, portable to DuckDB arithmetic)."""
    M = 2147483647
    w = words()
    hs = F.transform(
        w,
        lambda word: F.conv(F.substring(F.md5(word), 1, 7), 16, 10).cast("long"),
    )
    rolled = F.aggregate(
        F.col("hs"),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 131 + h) % M,
    )
    return (
        df.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.md5("text").alias("md5_hex"),
            F.length("text").cast("long").alias("n_chars"),
            hs.alias("hs"),
        )
        .withColumn("rolling_fp", rolled)
        .select("doc_id", "md5_hex", "n_chars", "rolling_fp")
    )


def token_stats(df: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (4-char chunks) count."""
    n_ws = F.size(words()).cast("long")
    n_bpe = F.ceil(F.length("text") / F.lit(4.0)).cast("long")
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars"),
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
    )


# Frozen BPE merge table (rank order), the shape a production
# tokenizer ships in: training freezes merges once, every pipeline
# stage afterwards replays them verbatim. Pairs operate on
# space-separated symbol sequences; applying literal left-to-right
# replaces in rank order IS the standard fast BPE encode.
BPE_MERGES = [
    ("t h", "th"), ("i n", "in"), ("e r", "er"), ("a n", "an"),
    ("o n", "on"), ("e n", "en"), ("th e", "the"), ("o r", "or"),
    ("a r", "ar"), ("e s", "es"), ("s t", "st"), ("l e", "le"),
    ("a t", "at"), ("er s", "ers"), ("in g", "ing"), ("o u", "ou"),
    ("i t", "it"), ("i s", "is"), ("a l", "al"), ("e d", "ed"),
]


BPE_OPEN = "\x01"   # symbol delimiters; must not occur inside a word
BPE_CLOSE = "\x02"


def tokenize_bpe(df: DataFrame, merges=None) -> DataFrame:
    """REAL greedy-merge BPE token counting under a frozen merge table
    — the token accounting pack_sequences / token_histogram /
    corpus_mixture should be fed in production (whitespace counts
    undercount code/CJK and overcount English; token_stats' 4-char
    proxy is a guess). Per word: split to characters, fold the merges
    in rank order, count surviving symbols. Output one row per doc:
    (doc_id, n_words, n_bpe_tokens, bpe_per_word); null-text docs
    report explicit zeros.

    EXACTNESS: each symbol is wrapped in its own OPEN/CLOSE marker
    pair (\\x01 sym \\x02), so the literal replace of
    '<a><t>' -> '<at>' is boundary-exact on BOTH sides — a bare
    space-separated rewrite falsely merges when one symbol PREFIXES
    another ('a the' contains 'a t'), a terminator-only scheme when
    one symbol's SUFFIX abuts ('es t' contains 's t'), and a shared
    single separator cannot chain adjacent merges ('t h t h' consumes
    the middle boundary). Distinct unshared markers dodge all three;
    pinned by the differential test against a reference greedy-BPE
    encoder including the 'athe' and 'ingesting' traps. Precondition:
    words must not contain \\x01/\\x02 (true for any text that
    survived normalize_text / the extractor; documented, not checked
    per row).

    Scale shape: the ENTIRE encode is one map-side expression over
    each doc's words array (20 chained literal replaces per word — a
    linear expression chain, each operand lambda-derived, so the HOF
    materialization rule doesn't apply) folded by F.aggregate into one
    long per doc. Zero shuffles, zero Python, zero joins."""
    merges = BPE_MERGES if merges is None else list(merges)

    def pat(a):
        l, r = a.split(" ")
        return BPE_OPEN + l + BPE_CLOSE + BPE_OPEN + r + BPE_CLOSE

    def word_syms(w):
        s = F.regexp_replace(w, "(.)", BPE_OPEN + "$1" + BPE_CLOSE)
        for a, b in merges:
            s = F.replace(
                s, F.lit(pat(a)), F.lit(BPE_OPEN + b + BPE_CLOSE)
            )
        # symbols = surviving CLOSE markers (an empty word counts 0)
        return (
            F.length(s)
            - F.length(F.replace(s, F.lit(BPE_CLOSE), F.lit("")))
        ).cast("long")

    total = F.aggregate(
        F.transform(words(), word_syms),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    nw = F.size(words()).cast("long")
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce(nw, F.lit(0)).cast("long").alias("n_words"),
        F.coalesce(total, F.lit(0)).cast("long").alias("n_bpe_tokens"),
        F.coalesce(
            F.round(total / nw, 4), F.lit(0.0)
        ).alias("bpe_per_word"),
    )


BPE_TRAIN_ROUNDS = 3


def train_bpe(
    df: DataFrame,
    n_merges: int = BPE_TRAIN_ROUNDS,
    vocab_k: int | None = None,  # default LM_VOCAB_K (defined below)
) -> DataFrame:
    """DISTRIBUTED BPE merge training — learn the merge table
    tokenize_bpe replays, from the corpus itself. Standard practice
    (and the only sane shape at 100 TB): BPE trains on the WORD
    FREQUENCY TABLE, not the raw token stream — so the distributed
    work is one explode -> partial-aggregated word count bounded to
    the top-vocab_k types, and each training round is a slim
    pair-count aggregate over that table. Per round: extract adjacent
    symbol pairs from each word's marker string (the tokenize_bpe
    encoding), count them weighted by word frequency, take the argmax
    (count desc / left asc / right asc — deterministic under any
    aggregation order), and apply the winning merge via a broadcast
    1-row join (no collect: the loop builds a plan, the driver never
    sees data). Output: one row per learned merge, (rank, left,
    right, merged, pair_n).

    Scale shape: ROUNDS x (pair explode over <= vocab_k rows ->
    partial-agg count -> 1-row TakeOrdered -> broadcast apply), each
    round non-eager-localCheckpointed so the iteration's lineage stays
    flat (the IVF/pagerank planning lesson). The corpus is touched
    exactly once, by the word count."""
    if vocab_k is None:
        vocab_k = LM_VOCAB_K
    wc = (
        df.select(F.explode(words()).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(vocab_k)
    )
    state = wc.select(
        F.regexp_replace(
            "word", "(.)", BPE_OPEN + "$1" + BPE_CLOSE
        ).alias("s"),
        "c",
    ).localCheckpoint(eager=False)
    sym_re = BPE_OPEN + "([^" + BPE_CLOSE + "]*)" + BPE_CLOSE
    merges = []
    for rank in range(n_merges):
        syms = F.regexp_extract_all(F.col("s"), F.lit(sym_re), F.lit(1))
        # slice(_, 1, size-1) zip slice(_, 2, size-1): adjacent pairs;
        # a 1-symbol word yields length-0 slices -> zero pairs (words
        # are non-empty by the upstream filter, so size >= 1 always)
        pairs = F.arrays_zip(
            F.slice(syms, 1, F.size(syms) - 1).alias("l"),
            F.slice(syms, 2, F.size(syms) - 1).alias("r"),
        )
        best = (
            state.select(F.explode(pairs).alias("p"), "c")
            .groupBy(
                F.col("p.l").alias("left"), F.col("p.r").alias("right")
            )
            .agg(F.sum("c").cast("long").alias("pair_n"))
            .orderBy(F.desc("pair_n"), F.asc("left"), F.asc("right"))
            .limit(1)
        )
        merges.append(
            best.select(
                F.lit(rank).cast("long").alias("rank"),
                "left",
                "right",
                F.concat("left", "right").alias("merged"),
                "pair_n",
            ).localCheckpoint(eager=False)
        )
        pat = F.concat(
            F.lit(BPE_OPEN), F.col("left"), F.lit(BPE_CLOSE),
            F.lit(BPE_OPEN), F.col("right"), F.lit(BPE_CLOSE),
        )
        rep = F.concat(
            F.lit(BPE_OPEN), F.col("left"), F.col("right"),
            F.lit(BPE_CLOSE),
        )
        state = (
            state.join(F.broadcast(best))
            .select(F.replace(F.col("s"), pat, rep).alias("s"), "c")
            .localCheckpoint(eager=False)
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


VOCAB_TOPK = 50


PERC_FEATURES = 64
PERC_ITERS = 3


def train_quality_classifier(
    df: DataFrame,
    n_features: int = PERC_FEATURES,
    iters: int = PERC_ITERS,
    quality_min: float = 0.5,  # == CURATE_QUALITY_MIN (defined below)
    text_col: str = "text",
) -> DataFrame:
    """Trainable quality classifier: an integer batch perceptron over
    hashed bag-of-words features, distilling the handcrafted quality
    gate (quality_score_col >= quality_min -> y=+1 else -1) into a
    learned model — the fasttext-style 'train a classifier on heuristic
    labels' step of CCNet/RefinedWeb-class pipelines. Returns one row
    per document scored under the FINAL weights:
    (doc_id, label, score, pred, correct).

    Why a perceptron and not logistic regression: the batch update
    w += sum_{misclassified} y*x is EXACT BIGINT arithmetic end to end
    (features are word counts, labels are ±1), so any aggregation
    order — and the DuckDB oracle unrolling the identical rounds as
    CTEs (the pagerank/train_bpe pattern) — reproduces the weights
    bit-identically; a sigmoid's libm would make the value hash flap
    between engines.

    Scale shape: ONE corpus scan builds the (doc_id, y, feat, cnt)
    sparse feature table (hashed md5(word) % n_features — engine-
    portable), partial-aggregated, repartitioned on doc_id and
    checkpointed; iterations never touch text again. Each round is (a)
    margins: map-side join against the BROADCAST n_features-row weight
    table + a partial-agg sum per doc that reuses the feature table's
    doc_id partitioning, and (b) update: misclassified doc ids (already
    doc_id-partitioned, from (a)'s aggregation) equi-join the feature
    table + a partial-agg sum into n_features rows. Nothing wider than
    (doc_id, feat, cnt) ever shuffles; weights ride a non-eager
    checkpoint chain (flat plans, the IVF/pagerank lesson). Overflow:
    |w| <= iters * total token count — BIGINT-safe past 10^15 tokens.

    Null/empty contract: a null-text doc has no feature rows; it still
    gets an output row (label -1 — the gate fails on null — score 0,
    pred -1). Tokens hash by FULL word; collisions at n_features=64 are
    the hashing trick's documented trade, not a defect."""
    spark = df.sparkSession
    y = (
        F.when(quality_score_col() >= quality_min, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
    )
    base = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        y.alias("y"),
        words(text_col).alias("ws"),
    )
    feat = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long")
        % n_features
    )
    feats = (
        base.select("doc_id", "y", F.explode("ws").alias("w"))
        .select("doc_id", "y", feat.alias("feat"))
        .groupBy("doc_id", "y", "feat")
        .agg(F.count("*").alias("cnt"))
        .repartition("doc_id")
        .localCheckpoint(eager=True)
    )
    w = spark.range(n_features).select(
        F.col("id").alias("feat"), F.lit(0).cast("long").alias("w")
    )
    for _ in range(iters):
        margins = (
            feats.join(F.broadcast(w), "feat")
            .groupBy("doc_id")
            .agg(
                F.first("y").alias("y"),
                F.sum(F.col("cnt") * F.col("w")).alias("margin"),
            )
        )
        mis = margins.filter(
            F.col("y") * F.col("margin") <= 0
        ).select("doc_id")
        upd = (
            feats.join(mis, "doc_id")
            .groupBy("feat")
            .agg(F.sum(F.col("y") * F.col("cnt")).alias("u"))
        )
        w = (
            w.join(upd, "feat", "left")
            .select(
                "feat",
                (F.col("w") + F.coalesce(F.col("u"), F.lit(0))).alias("w"),
            )
            .localCheckpoint(eager=False)
        )
    scored = (
        feats.join(F.broadcast(w), "feat")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("score"))
    )
    score = F.coalesce(F.col("score"), F.lit(0)).cast("long")
    pred = F.when(score > 0, F.lit(1)).otherwise(F.lit(-1)).cast("long")
    return (
        base.select("doc_id", F.col("y").alias("label"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "label",
            score.alias("score"),
            pred.alias("pred"),
            (pred == F.col("label")).alias("correct"),
        )
    )


def vocab_topk(df: DataFrame, k: int = VOCAB_TOPK) -> DataFrame:
    """Corpus vocabulary statistics: the k most frequent words with
    document frequency. Scale shape: explode -> two-level aggregate —
    the (word, doc) distinct and the word counts both partial-aggregate
    map-side, so the shuffle carries one row per distinct (word, doc) /
    word per task, never the raw token stream; the final top-k is a
    single ORDER BY LIMIT over #vocab rows (tiny)."""
    w = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(words()).alias("word"),
    )
    # one explode, two cascaded shuffles, NO join: occurrences and
    # docfreq both derive from the per-(word, doc) counts — sum(c) and
    # row count per word in a single second-level aggregate. The old
    # plan ran the explode (the dominant byte volume) twice, once per
    # aggregate branch, then joined them back.
    wd = w.groupBy("word", "doc_id").agg(F.count("*").alias("c"))
    return (
        wd.groupBy("word")
        .agg(
            F.sum("c").cast("long").alias("n_occurrences"),
            F.count("*").cast("long").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("word"))
        .limit(k)
    )


TFIDF_TOPK = 3


def tfidf_top_terms(df: DataFrame, k: int = TFIDF_TOPK) -> DataFrame:
    """Per-document top-k TF-IDF terms: score = tf * ln(N / df_w).
    Scale shape: explode -> two partial-aggregating groupBys (term
    frequency per (doc, word); document frequency per word); N arrives
    as a broadcast single-row aggregate (no driver-side count); the
    final per-doc top-k window partitions on doc_id — uniformly small
    groups (a doc's distinct words), never a skewed key. Ties inside a
    doc break on (score desc, word asc), so output is deterministic."""
    from pyspark.sql.window import Window

    w = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(words()).alias("word"),
    )
    tf = w.groupBy("doc_id", "word").agg(
        F.count("*").cast("long").alias("tf")
    )
    # df_w derives from tf (a doc contributes exactly one tf row per
    # distinct word), so the explode — the dominant byte volume — runs
    # once: AQE reuses the tf shuffle stage for both consumers. The
    # count argument must GENUINELY reference tf (a predicate the
    # optimizer cannot fold away; tf >= 1 always holds but is not
    # provable statically): count("tf") gets rewritten to count(*)
    # because count(1) results are non-null, column pruning then strips
    # tf from this branch's partial aggregate, and the two exchange
    # subtrees stop being canonically identical — no stage reuse, two
    # explodes. N stays a 1-column pruned scan of the source.
    dfreq = tf.groupBy("word").agg(
        F.count(F.when(F.col("tf") >= 1, 1)).cast("long").alias("df_w")
    )
    n_docs = df.select(
        F.countDistinct(F.col("doc_id").cast("long")).alias("n_docs")
    )
    scored = (
        tf.join(dfreq, "word")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df_w")), 4),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "word", "tf", "df_w", "tfidf")
    )


LM_VOCAB_K = 2048
# keep-gate ceiling on mean surprisal, in bits (~= log2 perplexity):
# 12 bits ~ unigram perplexity 4096 — far above any coherent document
# under its own corpus LM, failed only by docs dominated by ultra-rare
# or OOV tokens (mojibake, hex dumps, tag soup the extractor missed)
LM_SURPRISAL_MAX = 12.0


def lm_surprisal_scores(
    df: DataFrame,
    vocab_k: int = LM_VOCAB_K,
    surprisal_max: float = LM_SURPRISAL_MAX,
) -> DataFrame:
    """CCNet-style LM quality gate: score every document by its mean
    per-token surprisal under the corpus's OWN unigram LM (top-vocab_k
    words by count), one row per doc — (doc_id, n_tokens, oov_ratio,
    mean_surprisal, lm_ok). Docs dominated by ultra-rare/OOV tokens
    (mojibake, hex dumps, extraction failures) score high and fail the
    gate; boilerplate scores low. Null-text docs report n_tokens=0 and
    fail (one row per doc, like quality/repetition — never silently
    dropped).

    ENGINE-EXACT surprisal: instead of ln(count/N) — whose last-ulp
    behavior differs between the JVM's Math.log and DuckDB's libm, so
    a value-hash oracle could flap — a token's surprisal is the integer
    bit bucket floor(log2(N div count)) = length(bin(N div count)) - 1,
    computed in exact BIGINT arithmetic identically by both engines
    (ranking-equivalent to log-prob at 1-bit granularity; OOV tokens
    take count=1, the maximum bucket). The mean is then a single
    sum/count double division — the same IEEE op everywhere.

    Scale shape: two passes over the token stream, both explode ->
    map-side partial aggregation (the LM build shuffles one row per
    distinct word per task; the scoring pass collapses to one row per
    doc before its shuffle). The LM itself is a distributed top-k
    (TakeOrderedAndProject, deterministic count-desc/word-asc
    tie-break) broadcast to the scoring join, bounded by vocab_k at any
    corpus size; total token count N rides a broadcast 1-row aggregate
    (the tfidf pattern). The word-count table is cached to feed the LM,
    N, and nothing else twice — cache lifecycle is caller-owned (see
    curate_corpus's CACHE LIFECYCLE note)."""
    docs = df.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    tok = docs.select("doc_id", F.explode(words()).alias("word"))
    counts = tok.groupBy("word").agg(
        F.count("*").cast("long").alias("c")
    ).cache()
    lm = counts.orderBy(F.desc("c"), F.asc("word")).limit(vocab_k)
    n_tot = counts.agg(F.sum("c").cast("long").alias("n_total"))
    scored = (
        tok.join(F.broadcast(lm), "word", "left")
        .join(F.broadcast(n_tot))
        .withColumn("c_eff", F.coalesce("c", F.lit(1)).cast("long"))
        .withColumn(
            "surp",
            (F.length(F.bin(F.expr("n_total div c_eff"))) - 1).cast(
                "long"
            ),
        )
        .withColumn("oov", F.when(F.col("c").isNull(), 1).otherwise(0))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("oov").cast("long").alias("oov_n"),
        F.round(F.avg("surp"), 4).alias("mean_surprisal"),
    )
    out = docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(
            F.round(F.col("oov_n") / F.col("n_tokens"), 4), F.lit(0.0)
        ).alias("oov_ratio"),
        F.coalesce("mean_surprisal", F.lit(0.0)).alias("mean_surprisal"),
    )
    return out.withColumn(
        "lm_ok",
        (F.col("n_tokens") > 0)
        & (F.col("mean_surprisal") <= F.lit(float(surprisal_max))),
    )


def dsir_weights(
    df: DataFrame, target: DataFrame, vocab_k: int = LM_VOCAB_K
) -> DataFrame:
    """DSIR-style importance-resampling weights (Xie et al. 2023,
    'Data Selection for Language Models via Importance Resampling'):
    score each raw doc by how target-like its token distribution is,
    sum over tokens of log p_target(w) - log p_raw(w) — the weight a
    resampler then draws against to tilt a web crawl toward a curated
    target domain. Inputs: the raw corpus and a (usually much smaller)
    target-domain sample, both with (doc_id, text). Output one row per
    raw doc: (doc_id, n_tokens, dsir_bits, avg_bits).

    ENGINE-EXACT math, the lm_surprisal trick twice: a token's
    importance is bits_raw(w) - bits_tgt(w) where bits_X(w) =
    floor(log2(N_X div c_X(w))) in exact BIGINT arithmetic — positive
    total = commoner in the target than in the raw crawl. Both
    unigram tables are bounded to their top-vocab_k (count-desc /
    word-asc tie-break); out-of-vocab takes count=1 on either side —
    the bounded feature space standing in for DSIR's hashing trick.
    Null-text docs report n_tokens=0 / dsir_bits=0 (one row per raw
    doc, never silently dropped).

    Scale shape: one explode pass per corpus into partial-aggregated
    word counts; both LMs are distributed top-k broadcasts bounded by
    vocab_k; the scoring pass collapses to one row per doc before its
    shuffle. The raw counts table is cached (feeds its LM and N);
    cache lifecycle is caller-owned (see curate_corpus)."""
    docs = df.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    tok = docs.select("doc_id", F.explode(words()).alias("word"))
    ttok = target.select(F.explode(words()).alias("word"))
    rc = tok.groupBy("word").agg(
        F.count("*").cast("long").alias("c_raw")
    ).cache()
    tc = ttok.groupBy("word").agg(
        F.count("*").cast("long").alias("c_tgt")
    ).cache()
    raw_lm = rc.orderBy(F.desc("c_raw"), F.asc("word")).limit(vocab_k)
    tgt_lm = tc.orderBy(F.desc("c_tgt"), F.asc("word")).limit(vocab_k)
    n_raw = rc.agg(F.sum("c_raw").cast("long").alias("n_raw"))
    n_tgt = tc.agg(F.sum("c_tgt").cast("long").alias("n_tgt"))
    bits = lambda n, c: F.length(F.bin(F.expr(f"{n} div {c}"))) - 1  # noqa: E731
    scored = (
        tok.join(F.broadcast(raw_lm), "word", "left")
        .join(F.broadcast(tgt_lm), "word", "left")
        .join(F.broadcast(n_raw))
        .join(F.broadcast(n_tgt))
        .withColumn("cr", F.coalesce("c_raw", F.lit(1)).cast("long"))
        .withColumn("ct", F.coalesce("c_tgt", F.lit(1)).cast("long"))
        .withColumn(
            "imp",
            (bits("n_raw", "cr") - bits("n_tgt", "ct")).cast("long"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("imp").cast("long").alias("dsir_bits"),
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("dsir_bits", F.lit(0)).cast("long").alias("dsir_bits"),
        F.coalesce(
            F.round(F.col("dsir_bits") / F.col("n_tokens"), 4), F.lit(0.0)
        ).alias("avg_bits"),
    )


PACK_CTX = 512


def pack_sequences(df: DataFrame, ctx: int = PACK_CTX) -> DataFrame:
    """Training-example assembly: assign every document a token offset
    in its source shard's concatenated token stream and the id of the
    fixed-ctx training sequence its first token lands in — (doc_id,
    source, n_tokens, tok_offset, seq_id). This is the deterministic
    contiguous-packing rule (docs in doc_id order, exclusive prefix
    sum, seq_id = tok_offset div ctx): a downstream shard writer cuts
    the stream at ctx boundaries, so docs may straddle sequences —
    offset assignment is the distributed part; the straddle handling
    is the (local, per-sequence) writer's. Null text counts 0 tokens
    and still gets an offset (one row per doc).

    Skew contract (the sessionize contract, eventops.py): the prefix
    sum is a per-source single-task sort, exact and deterministic, so
    one source shard must fit one task's sort (~10^7 docs) — a 100 TB
    run packs per (source, date-shard) keys, which is also what keeps
    training shards reproducible under re-partitioning. The shuffle
    carries only (doc_id, source, n_tokens) — never the text."""
    from pyspark.sql.window import Window

    n_tok = F.when(
        F.col("text").isNull(), F.lit(0)
    ).otherwise(F.size(words())).cast("long")
    base = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return base.select(
        "doc_id", "source", "n_tokens", off.alias("tok_offset")
    ).withColumn(
        # exact BIGINT division — no double rounding at 10^13+ offsets
        "seq_id", F.expr(f"tok_offset div {int(ctx)}").cast("long")
    )


def token_histogram(df: DataFrame) -> DataFrame:
    """Corpus length profile: docs and tokens per log2 token-count
    bucket — (token_bucket, n_docs, n_tokens), the telemetry a
    sequence-packing/truncation decision reads (how much of the corpus
    sits beyond the context length?). Bucket is the exact integer
    floor(log2(t)) = length(bin(t)) - 1 in BIGINT math (the
    lm_surprisal trick — no libm last-ulp flap between engines);
    zero-token/null docs land in bucket -1, never dropped.

    Scale shape: one map-side expression collapsing into a
    partial-aggregated groupBy over at most ~40 distinct buckets — the
    smallest shuffle an aggregation can have (one row per bucket per
    task)."""
    t = F.when(
        F.col("text").isNull(), F.lit(0)
    ).otherwise(F.size(words())).cast("long")
    bucket = F.when(
        t == F.lit(0), F.lit(-1)
    ).otherwise(F.length(F.bin(t)) - 1).cast("long")
    return (
        df.select(bucket.alias("token_bucket"), t.alias("t"))
        .groupBy("token_bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("t").cast("long").alias("n_tokens"),
        )
    )


MIXTURE_TARGETS = {"en": 0.4, "zh": 0.2, "es": 0.15, "de": 0.15,
                   "fr": 0.1}


def corpus_mixture(
    df: DataFrame, targets: dict[str, float] | None = None
) -> DataFrame:
    """Data-mixing weights for a pretraining corpus: per-language doc
    and token counts, each language's actual token share, its target
    share, and the sampling weight (target/actual) a mixing job
    multiplies into per-doc sampling rates to reshape the corpus
    toward the target mixture — (lang, n_docs, n_tokens, token_share,
    target_share, weight), one row per observed language. Languages
    missing from `targets` get target_share 0.0 (weight 0 — excluded
    from the mix); weight > 1 means the language is under-represented
    and must be up-sampled/repeated.

    Scale shape: the per-doc token count is a map-side expression that
    collapses into a partial-aggregated groupBy(lang) — the only
    shuffle moves one slim row per lang per task. The corpus total
    rides a broadcast 1-row aggregate (the tfidf/lm pattern), so the
    share division never re-shuffles. Null text counts 0 tokens; null
    lang groups under its own NULL row like any SQL GROUP BY."""
    tmap = MIXTURE_TARGETS if targets is None else targets
    n_tok = F.when(
        F.col("text").isNull(), F.lit(0)
    ).otherwise(F.size(words())).cast("long")
    per_lang = (
        df.select("lang", n_tok.alias("t"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("t").cast("long").alias("n_tokens"),
        )
    )
    total = per_lang.agg(F.sum("n_tokens").cast("long").alias("tot"))
    target = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(float(v)))
            for k, v in sorted(tmap.items())
        ],
        F.lit(0.0),
    )
    share = F.round(F.col("n_tokens") / F.col("tot"), 6)
    return (
        per_lang.join(F.broadcast(total))
        .select(
            "lang", "n_docs", "n_tokens",
            share.alias("token_share"),
            target.alias("target_share"),
            F.round(
                target / (F.col("n_tokens") / F.col("tot")), 6
            ).alias("weight"),
        )
    )


def sample_mixture(
    df: DataFrame, targets: dict[str, float] | None = None
) -> DataFrame:
    """Apply corpus_mixture's weights as a DETERMINISTIC resampling
    plan: one row per kept doc, (doc_id, lang, n_copies) — the exact
    replication count a mixing job materializes (n_copies > 1 =
    up-sampled/repeated epochs for under-represented languages,
    fractional weights resolved per doc by hash). Acceptance is
    hash-gated in exact integer ppm: w_ppm = round(weight * 10^6);
    n_copies = w_ppm div 10^6 + (md5_32(doc_id) mod 10^6 <
    w_ppm mod 10^6). Same doc, same corpus -> same copies on any
    cluster, any partitioning, any engine — a mixture plan that can't
    be replayed bit-identically can't be audited. Docs whose lang has
    target 0 (or NULL lang) drop, matching corpus_mixture's weight-0
    exclusion contract.

    Scale shape: corpus_mixture's one slim groupBy(lang) + 1-row
    total, then the lang->w_ppm table (lang-cardinality tiny) joins
    back BROADCAST and the copy decision is a map-side md5 — the
    frontier-scale corpus is touched by zero additional shuffles.
    doc_id passes through with its INPUT type (the md5 gate hashes its
    string form), so string identities survive — no long cast to
    NULL-poison them (the dedup_near_stream id_mode lesson)."""
    mix = corpus_mixture(df, targets)
    # a lang with target > 0 but ZERO tokens has weight = Infinity;
    # the non-ANSI long cast would saturate that to Long.MaxValue and
    # hand every such doc ~9e12 copies — "infinitely up-sample a lang
    # with no text" is meaningless, so those langs drop like weight-0
    rates = mix.where(F.col("n_tokens") > 0).select(
        "lang",
        F.round(F.col("weight") * 1000000).cast("long").alias("w_ppm"),
    )
    h6 = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
            16, 10,
        ).cast("long")
        % 1000000
    )
    return (
        df.select("doc_id", "lang")
        .join(F.broadcast(rates), "lang")
        .select(
            "doc_id",
            "lang",
            (
                F.expr("w_ppm div 1000000")
                + (h6 < F.col("w_ppm") % 1000000).cast("long")
            ).cast("long").alias("n_copies"),
        )
        .where(F.col("n_copies") > 0)
    )


# PII patterns are deliberately restricted to constructs with identical
# semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
# bounded quantifiers, \b on ASCII — no alternation, backrefs, or
# lookaround, so the match sets (and therefore the oracle hash) agree.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction for a training corpus: replace emails, IPv4
    addresses, and NANP-style phone numbers with typed placeholder
    tokens, one row per doc — (doc_id, n_emails, n_ips, n_phones,
    text_redacted). Counts are per-pattern matches on the ORIGINAL
    text (telemetry for a removal-rate dashboard); redaction applies
    sequentially email -> ip -> phone, so an address-like host inside
    a non-matching email (u@1.2.3.4 — digit TLD, not an email) still
    gets its IP masked. Null text passes through as null with zero
    counts (one row per doc, never dropped).

    Scale shape: pure map-side Catalyst expressions (regexp_count /
    regexp_replace), zero shuffles, whole-stage-codegen eligible —
    the per-byte regex cost is the floor for this op on any engine."""
    t = F.col(text_col)
    red = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4, "<IP>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")

    def cnt(pat: str) -> Column:
        return F.coalesce(
            F.regexp_count(t, F.lit(pat)), F.lit(0)
        ).cast("long")

    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        cnt(PII_EMAIL).alias("n_emails"),
        cnt(PII_IPV4).alias("n_ips"),
        cnt(PII_PHONE).alias("n_phones"),
        red.alias("text_redacted"),
    )


def url_canon_cols(url_col: str = "url") -> tuple[Column, Column, Column]:
    """(url_canon, host, n_utm_dropped) as pure map-side expressions —
    the canonicalization shared by url_normalize (batch; see its
    docstring for the rule set and parity notes) and
    streaming.url_frontier_stream (where the dup-group step is the
    state store instead of a groupBy)."""
    u = F.col(url_col)
    defrag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(defrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = F.lower(F.regexp_extract(defrag, _AUTHORITY_RE, 1))
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    rest = F.regexp_replace(defrag, _AUTHORITY_STRIP_RE, "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"^[^?]*[?](.*)$", 1)
    params = F.split(query, "&")
    kept = F.filter(params, lambda p: ~F.startswith(p, F.lit("utm_")))
    n_dropped = F.when(
        query == "", F.lit(0)
    ).otherwise(F.size(params) - F.size(kept)).cast("long")
    qcanon = F.when(query == "", F.lit("")).otherwise(
        F.array_join(kept, "&")
    )
    # strip ALL trailing slashes (one pass of '/+$'), not just one —
    # '/a//' must canonicalize straight to '/a', or canon(canon(x))
    # != canon(x) and two crawl cycles disagree about dup groups
    # (pinned by test_url_normalize_is_idempotent)
    stripped = F.regexp_replace(path, r"/+$", "")
    path_canon = F.when(
        (path == "") | (stripped == ""), F.lit("/")
    ).otherwise(stripped)
    default_port = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        path_canon,
        F.when(qcanon == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), qcanon)
        ),
    )
    return canon, host, n_dropped


def url_normalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL canonicalization + duplicate grouping — the step BEFORE any
    content fetch in a crawl pipeline (CCNet/RefinedWeb dedup their URL
    frontier first; at 10^12 candidate URLs this is the cheapest dedup
    you will ever run). Canonical form:

      1. strip the fragment ('#...'),
      2. lowercase scheme and host (ONLY those — path/query case is
         significant per RFC 3986),
      3. drop a default port (:80 for http, :443 for https),
      4. drop utm_* tracking params, keeping the rest in order (no '?'
         if none survive),
      5. strip ALL trailing '/' from the path ('' and '/'-only
         collapse to '/').

    Output: (doc_id, url_canon, host, n_utm_dropped, keeper_id,
    is_dup) — keeper_id is the minimum doc_id sharing the canonical
    URL, so `is_dup` drops every fetch but one per group. One row per
    input doc, never silently dropped: a NULL url yields NULL
    canon/host/keeper and is_dup=false (null urls are nobody's
    duplicate); a scheme-less string still canonicalizes
    deterministically (empty scheme/host, the raw string as path).

    Scale shape: canonicalization is pure map-side Catalyst regex /
    string expressions (zero shuffles, codegen); the group step is a
    partial-aggregatable groupBy(min) on the canonical string plus one
    equi-join back — no window sort, so a viral URL repeated 10^8
    times costs a map-side combine, not a single-task sort (the
    media_dedup rank window would serialize exactly that group).
    Regexes use the Java/RE2-identical subset only (see PII_EMAIL's
    oracle-parity note)."""
    canon, host, n_dropped = url_canon_cols(url_col)
    canon_df = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        canon.alias("url_canon"),
        host.alias("host"),
        n_dropped.alias("n_utm_dropped"),
    )
    keepers = canon_df.filter(F.col("url_canon").isNotNull()).groupBy(
        "url_canon"
    ).agg(F.min("doc_id").alias("keeper_id"))
    # left join: a NULL url canonicalizes to NULL and must still emit
    # its row (never silently dropped — an inner join on the canon key
    # would eat it); null-url docs are nobody's duplicate
    return canon_df.join(keepers, "url_canon", "left").select(
        "doc_id",
        "url_canon",
        "host",
        "n_utm_dropped",
        "keeper_id",
        F.when(F.col("url_canon").isNull(), F.lit(False))
        .otherwise(F.col("doc_id") != F.col("keeper_id"))
        .alias("is_dup"),
    )


def normalize_text(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """CCNet-style text normalization — the canonical form dedup keys
    and shingle hashes should be computed over, so that trivially
    perturbed copies (case, digits, control chars, whitespace runs)
    collide: control chars -> space, optional lowercase, every digit
    -> '0', whitespace runs collapsed, ends trimmed. Output one row
    per doc: (doc_id, text_norm, n_chars, n_chars_norm); NULL text
    stays NULL with zero counts (never dropped).

    Deliberately NOT unicode-NFC/accent folding: Java's Normalizer and
    other engines' nfc functions disagree on edge cases, which would
    make the canonical form engine-dependent — the one property a
    dedup key must not have. The regex subset is Java/RE2-identical
    (see pii_scrub's parity note).

    Scale shape: pure map-side Catalyst string expressions, zero
    shuffles, whole-stage codegen."""
    t = F.col(text_col)
    t1 = F.regexp_replace(t, r"[\x00-\x1f\x7f]", " ")
    t2 = F.lower(t1) if lowercase else t1
    t3 = F.regexp_replace(t2, "[0-9]", "0")
    t4 = F.trim(F.regexp_replace(t3, " +", " "))
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        t4.alias("text_norm"),
        F.coalesce(F.length(t), F.lit(0)).cast("long").alias("n_chars"),
        F.coalesce(F.length(t4), F.lit(0))
        .cast("long")
        .alias("n_chars_norm"),
    )


SHUFFLE_SHARDS_DEFAULT = 8


def _md5_60_of(col: Column) -> Column:
    """60-bit integer from the md5 hex prefix — the house
    engine-portable hash (the _sample_parts / salt-group idiom);
    DuckDB replays it as CAST('0x' || substr(md5(s),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shuffle_shards(
    df: DataFrame,
    n_shards: int = SHUFFLE_SHARDS_DEFAULT,
    salt: int = 0,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the 'write the
    training corpus in a reproducibly random order' step every
    pretraining pipeline ends with. Each doc gets
    shard = md5_60(doc_id ':' salt) % n_shards and a dense within-shard
    position ordered by an independent md5_60(salt ':' doc_id) key
    (doc_id tiebreak), so the (shard, pos) permutation is a pure
    function of (doc_ids, n_shards, salt): any engine, any run, any
    partitioning reproduces it, and bumping `salt` is the per-epoch
    reshuffle — same doc set, fresh permutation, no state. Output one
    row per doc: (doc_id, shard, pos).

    Scale shape: ONE hash-partition exchange on shard; the per-shard
    sort + row_number runs one task per shard, so n_shards is the
    parallelism AND the task-size knob — size it so a shard fits a
    task (10^12 docs / 256k shards ≈ 4M rows/task), which md5
    uniformity guarantees within noise (no salting needed: the hash IS
    the balance). The writer form is
    repartition(shard).sortWithinPartitions(pos).write."""
    from pyspark.sql.window import Window

    sid = F.col("doc_id").cast("string")
    s = str(int(salt))
    win = Window.partitionBy("shard").orderBy("okey", "doc_id")
    return (
        df.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            (_md5_60_of(F.concat(sid, F.lit(":" + s))) % n_shards)
            .alias("shard"),
            _md5_60_of(F.concat(F.lit(s + ":"), sid)).alias("okey"),
        )
        .withColumn("pos", (F.row_number().over(win) - 1).cast("long"))
        .select("doc_id", "shard", "pos")
    )


C4_MIN_LINE_WORDS = 3
C4_MIN_KEPT_LINES = 3
C4_TERMINALS = (".", "!", "?", '"')


def _c4_line_ok(line: Column) -> Column:
    words = F.size(F.filter(F.split(line, " "), lambda w: w != ""))
    return (
        F.substring(line, -1, 1).isin(*C4_TERMINALS)
        & (words >= C4_MIN_LINE_WORDS)
        & (F.instr(F.lower(line), "javascript") == 0)
    )


def c4_line_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020, the C4 recipe)
    — the classic web-text scrub that runs AFTER extraction and BEFORE
    dedup/quality gates. Frozen rule set: a line is kept iff it ends in
    terminal punctuation (. ! ? \"), has >= C4_MIN_LINE_WORDS
    whitespace-separated words, and does not contain 'javascript'
    (case-insensitive); the whole page is rejected when the RAW text
    contains 'lorem ipsum' (case-insensitive) or a '{' (code/template
    leakage), or when fewer than C4_MIN_KEPT_LINES lines survive.
    Output one row per doc: (doc_id, page_ok, n_lines, n_kept,
    kept_text) with kept_text the surviving lines rejoined by newline,
    NULL unless page_ok — the downstream corpus reads kept_text, the
    audit reads the counts. NULL text -> page_ok=false, zero counts
    (one row per doc, the quality_scores contract).

    Scale shape: pure map-side Catalyst array/string expressions —
    zero shuffles, zero Python, whole-stage codegen; the line arrays
    live only inside the projection."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(lines, _c4_line_ok)
    n_kept = F.when(t.isNull(), F.lit(0)).otherwise(F.size(kept))
    page_ok = (
        t.isNotNull()
        & (F.instr(F.lower(t), "lorem ipsum") == 0)
        & (F.instr(t, "{") == 0)
        & (n_kept >= C4_MIN_KEPT_LINES)
    )
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        page_ok.alias("page_ok"),
        F.when(t.isNull(), F.lit(0))
        .otherwise(F.size(lines))
        .cast("long")
        .alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        F.when(page_ok, F.array_join(kept, "\n")).alias("kept_text"),
    )


def c4_lines_wrapped(df: DataFrame) -> DataFrame:
    """C4 line-filter fixture: a multi-line page built from
    documents.text exercising every rule — a kept-iff-enough-words
    first line (the word count of documents.text decides, computed on
    BOTH sides), a javascript line, a no-terminal line, two kept
    lines, a too-short line, plus conditional page-killers ('lorem
    ipsum' when doc_id % 7 == 0, a '{' code line when
    doc_id % 11 == 3)."""
    d = F.col("doc_id").cast("long")
    w1 = F.expr("element_at(split(text, ' '), 1)")
    lorem = F.when(
        d % 7 == 0, F.lit("\nlorem ipsum dolor sit amet.")
    ).otherwise(F.lit(""))
    brace = F.when(
        d % 11 == 3, F.lit("\nfunction f() { return; }")
    ).otherwise(F.lit(""))
    text = F.concat(
        F.col("text"), F.lit(".\n"),
        F.lit("enable javascript to view this page.\n"),
        F.lit("no terminal punctuation "), w1, F.lit("\n"),
        F.lit("ok "), w1, F.lit(" fine!\n"),
        F.lit("short.\n"),
        F.lit('"'), w1, F.lit(' quoted words here."'),
        lorem, brace,
    )
    return df.select(d.alias("doc_id"), text.alias("text"))


def url_filter(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """Blocklist filtering over the URL frontier — crawl step 0
    alongside url_normalize: deny a URL when its host matches a rule's
    host AND its raw path starts with the rule's path_prefix (robots /
    abuse / licensing blocklists are exactly this shape). Inputs:
    urls (doc_id, url), rules (rule_id, host, path_prefix). Output one
    row per URL: (doc_id, url, host, denied, rule_id) — rule_id is the
    MINIMUM matching rule (deterministic when rules overlap), NULL
    when allowed. Host matching is case-insensitive (parse
    lowercases); path matching is case-SIGNIFICANT per RFC 3986, same
    contract as url_normalize.

    Scale shape: host/path parse is map-side regex; the rules side is
    explicitly broadcast (a blocklist is ~10^4-10^6 rows — tiny next
    to a 10^12-URL frontier), so the join is map-side too; the
    one-row-per-URL rollup over matched rules partial-aggregates on
    the URL key. No shuffle touches the frontier except that rollup,
    and a URL matches at most #rules-for-its-host rows."""
    u = F.col("url")
    rest = F.regexp_replace(u, _AUTHORITY_STRIP_RE, "")
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    parsed = urls.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        u.alias("url"),
        host_of(u).alias("host"),
        path.alias("path"),
    )
    # rule hosts are lowercased on ingest so the case-insensitive host
    # match holds regardless of how the blocklist was authored (an
    # uppercase rule host silently never matching was a review catch)
    r = rules.select(
        F.col("rule_id").cast("long").alias("rule_id"),
        F.lower(F.col("host")).alias("host"),
        F.col("path_prefix").alias("path_prefix"),
    )
    joined = parsed.join(F.broadcast(r), "host", "left")
    hit = F.when(
        F.col("path").startswith(F.col("path_prefix")), F.col("rule_id")
    )
    return (
        joined.groupBy("doc_id", "url", "host")
        .agg(F.min(hit).alias("rule_id"))
        .select(
            "doc_id",
            "url",
            "host",
            F.col("rule_id").isNotNull().alias("denied"),
            "rule_id",
        )
    )


CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


def chunk_documents(
    df: DataFrame, window: int = CHUNK_WINDOW, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Overlapping token-window chunking — the RAG-index / long-context
    assembly step (fixed-size windows with window-stride overlap so no
    retrieval boundary splits a fact). Output one row per chunk:
    (doc_id, chunk_idx, start_word, n_words, chunk_text). The last
    chunk starts at the SMALLEST stride multiple that still reaches the
    end — ceil((n-window)/stride) in exact integer math — so coverage
    is complete without a redundant tail chunk that a previous window
    already contains. Docs with NULL text emit no chunks (chunking is
    an exploder, not a gate — pair with quality/curate for per-doc
    verdicts).

    Scale shape: per-doc sequence + slice HOFs and one posexplode —
    zero shuffles, zero Python; chunk boundaries depend only on the
    doc's own word count, so the operator is embarrassingly parallel
    at any corpus size and repartitioning upstream is never needed."""
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    w = words()
    nw = F.size(w)
    last = F.when(
        nw <= window, F.lit(0)
    ).otherwise(F.expr(f"(size(split(text, ' ')) - {window} + {stride - 1}) div {stride}"))
    starts = F.transform(
        F.sequence(F.lit(0), last), lambda i: i * stride
    )
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("long").alias("chunk_idx"),
            s.cast("long").alias("start_word"),
            F.least(F.lit(window), nw - s).cast("long").alias("n_words"),
            F.array_join(F.slice(w, s + 1, window), " ").alias("chunk_text"),
        ),
    )
    ex = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(chunks).alias("c"),
    )
    return ex.select(
        "doc_id", "c.chunk_idx", "c.start_word", "c.n_words",
        "c.chunk_text",
    )


ROBOTS_AGENT = "mybot"


def robots_corpus(df: DataFrame) -> DataFrame:
    """(host, robots_txt) fixture over a 50-host space (doc_id < 50,
    SF-stable). Engineered surface: a stray rule BEFORE any group
    (must be ignored), a comment line, a blank line inside and between
    groups, an uppercase agent token (case-insensitive by REP), an
    empty-value Disallow (parses, matches nothing), an allow/disallow
    TIE pair on '/tie', RFC 9309 wildcard rules (an anchored
    '/*.json$' deny, an infix-star '/wild/*/ok' allow overriding a
    shorter '/wild' deny), a mybot-specific group on every third host
    (specific groups override '*' wholesale), and a two-agent group
    (alpha+beta share one rule) on every fifth host."""
    k = F.col("doc_id").cast("long")
    sid = F.col("doc_id").cast("string")
    txt = F.concat(
        F.lit("Disallow: /stray\n# policy h"), sid,
        F.lit("\nUser-agent: SpecialBot\nDisallow: /\n\n"
              "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
              "Disallow: /tie\nAllow: /tie\nDisallow:\n"
              "Disallow: /*.json$\nAllow: /wild/*/ok\n"
              "Disallow: /wild\n"),
        F.when(
            k % 3 == 0,
            F.lit("\nUser-agent: MyBot\nAllow: /private\n"
                  "Disallow: /mypriv\n"),
        ).otherwise(F.lit("")),
        F.when(
            k % 5 == 0,
            F.lit("\nUser-agent: alpha\nUser-agent: beta\n"
                  "Disallow: /dual\n"),
        ).otherwise(F.lit("")),
    )
    return df.where(k < 50).select(
        F.concat(F.lit("h"), sid, F.lit(".example")).alias("host"),
        txt.alias("robots_txt"),
    )


def frontier_urls(df: DataFrame) -> DataFrame:
    """(doc_id, url) fixture over the robots_corpus host space: nine
    path cases cycling through allow/deny/tie/specific-only territory
    plus the three wildcard-rule shapes (anchored-$ deny, infix-star
    allow overriding a shorter deny, plain deny under the starred
    allow's prefix). The host is (doc_id div 9) % 50 — NOT
    doc_id % 50, which would correlate the path case with the host's
    specific-group residue (d % 9 == 0 implies d % 3 == 0) and the
    fallback-deny branch would never fire."""
    d = F.col("doc_id").cast("long")
    sid = F.col("doc_id").cast("string")
    path = (
        F.when(d % 9 == 0, F.concat(F.lit("/private/x"), sid))
        .when(d % 9 == 1, F.lit("/private/ok/y"))
        .when(d % 9 == 2, F.lit("/pub/z"))
        .when(d % 9 == 3, F.lit("/private"))
        .when(d % 9 == 4, F.lit("/tie/t"))
        .when(d % 9 == 5, F.lit("/mypriv/m"))
        .when(d % 9 == 6, F.concat(F.lit("/f"), sid, F.lit(".json")))
        .when(d % 9 == 7, F.lit("/wild/zz/ok"))
        .otherwise(F.concat(F.lit("/wild/w"), sid))
    )
    url = F.concat(
        F.lit("https://H"), F.expr("(CAST(doc_id AS BIGINT) div 9) % 50"),
        F.lit(".EXAMPLE"), path,
    )
    return df.select(d.alias("doc_id"), url.alias("url"))


def _robots_lines(
    df: DataFrame, host_col: str, txt_col: str
) -> DataFrame:
    """Shared robots.txt line scan: per host, parallel (field, value)
    arrays — field lowercased (REP field names are case-insensitive),
    '#' comments stripped, value = the first non-space token after the
    colon (URLs keep their own colons; \\S* admits the empty value).
    One definition for the group parser AND the sitemap extractor, so
    they can never disagree about what a line says."""
    nc = lambda l: F.regexp_replace(l, "#.*$", "")  # noqa: E731
    lines = F.split(F.col(txt_col), "\n")
    return df.select(
        F.lower(F.col(host_col)).alias("host"),
        F.transform(
            lines,
            lambda l: F.lower(
                F.regexp_extract(nc(l), r"^\s*([A-Za-z-]+)\s*:", 1)
            ),
        ).alias("flds"),
        F.transform(
            lines,
            lambda l: F.regexp_extract(
                nc(l), r"^\s*[A-Za-z-]+\s*:\s*(\S*)", 1
            ),
        ).alias("vals"),
    )


def robots_parse(
    df: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    include_crawl_delay: bool = False,
) -> DataFrame:
    """Robots-exclusion parsing — the crawl-politeness half of the URL
    frontier (fetch policy; url_filter's blocklist is the editorial
    half). Input: one row per host with its robots.txt body. Output:
    one row per (agent, rule) pair, (host, agent, rule, path) — REP
    group semantics: a group is a maximal run of consecutive
    User-agent lines followed by rules; each rule belongs to EVERY
    agent of its group; rules before any group are ignored; '#'
    comments and field-name case are stripped; agent tokens lowercase
    (case-insensitive per REP); paths stay case-significant. Values
    are single tokens (\\S*) — an empty Disallow parses with path ''
    (it matches nothing at filter time). Wildcard characters ($, *)
    pass through verbatim — MATCHING is a filter-time concern
    (robots_filter interprets them per RFC 9309 via
    _robots_rule_match).

    Scale shape: the whole parse is map-side expression passes over
    each host's lines array (O(lines^2) array scans per host — a
    robots.txt is KB-sized by convention); the explode emits slim rule
    rows. Zero shuffles, zero Python; the rules table for 10^8 hosts
    is itself distributed. Each derived array (fields, values, group
    starts, per-group agent lists) is materialized as a real column at
    a projection boundary: inlining them into the per-rule lambdas
    multiplies the expression tree (and an inlined array is
    re-evaluated per element of the enclosing lambda) — the inlined
    first cut spent ~12 s per invocation in planning/codegen alone."""
    t2 = _robots_lines(df, host_col, txt_col).select(
        "*", F.sequence(F.lit(0), F.size("flds") - 1).alias("idx")
    )

    def fld(i):
        return F.element_at(F.col("flds"), i + 1)

    def val(i):
        return F.element_at(F.col("vals"), i + 1)

    # group starts: a User-agent line whose previous line is not one
    t3 = t2.select(
        "*",
        F.filter(
            F.col("idx"),
            lambda i: (fld(i) == "user-agent")
            & ((i == 0) | (F.element_at(F.col("flds"), i) != "user-agent")),
        ).alias("gstarts"),
    )
    # per group start: its UA run's end (first non-UA line after it),
    # then the lowercased agent tokens of the run
    t4 = t3.select(
        "*",
        F.transform(
            F.col("gstarts"),
            lambda g: F.coalesce(
                F.array_min(
                    F.filter(
                        F.col("idx"),
                        lambda j: (j > g) & (fld(j) != "user-agent"),
                    )
                ),
                F.size("flds"),
            ),
        ).alias("gends"),
    )
    t5 = t4.select(
        "*",
        F.transform(
            F.col("gstarts"),
            lambda g, gi: F.transform(
                F.filter(
                    F.col("idx"),
                    lambda j: (j >= g)
                    & (j < F.element_at(F.col("gends"), gi + 1)),
                ),
                lambda j: F.lower(val(j)),
            ),
        ).alias("gagents"),
    )
    # rule lines attach to the LAST group started before them; rules
    # before any group are dropped (size(...) = 0 -> element_at fails
    # on 0, so guard with the same count). Crawl-delay (the de-facto
    # politeness extension, not in RFC 9309) rides the same group
    # attachment when asked for — rule='crawl-delay', path=the value
    # token — so robots_crawl_delay shares this one group definition.
    kinds = (
        ("allow", "disallow", "crawl-delay")
        if include_crawl_delay
        else ("allow", "disallow")
    )
    per = F.flatten(
        F.transform(
            F.filter(
                F.col("idx"),
                lambda i: fld(i).isin(*kinds)
                & (F.size(F.filter(F.col("gstarts"), lambda s: s < i)) > 0),
            ),
            lambda i: F.transform(
                F.element_at(
                    F.col("gagents"),
                    F.size(F.filter(F.col("gstarts"), lambda s: s < i)),
                ),
                lambda a: F.struct(
                    a.alias("agent"),
                    fld(i).alias("rule"),
                    val(i).alias("path"),
                ),
            ),
        )
    )
    return t5.select("host", F.explode(per).alias("r")).select(
        "host", "r.agent", "r.rule", "r.path"
    )


def robots_applicable(rules: DataFrame, agent: str) -> DataFrame:
    """Resolve REP group precedence for ONE agent into the flat rule
    set that actually applies per host: if a host has any group naming
    the agent, only those rules survive (the '*' groups are ignored
    wholesale); empty-path rules (match nothing) drop here. Output:
    (host, rule, rule_path). Shared by robots_filter (batch) and
    streaming.url_frontier_stream (politeness join) so batch and
    stream can never disagree about which rules bind."""
    my = agent.lower()
    r0 = rules.select(
        F.lower(F.col("host")).alias("host"),
        F.lower(F.col("agent")).alias("agent"),
        F.col("rule"),
        F.col("path").alias("rule_path"),
    )
    spec_hosts = (
        r0.where(F.col("agent") == my)
        .select("host")
        .distinct()
        .withColumn("has_spec", F.lit(True))
    )
    return (
        r0.where(F.col("agent").isin(my, "*"))
        .join(spec_hosts, "host", "left")
        .where((F.col("agent") == my) | F.col("has_spec").isNull())
        .where(F.col("rule_path") != "")
        .select("host", "rule", "rule_path")
    )


def _robots_rule_pattern(rule_path: Column) -> tuple[Column, Column]:
    """Compile an RFC 9309 rule path to its match strategy, as pure
    Catalyst expressions: returns (literal, rx). literal=true when the
    path has no '*' and no trailing '$' — the overwhelmingly common
    case, which matches by startswith (a codegen'd memcmp) and carries
    a NULL rx. Otherwise rx is the anchored Java regex: every regex
    metacharacter escaped EXCEPT '*', '*' -> '.*' (matches any char
    sequence incl '/'), and a single trailing '$' stripped and
    re-emitted as the end anchor ('$' elsewhere is a literal octet,
    the Google-parser behavior). Empty rule paths never reach here
    (robots_applicable drops them).

    Scale shape: call this ON THE RULES SIDE (tiny, broadcast) so the
    regex string is materialized once per rule in the broadcast table;
    the per-URL hot path is then one startswith or one regexp_like
    against the prebuilt pattern — it never re-derives the string."""
    anchored = rule_path.endswith("$")
    core = F.when(
        anchored,
        F.substring(rule_path, F.lit(1), F.length(rule_path) - 1),
    ).otherwise(rule_path)
    # escape Java-regex metachars except '*' (replacement '\\$1' is
    # the Java-replacement escape: literal backslash + group 1)
    esc = F.regexp_replace(
        core, r"([.^$+?(){}\[\]|\\])", r"\\$1"
    )
    rx = F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    literal = (~rule_path.contains("*")) & (~anchored)
    return literal, F.when(~literal, rx)


def _with_rule_pattern(appl: DataFrame) -> DataFrame:
    """robots_applicable output + precompiled (rule_literal, rule_rx)
    columns — the projection that puts pattern compilation on the
    broadcast side of the politeness join."""
    literal, rx = _robots_rule_pattern(F.col("rule_path"))
    return appl.withColumns({"rule_literal": literal, "rule_rx": rx})


def _robots_rule_match(
    path: Column,
    rule_path: Column,
    literal: Column | None = None,
    rx: Column | None = None,
) -> Column:
    """RFC 9309 rule-path match. Pass the precompiled (literal, rx)
    columns from _with_rule_pattern so the pattern work stays on the
    rules side; deriving them inline from rule_path is supported for
    tests but rebuilds the pattern per evaluated row."""
    if literal is None or rx is None:
        literal, rx = _robots_rule_pattern(rule_path)
    return F.when(literal, path.startswith(rule_path)).otherwise(
        F.regexp_like(path, rx)
    )


def robots_filter(
    urls: DataFrame, rules: DataFrame, agent: str = ROBOTS_AGENT
) -> DataFrame:
    """Apply parsed robots rules to a URL frontier for one crawler
    agent. REP precedence, RFC 9309 + the Google-documented group
    semantics: if a host has any group naming OUR agent, ONLY those
    rules apply (the '*' groups are ignored wholesale); otherwise the
    '*' rules apply. Rule paths match case-significantly with RFC 9309
    wildcards — '*' spans any character sequence, a trailing '$'
    anchors end-of-path, everything else is literal (empty-path rules
    match nothing; see _robots_rule_match). Among matching rules the
    MOST-SPECIFIC (most octets of the rule path as written, wildcards
    counted — the Google-parser priority) wins, and allow beats
    disallow on equal length. No matching rule (or no rules at all for
    the host) = allowed. Output one row per URL: (doc_id, url, host,
    allowed, match_len — length of the winning rule path, NULL when
    nothing matched).

    Scale shape: precedence encodes as one integer per candidate rule
    (path_len * 2 + is_allow) so the per-URL verdict is a plain
    partial-aggregatable MAX — no windows, no struct orderings to
    replicate cross-engine. The rules side (specific-host resolution
    included) is rules-cardinality slim and explicitly broadcast; the
    frontier is touched by exactly one map-side join + one rollup
    shuffle on the URL key, the url_filter contract."""
    appl = _with_rule_pattern(robots_applicable(rules, agent))
    u = F.col("url")
    rest = F.regexp_replace(u, _AUTHORITY_STRIP_RE, "")
    parsed = urls.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        u.alias("url"),
        host_of(u).alias("host"),
        F.regexp_extract(rest, r"^([^?#]*)", 1).alias("path"),
    )
    joined = parsed.join(F.broadcast(appl), "host", "left")
    score = F.when(
        _robots_rule_match(
            F.col("path"),
            F.col("rule_path"),
            F.col("rule_literal"),
            F.col("rule_rx"),
        ),
        F.length("rule_path").cast("long") * 2
        + (F.col("rule") == "allow").cast("long"),
    )
    return (
        joined.groupBy("doc_id", "url", "host")
        .agg(F.max(score).alias("s"))
        .select(
            "doc_id",
            "url",
            "host",
            (F.col("s").isNull() | (F.col("s") % 2 == 1)).alias("allowed"),
            F.expr("s div 2").cast("long").alias("match_len"),
        )
    )


def robots_crawl_delay(
    df: DataFrame,
    agent: str = ROBOTS_AGENT,
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Effective Crawl-delay per host for one crawler agent — the
    de-facto politeness extension (not in RFC 9309, but honored by
    Bing/Yandex-class crawlers and present on a large share of real
    robots.txt files). Group semantics are EXACTLY robots_filter's:
    if a host has any group naming our agent, only THOSE groups'
    Crawl-delay lines count (a '*' delay is ignored wholesale — a
    specific group WITHOUT a delay means no delay, not a fallback);
    otherwise the '*' groups' lines count. Values must be non-negative
    numbers ('fast', '-1' are ignored, the lenient convention real
    parsers use); when several applicable lines conflict the MAXIMUM
    wins (the conservative politeness reading, pinned here because the
    extension has no spec to defer to). Output one row per host that
    has an applicable valid delay: (host, crawl_delay_s,
    fetches_per_hour) — fetches_per_hour = floor(3600/delay), NULL for
    delay 0 (explicitly unlimited).

    Scale shape: the parse is robots_parse's map-side pass (shared
    group definition — the two can never disagree about which group a
    line belongs to); precedence is one slim distinct + left join on
    host; the delay pick is a partial-aggregatable groupBy(max). All
    rules-cardinality, no frontier-sized shuffle anywhere."""
    my = agent.lower()
    rules = robots_parse(
        df, host_col=host_col, txt_col=txt_col, include_crawl_delay=True
    ).select(
        F.lower(F.col("host")).alias("host"),
        F.lower(F.col("agent")).alias("agent"),
        "rule",
        "path",
    )
    # specificity from ALL of a host's groups (a crawler first picks
    # its group, THEN looks for the group's delay) — judging it from
    # crawl-delay rows alone would wrongly fall back to '*' when the
    # specific group simply has no delay line
    spec_hosts = (
        rules.where(F.col("agent") == my)
        .select("host")
        .distinct()
        .withColumn("has_spec", F.lit(True))
    )
    num = F.when(
        F.col("path").rlike(r"^[0-9]+([.][0-9]+)?$"),
        F.col("path").cast("double"),
    )
    delays = (
        rules.where(F.col("rule") == "crawl-delay")
        .where(F.col("agent").isin(my, "*"))
        .join(spec_hosts, "host", "left")
        .where((F.col("agent") == my) | F.col("has_spec").isNull())
        .select("host", num.alias("delay_s"))
        .where(F.col("delay_s").isNotNull())
        .groupBy("host")
        .agg(F.max("delay_s").alias("crawl_delay_s"))
    )
    return delays.select(
        "host",
        "crawl_delay_s",
        F.when(
            F.col("crawl_delay_s") > 0,
            F.floor(F.lit(3600.0) / F.col("crawl_delay_s")),
        )
        .cast("long")
        .alias("fetches_per_hour"),
    )


def crawl_delay_corpus(df: DataFrame) -> DataFrame:
    """(host, robots_txt) fixture over a 50-host space (doc_id < 50,
    SF-stable) for the Crawl-delay surface — separate from
    robots_corpus so the allow/disallow oracles stay untouched. Per
    host: a '*' group with Crawl-delay 10 (plus a second 12.5 line on
    every fifth host — max wins within the applicable groups), then by
    doc_id % 4: (0) a mybot group with a single 'Crawl-delay: k%7'
    line — k%7 = 0 pins the explicit-unlimited row; (1) no mybot group
    — the '*' delay applies; (2) a mybot group whose delay value is
    the junk token 'fast' — the specific group is chosen, its delay is
    invalid, NO row (never a '*' fallback); (3) a mybot group with no
    delay line at all — same, NO row."""
    k = F.col("doc_id").cast("long")
    sid = F.col("doc_id").cast("string")
    txt = F.concat(
        F.lit("User-agent: *\nDisallow: /private\nCrawl-delay: 10\n"),
        F.when(k % 5 == 0, F.lit("Crawl-delay: 12.5\n")).otherwise(
            F.lit("")
        ),
        F.when(
            k % 4 == 0,
            F.concat(
                F.lit("\nUser-agent: MyBot\nDisallow: /m\nCrawl-delay: "),
                (k % 7).cast("string"),
                F.lit("\n"),
            ),
        )
        .when(
            k % 4 == 2,
            F.lit("\nUser-agent: MyBot\nCrawl-delay: fast\n"),
        )
        .when(
            k % 4 == 3,
            F.lit("\nUser-agent: MyBot\nDisallow: /m\n"),
        )
        .otherwise(F.lit("")),
    )
    return df.where(k < 50).select(
        F.concat(F.lit("h"), sid, F.lit(".example")).alias("host"),
        txt.alias("robots_txt"),
    )


DOMAIN_SHORT_MIN = 10
DOMAIN_QUALITY_MIN = 0.5  # == CURATE_QUALITY_MIN (defined below); the
# domain gate and the doc gate must agree or domain rates stop
# predicting curate yield (pinned by test_domain_stats_gate_parity)


def domain_stats(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    short_min: int = DOMAIN_SHORT_MIN,
    quality_min: float = DOMAIN_QUALITY_MIN,
) -> DataFrame:
    """Per-host corpus statistics — the signal behind RefinedWeb /
    CCNet-style DOMAIN-level policy (a host whose docs are mostly
    short or low-quality gets blocklisted wholesale; per-doc filters
    alone never see that pattern). Input: one row per doc with a host
    column (e.g. url_normalize's `host`) and the text. Output per
    host: n_docs, n_tokens, max_doc_tokens, n_short (docs under
    short_min whitespace tokens), n_quality_ok (docs passing the
    shared curate-gate quality score), all exact BIGINT counts — the
    quality RATE is the consumer's division, so the row stays
    hash-comparable and the counts re-aggregate losslessly across
    snapshots (a ratio would not).

    Scale shape: everything per-doc is a map-side expression (the same
    quality arithmetic as quality_scores, whole-stage codegen), then
    ONE partial-aggregatable groupBy(host) — the shuffle carries one
    combined row per (task, host), never documents; a 10^8-doc host
    costs its tasks' map-side combines, not a hot reducer. NULL text
    counts as 0 tokens / short / not-quality-ok (one row per doc
    everywhere, the repetition_scores lesson)."""
    # normalize column names FIRST: quality_score_col() reads the
    # literal 'text' column (it is the shared curate-gate expression),
    # so a custom text_col must be aliased before it is applied — the
    # old form computed n_tokens from text_col but quality from 'text'
    # (caught in review; pinned by test_domain_stats_custom_text_col)
    base = df.select(
        F.col(host_col).alias("host"), F.col(text_col).alias("text")
    )
    n_tokens_raw = F.size(words("text")).cast("long")
    n_tokens = F.when(
        F.col("text").isNull(), F.lit(0).cast("long")
    ).otherwise(n_tokens_raw)
    q_ok = F.when(F.col("text").isNull(), F.lit(False)).otherwise(
        quality_score_col() >= quality_min
    )
    per_doc = base.select(
        "host",
        n_tokens.alias("n_tok"),
        (n_tokens < short_min).alias("is_short"),
        q_ok.alias("q_ok"),
    )
    return per_doc.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.max("n_tok").alias("max_doc_tokens"),
        F.sum(F.col("is_short").cast("long")).alias("n_short"),
        F.sum(F.col("q_ok").cast("long")).alias("n_quality_ok"),
    )


SEGDEDUP_WORDS = 5
SEGDEDUP_MIN_DOCS = 2
SEGDEDUP_MIN_CHARS = 1


def _segments_col(mode: str, seg_words: int) -> tuple[Column, str]:
    """(segments array, rejoin separator) for segment_dedup. 'newline'
    splits on \\n (the CCNet line unit for real web text); 'words'
    chunks the token stream into fixed seg_words windows (the
    deterministic line proxy for single-line corpora). Both splits are
    lossless under rejoin with the same separator, so docs with no
    removed segment reconstruct byte-identically."""
    if mode == "newline":
        segs, sep = F.split(F.col("text"), "\n"), "\n"
    elif mode == "words":
        w = words()
        n_segs = F.ceil(F.size(w) / F.lit(float(seg_words))).cast("int")
        segs = F.transform(
            F.sequence(F.lit(1), n_segs),
            lambda i: F.concat_ws(
                " ",
                F.slice(w, (i - F.lit(1)) * seg_words + F.lit(1),
                        F.lit(seg_words)),
            ),
        )
        sep = " "
    else:
        raise ValueError(f"segment_dedup mode must be 'newline' or "
                         f"'words', got {mode!r}")
    empty = F.array().cast("array<string>")
    return F.when(F.col("text").isNotNull(), segs).otherwise(empty), sep


def segment_dedup(
    df: DataFrame,
    seg_words: int = SEGDEDUP_WORDS,
    min_docs: int = SEGDEDUP_MIN_DOCS,
    min_chars: int = SEGDEDUP_MIN_CHARS,
    mode: str = "words",
) -> DataFrame:
    """CCNet/RefinedWeb-style repeated-line removal: drop every segment
    (line) that occurs verbatim in >= min_docs DISTINCT documents —
    navigation chrome, cookie banners, boilerplate headers — and emit
    one row per document: (doc_id, n_segments, n_removed, text_clean)
    with the surviving segments rejoined in original order. Segments
    shorter than min_chars are exempt from counting (so empty lines are
    never stripped). Null-text docs report n_segments=0/text_clean=''
    (one row per doc, like quality/repetition — never silently
    dropped). A segment repeated WITHIN one doc only is kept: the count
    is per distinct doc, which is what separates site boilerplate from
    in-doc repetition (repetition_scores covers the latter).

    Scale shape — the counting and candidate passes never touch the
    text: the explode carries only (doc_id, pos, xxhash64(seg)), so
    both of those shuffles move slim fixed-width rows. Pass 1 counts
    distinct docs per segment hash (two-phase distinct aggregate,
    map-side partials); the hot set is bounded above by
    total_segments/min_docs rows of one hash each. Pass 2 left-semi
    joins the slim explode against the hot set (AQE broadcasts it when
    it fits, which at sane thresholds it does) and collects per-doc
    bad positions. Only docs that HAVE a hot segment reach the final
    doc_id equi-join — when boilerplate is sparse AQE broadcasts that
    side and the text side stays map-side; when most docs carry a hot
    segment it degrades to ONE text shuffle at doc granularity (the
    naive explode-and-reassemble shape always shuffles the text TWICE
    at segment granularity, which is why the slim-hash split exists).
    Reconstruction is a per-row HOF filter over the re-derived segment
    array (docs with no hot segment take a constant-time original-text
    fast path, the common case). xxhash64 stands in for the segment
    string on the count/join path; a collision needs ~2^32 distinct
    segments per the birthday bound and at worst removes one innocent
    segment — the same documented surrogate-key tradeoff as
    jobs/pretrain_corpus."""
    docs = df.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    segs, sep = _segments_col(mode, seg_words)
    ex = docs.select(
        "doc_id", F.posexplode(segs).alias("pos", "seg")
    ).select(
        "doc_id", "pos",
        F.xxhash64("seg").alias("h"),
        F.length("seg").alias("seg_len"),
    )
    hot = (
        ex.where(F.col("seg_len") >= min_chars)
        .groupBy("h")
        .agg(F.countDistinct("doc_id").alias("c"))
        .where(F.col("c") >= min_docs)
        .select("h")
    )
    bad = (
        ex.join(hot, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("bad_pos"))
    )
    bad_arr = F.col("bad_pos")
    kept = F.filter(
        segs, lambda s, i: ~F.array_contains(bad_arr, i)
    )
    text_clean = F.when(F.col("text").isNull(), F.lit("")).otherwise(
        # fast path: no hot segment in this doc -> original text verbatim
        F.when(bad_arr.isNull(), F.col("text")).otherwise(
            F.array_join(kept, sep)
        )
    )
    return docs.join(bad, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.size(segs)).cast("long").alias("n_segments"),
        F.coalesce(F.size(bad_arr), F.lit(0)).cast("long")
        .alias("n_removed"),
        text_clean.alias("text_clean"),
    )


HOSTBP_FRAC_MIN = 0.6
HOSTBP_MIN_HOST_DOCS = 3


def host_boilerplate(
    df: DataFrame,
    frac_min: float = HOSTBP_FRAC_MIN,
    min_host_docs: int = HOSTBP_MIN_HOST_DOCS,
    seg_words: int = SEGDEDUP_WORDS,
    min_chars: int = SEGDEDUP_MIN_CHARS,
    mode: str = "newline",
) -> DataFrame:
    """HOST-scoped site-template strip (RefinedWeb-style): a segment is
    boilerplate for host h when it appears in >= frac_min of h's docs
    AND h has >= min_host_docs docs — which catches per-site chrome
    (cookie banners, nav, footers) that a GLOBAL count threshold
    (segment_dedup) either misses on small sites or needs an absolute
    min_docs that over-fires on huge ones. The fraction test is exact
    integer math — c * 10^6 >= round(frac_min * 10^6) * n — so no
    float threshold can flap between engines. Output one row per doc:
    (doc_id, host, n_segments, n_removed, text_clean), with
    segment_dedup's null-text / original-text-fast-path contracts.

    Scale shape: segment_dedup's slim-hash skeleton with host riding
    along — the explode carries (doc_id, host, pos, xxhash64, len);
    the count is a partial-aggregatable two-phase distinct per
    (host, h); host doc totals are a tiny second agg joined onto the
    candidate counts (host-cardinality rows, AQE-broadcast); and only
    docs that HAVE a template segment reach the text-side equi-join.
    The per-host template set is bounded by segments/host-docs, so the
    hot side stays broadcastable at any corpus size. Same xxhash64
    surrogate-collision contract as segment_dedup."""
    ppm = int(round(frac_min * 1_000_000))
    docs = df.select(
        F.col("doc_id").cast("long").alias("doc_id"), "host", "text"
    )
    segs, sep = _segments_col(mode, seg_words)
    host_n = docs.groupBy("host").agg(F.count("*").alias("n"))
    ex = docs.select(
        "doc_id", "host", F.posexplode(segs).alias("pos", "seg")
    ).select(
        "doc_id", "host", "pos",
        F.xxhash64("seg").alias("h"),
        F.length("seg").alias("seg_len"),
    )
    hot = (
        ex.where(F.col("seg_len") >= min_chars)
        .groupBy("host", "h")
        .agg(F.countDistinct("doc_id").alias("c"))
        .join(host_n, "host")
        .where(
            (F.col("n") >= min_host_docs)
            & (F.col("c") * 1_000_000 >= F.lit(ppm) * F.col("n"))
        )
        .select("host", "h")
    )
    bad = (
        ex.join(hot, ["host", "h"], "left_semi")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("bad_pos"))
    )
    bad_arr = F.col("bad_pos")
    kept = F.filter(segs, lambda s, i: ~F.array_contains(bad_arr, i))
    text_clean = F.when(F.col("text").isNull(), F.lit("")).otherwise(
        F.when(bad_arr.isNull(), F.col("text")).otherwise(
            F.array_join(kept, sep)
        )
    )
    return docs.join(bad, "doc_id", "left").select(
        "doc_id",
        "host",
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.size(segs)).cast("long").alias("n_segments"),
        F.coalesce(F.size(bad_arr), F.lit(0)).cast("long")
        .alias("n_removed"),
        text_clean.alias("text_clean"),
    )


SPANDEDUP_N = 8

# Order-sensitive window-combination constants: h(window at p) =
# sum_k A[k] * wordhash[p+k] in wrapping uint64 arithmetic. Distinct
# md5-derived odd multipliers make permuted windows hash apart; the
# collision bound is the usual ~2^-64 birthday class, the same
# documented surrogate tradeoff as the xxhash64 paths.
_SPAN_A = [
    int.from_bytes(
        __import__("hashlib").md5(f"span-a:{k}".encode()).digest()[:8],
        "big",
    ) | 1
    for k in range(64)
]


def _span_window_rows(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, text) -> one slim (doc_id, pos, h) row per overlapping
    n-word window, via a fused Arrow kernel: ONE md5 per word (C-speed),
    then each window's hash is an order-sensitive linear combination of
    its word hashes in wrapping uint64 math — the gram STRINGS are never
    materialized. The expression form (transform + slice + concat_ws +
    xxhash64) runs in Spark's interpreted higher-order-function path and
    costs ~2x this kernel at bench scale, the same measured trade as
    minhash_sigs' fused shingle kernel. Docs with null text or fewer
    than n words emit no rows (the callers' dropped-window contract)."""
    import hashlib

    import numpy as np
    import pandas as pd

    A = np.array(_SPAN_A[:n], dtype=np.uint64)

    def gen(batches):
        for pdf in batches:
            ids, poss, hs = [], [], []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                if t is None:
                    continue
                ws = t.split(" ")
                m = len(ws) - n + 1
                if m <= 0:
                    continue
                wh = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.md5(w.encode()).digest()[:8], "big"
                        )
                        for w in ws
                    ),
                    dtype=np.uint64,
                    count=len(ws),
                )
                acc = np.zeros(m, np.uint64)
                for k in range(n):
                    acc += A[k] * wh[k:k + m]  # wrapping uint64
                ids.append(np.full(m, int(did), np.int64))
                poss.append(np.arange(m, dtype=np.int32))
                hs.append(acc.view(np.int64))
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "pos": np.concatenate(poss),
                        "h": np.concatenate(hs),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "pos": pd.Series([], dtype="int32"),
                        "h": pd.Series([], dtype="int64"),
                    }
                )

    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).mapInPandas(gen, "doc_id long, pos int, h long")


def span_dedup(
    df: DataFrame,
    n: int = SPANDEDUP_N,
    min_docs: int = SEGDEDUP_MIN_DOCS,
) -> DataFrame:
    """Exact-substring dedup with OVERLAPPING n-gram windows (the Lee
    et al. 'Deduplicating Training Data' shape, word-granular): a token
    is removed iff it is covered by ANY n-gram window that occurs
    verbatim in >= min_docs distinct documents. Overlap is what
    separates this from segment_dedup's fixed chunks: a duplicated
    passage is caught at ANY alignment, and removal is per-token
    coverage, so the cut tracks the duplicated span's exact extent
    instead of chunk boundaries. One row per doc:
    (doc_id, n_tokens, n_removed, text_clean), docs shorter than n
    tokens pass through untouched, null text reports n_tokens=0 /
    text_clean='' (never silently dropped).

    Scale shape mirrors segment_dedup: the window stage emits only
    (doc_id, pos, hash) — ~L slim rows per L-token doc from the fused
    _span_window_rows kernel (one md5 per WORD + a wrapping-uint64
    window combination; the gram strings are never materialized, and
    the expression form cost ~2x in the interpreted HOF path), so the
    text never enters the counting or candidate shuffles; the hot set
    is left-semi joined (AQE-broadcast when duplication is sparse) and
    only docs that HAVE a hot window reach the final doc-granularity
    text join. Reconstruction is a per-row HOF with an original-text
    fast path; its cost is O(tokens x hot_windows_in_doc), so run
    doc-level dedup FIRST (pipeline order: a fully-duplicated doc
    should be dropped by minhash, not shredded token-by-token here —
    same ordering rule as --with-line-dedup). The window hash stands in
    for the gram string on the slim path with the same documented
    birthday-bound tradeoff as segment_dedup's xxhash64."""
    docs = df.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    w = words()
    n_w = F.size(w)
    ex = _span_window_rows(docs, n)
    hot = (
        ex.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("c"))
        .where(F.col("c") >= min_docs)
        .select("h")
    )
    bad = (
        ex.join(hot, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("bad_pos"))
    )
    bad_arr = F.col("bad_pos")
    kept = F.filter(
        w,
        lambda tok, i: ~F.exists(
            bad_arr, lambda s: (s <= i) & (i < s + F.lit(n))
        ),
    )
    n_tokens = F.when(F.col("text").isNull(), F.lit(0)).otherwise(n_w)
    text_clean = F.when(F.col("text").isNull(), F.lit("")).otherwise(
        # fast path: no hot window in this doc -> original text verbatim
        F.when(bad_arr.isNull(), F.col("text")).otherwise(
            F.array_join(kept, " ")
        )
    )
    n_removed = F.when(
        F.col("text").isNull() | bad_arr.isNull(), F.lit(0)
    ).otherwise(n_w - F.size(kept))
    return docs.join(bad, "doc_id", "left").select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_removed.cast("long").alias("n_removed"),
        text_clean.alias("text_clean"),
    )


SAMPLE_RATES = {"en": 80, "de": 50, "fr": 50, "es": 50}  # percent
SAMPLE_RATE_DEFAULT = 25


HOLDOUT_VALID_PCT = 10


def split_holdout(
    df: DataFrame,
    pairs: DataFrame | None = None,
    valid_pct: int = HOLDOUT_VALID_PCT,
) -> DataFrame:
    """Leakage-safe train/validation split. The naive per-doc random
    split leaks: a near-duplicate pair straddling the boundary puts
    (approximately) the validation set INSIDE the training set. This
    operator splits by SPLIT KEY — the doc's connected component in
    the near-dup pair graph when `pairs` is given (docs in no pair key
    by their own id), plain doc_id otherwise — so an entire near-dup
    cluster lands on one side, and eval numbers measure generalization
    instead of memorized dup halves.

    Output one row per doc: (doc_id, split_key, bucket, split) with
    bucket = md5_60(split_key) % 100 (the deterministic engine-portable
    hash the stratified sampler uses — reproducible across runs and
    engines, never rand()) and split = 'valid' iff bucket < valid_pct.

    Scale shape: without pairs this is pure map-side (zero shuffles).
    With pairs: connected components (O(log diameter) slim-key rounds,
    graphops) + ONE left join of docs against the component table —
    the cluster side holds only docs that appear in some pair, which
    after upstream dedup is a small fraction; AQE broadcasts it when
    it fits. The split assignment itself is map-side after the join."""
    docs = df.select(F.col("doc_id").cast("long").alias("doc_id"))
    if pairs is None:
        keyed = docs.select(
            "doc_id", F.col("doc_id").alias("split_key")
        )
    else:
        from . import graphops

        comp = graphops.connected_components(pairs)
        keyed = docs.join(comp, "doc_id", "left").select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("split_key"),
        )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("split_key").cast("string")), 1, 15),
            16, 10,
        ).cast("long")
        % 100
    )
    return keyed.select(
        "doc_id",
        "split_key",
        bucket.alias("bucket"),
        F.when(bucket < valid_pct, F.lit("valid"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def _sample_parts() -> tuple[Column, Column]:
    """(bucket, rate) of the deterministic stratified sample — shared
    by sample_stratified and the curate sample gate."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long") % 100
    )
    rate = F.lit(SAMPLE_RATE_DEFAULT)
    for lang, r in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return bucket, rate


def sample_keep_col() -> Column:
    """Map-side boolean: does the stratified sample keep this doc?"""
    bucket, rate = _sample_parts()
    return bucket < rate


def sample_stratified(df: DataFrame) -> DataFrame:
    """Deterministic stratified sampling: keep a doc iff
    md5_60(doc_id) % 100 < rate(lang). Hash-based (not rand()) so the
    sample is reproducible across runs/engines and needs no shuffle —
    the filter runs map-side in the scan stage; per-stratum rates
    rebalance a skewed corpus (the 'mix weights' step of a training-data
    pipeline). DuckDB oracle computes the identical predicate."""
    bucket, rate = _sample_parts()
    return (
        df.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("lang"),
            bucket.alias("sample_bucket"),
            rate.cast("long").alias("sample_rate"),
        )
        .filter(F.col("sample_bucket") < F.col("sample_rate"))
    )


DOMAIN_CAP = 5
DOMAIN_CAP_SALTS = 16


def domain_cap(
    df: DataFrame, cap: int = DOMAIN_CAP, n_salts: int = DOMAIN_CAP_SALTS
) -> DataFrame:
    """Per-domain frequency cap: keep at most `cap` docs per source
    (lowest doc_id wins) — the dedup-adjacent 'no domain dominates the
    corpus' step. Returns the KEPT rows with their exact rank.

    Skew shape (salted two-phase rank): phase 1 ranks within
    (source, salt) where salt = hash(doc_id) % n_salts, keeping <= cap
    per salt bucket — a 10^9-doc domain splits across n_salts tasks
    instead of sorting in one. Phase 2 re-ranks the <= cap*n_salts
    survivors per domain, which is a bounded-size window whatever the
    input skew. The composition is exact: every globally-top-cap row is
    top-cap within its salt bucket (it has fewer competitors there), and
    all rows smaller than a top-cap row are themselves top-cap, so the
    survivor re-rank equals the global rank. (Emitting a rank for EVERY
    row of a skewed domain is inherently a single-task sort, which is
    why this operator emits the kept set — the product a corpus-mixing
    pipeline consumes.)"""
    from pyspark.sql.window import Window

    salt = (F.abs(F.xxhash64(F.col("doc_id").cast("long"))) % n_salts)
    base = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        salt.cast("int").alias("salt"),
    )
    w1 = Window.partitionBy("source", "salt").orderBy("doc_id")
    survivors = (
        base.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= cap)
        .drop("r1", "salt")
    )
    w2 = Window.partitionBy("source").orderBy("doc_id")
    return (
        survivors.withColumn(
            "rank_in_source", F.row_number().over(w2).cast("long")
        )
        .filter(F.col("rank_in_source") <= cap)
    )


def domain_cap_budgets(
    df: DataFrame, budgets: DataFrame, n_salts: int = DOMAIN_CAP_SALTS
) -> DataFrame:
    """domain_cap with a VARIABLE per-source cap — the politeness-
    budget shape: `budgets` is (source, cap_n) and each source keeps
    its lowest-doc_id cap_n rows; sources with NO budget row pass
    through uncapped (rank NULL — unlimited is 'no verdict', not
    'rank you anyway', which would be the single-task sort this
    operator exists to avoid); cap_n = 0 defers the whole source.

    Same exactness argument as domain_cap, per source with its own b:
    phase 1 keeps <= b per (source, salt) bucket — every globally-
    top-b row is top-b within its bucket (fewer competitors there) —
    and phase 2 re-ranks the <= b*n_salts survivors, a bounded window
    whatever the input skew. The budgets side is rules-cardinality
    slim and broadcast."""
    from pyspark.sql.window import Window

    b = F.broadcast(
        budgets.select(
            F.col("source"), F.col("cap_n").cast("long").alias("cap_n")
        )
    )
    salt = F.abs(F.xxhash64(F.col("doc_id").cast("long"))) % n_salts
    base = df.select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    ).join(b, "source", "left")
    uncapped = base.filter(F.col("cap_n").isNull()).select(
        "doc_id", "source", F.lit(None).cast("long").alias(
            "rank_in_source"
        )
    )
    w1 = Window.partitionBy("source", "salt").orderBy("doc_id")
    w2 = Window.partitionBy("source").orderBy("doc_id")
    capped = (
        base.filter(F.col("cap_n").isNotNull())
        .withColumn("salt", salt.cast("int"))
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= F.col("cap_n"))
        .drop("r1", "salt")
        .withColumn(
            "rank_in_source", F.row_number().over(w2).cast("long")
        )
        .filter(F.col("rank_in_source") <= F.col("cap_n"))
        .select("doc_id", "source", "rank_in_source")
    )
    return capped.unionByName(uncapped)


CURATE_QUALITY_MIN = 0.5


def curate_corpus(
    df: DataFrame,
    quality_min: float = CURATE_QUALITY_MIN,
    domain_cap_n: int = DOMAIN_CAP,
    _slim_out: dict | None = None,
) -> DataFrame:
    """The composed curation decision a training-data pipeline ships:
    quality gate AND stratified sample AND per-domain cap AND exact
    dedup, one row per document with the per-stage verdicts and the
    final keep bit.

    Single-scan shape (VERDICT r02 #3): the two map-side stages
    (quality gate, stratified sample — quality_score_col /
    sample_keep_col, the standalone operators' own expressions) are
    computed in ONE projection over the input, together with the keys
    the two shuffle stages need (source for the cap, dedup_key for the
    dedup). That slim projection is cached, so `documents` is read once
    instead of ~5x — at 100 TB the rescans were the dominant cost. The
    shuffle stages themselves are the standalone operators' plans
    (salted two-phase cap via domain_cap, map-side groupBy-min dedup
    via _dedup_flags) fed from the cached slim columns.

    CACHE LIFECYCLE (ADVICE r03): the slim projection stays cached
    after the returned DataFrame is materialized — the return is lazy,
    so this function cannot know when it is safe to unpersist. The
    cache belongs to the caller's session: one-shot scripts can ignore
    it (session teardown frees it); long-lived sessions invoking this
    repeatedly should use curate_corpus_scoped (targeted unpersist on
    exit) or clear caches between invocations as bench.py does."""
    slim = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        (quality_score_col() >= quality_min).alias("quality_ok"),
        sample_keep_col().alias("sampled"),
        dedup_key_col().alias("dedup_key"),
    ).cache()
    if _slim_out is not None:
        _slim_out["slim"] = slim
    c = domain_cap(slim, cap=domain_cap_n).select(
        "doc_id", F.lit(True).alias("capped_in")
    )
    d = _dedup_flags(slim.select("doc_id", "dedup_key")).select(
        "doc_id", "is_dup"
    )
    out = (
        slim.select("doc_id", "quality_ok", "sampled")
        .join(c, "doc_id", "left")
        .join(d, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("quality_ok", F.lit(False)).alias("quality_ok"),
            F.coalesce("sampled", F.lit(False)).alias("sampled"),
            F.coalesce("capped_in", F.lit(False)).alias("capped_in"),
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )
    return out.withColumn(
        "kept",
        F.col("quality_ok")
        & F.col("sampled")
        & F.col("capped_in")
        & ~F.col("is_dup"),
    )


@contextlib.contextmanager
def curate_corpus_scoped(df: DataFrame, **kwargs):
    """curate_corpus with a bounded cache lifecycle: yields the output
    DataFrame, and unpersists the internal slim-projection cache on
    exit — the fix for unbounded cache growth when a long-lived session
    (e.g. repeated jobs.curate.main) invokes curation repeatedly
    (ADVICE r03). Materialize the output INSIDE the with-block; after
    exit the returned plan recomputes from source instead of the
    cache."""
    holder: dict = {}
    try:
        yield curate_corpus(df, _slim_out=holder, **kwargs)
    finally:
        slim = holder.get("slim")
        if slim is not None:
            slim.unpersist()


CONTAM_BENCH_EVERY = 97  # every 97th doc's lead shingle forms the benchmark


def contamination_flags(df: DataFrame) -> DataFrame:
    """Benchmark-contamination check: flag documents sharing any 3-word
    shingle with a (small) benchmark set. The benchmark side is built
    deterministically here (lead shingle of every 97th doc) so the oracle
    can rebuild it; in production it would be read from a table. Shape:
    explode doc shingles -> broadcast hash join on the shingle -> distinct
    doc flags. The corpus side never shuffles: the benchmark set is
    broadcast, matches are aggregated map-side."""
    # base rows carry only (doc_id, text); the >=3-words gate (equivalent
    # to "has at least one 3-shingle") is a cheap split+size so branches
    # that don't need shingle ARRAYS never build them — the shingle
    # arrays come from the fused Python kernel (shingle_sets) on the
    # explode branch plus the 1/97 benchmark slice, not three times
    base = df.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).filter(F.size(words()) >= 3)
    # benchmark key = lexicographic min shingle: order-independent, so any
    # engine rebuilding it from the distinct shingle SET agrees (distinct
    # preserves first-occurrence order in Spark but not in DuckDB)
    bench = (
        shingle_sets(df.filter(F.col("doc_id") % CONTAM_BENCH_EVERY == 0))
        .select(F.array_min("sh").alias("shingle"))
        .distinct()
    )
    exploded = shingle_sets(df).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    hits = (
        exploded.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    return (
        base.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

def with_near_dup_vectors(df: DataFrame, id_offset: int = 10_000) -> DataFrame:
    """Augment embeddings with deterministically perturbed copies of every
    4th vector (delta_i = (md5int(orig_id:i) % 1000 - 500) * 1e-5) — gives
    the cosine near-dup detector true positives, SQL-reproducibly."""
    base = df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # NB: the delta hashes the ORIGINAL id. Spark 4 resolves lateral
    # aliases, so `vec_id` inside the lambda would see the re-aliased
    # (vec_id + offset) — rename first to keep it unambiguous.
    perturbed = (
        base.filter(F.col("vec_id") % 4 == 0)
        .select(F.col("vec_id").alias("orig_id"), "v")
        .select(
            (F.col("orig_id") + id_offset).alias("vec_id"),
            F.transform(
                "v",
                lambda x, i: x
                + (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("orig_id").cast("string"),
                                    F.lit(":"),
                                    i.cast("string"),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 1000
                    - 500
                )
                * 0.00001,
            ).alias("v"),
        )
    )
    return base.unionByName(perturbed)


# SRP-LSH geometry. Plane counts are parameters because they must scale
# ~log2(n): with b planes a bucket holds ~n/2^b vectors and the
# within-bucket self-join produces ~n^2/2^b pairs — keeping b ≈ log2(n)+c
# makes that ~n/2^c, i.e. linear. Recall lost to more planes is recovered
# with n_tables independent plane sets OR'd together (dedup) / hamming-1
# multi-probe (topk).
DEDUP_LSH_PLANES = 12
DEDUP_LSH_TABLES = 2
DEDUP_BUCKET_CAP = 64
ANN_LSH_PLANES = 8


def srp_plane(key, dim: int) -> list[float]:
    """Deterministic ±1 signed-random-projection plane: component i is
    +1 iff the md5-derived 60-bit int of "{key}:{i}" is odd (portable —
    the DuckDB oracle derives the identical plane in SQL). `key` is the
    global plane id (table t, plane p -> t * n_planes + p)."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:15], 16) % 2
        == 1
        else -1.0
        for i in range(dim)
    ]


def _srp_bucket(v_col, plane_keys: list, dim: int) -> Column:
    """Integer bucket id: bit p set iff dot(v, plane_keys[p]) > 0. The
    plane literals are baked into the expression (JVM-side zip_with/
    aggregate, no Python at runtime, no driver-side data probe)."""
    bucket = F.lit(0)
    for p, key in enumerate(plane_keys):
        plane = F.array(*[F.lit(c) for c in srp_plane(key, dim)])
        dot_p = F.aggregate(
            F.zip_with(v_col, plane, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_p > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("int")


def _srp_buckets_udf(dim: int, plane_sets: list[list]):
    """Arrow-vectorized SRP bucketing: one pandas_udf computing every
    table's bucket in a single numpy matmul per batch (Spark's
    higher-order array functions are interpreted, not codegen'd — at
    24+ plane dots per row the HOF walk costs ~100x the BLAS product).
    Returns array<int>, one bucket per plane set. Sign decisions agree
    with the fold/list_sum formulations: summation-order error is
    ~1e-15 relative while |dot| is O(1) — a sign flip would need a dot
    within float-epsilon of zero."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    n_tables = len(plane_sets)
    n_planes = len(plane_sets[0])
    flat = np.array(
        [srp_plane(key, dim) for keys in plane_sets for key in keys]
    )  # (T*P, dim)
    weights = 1 << np.arange(n_planes)

    def f(vs):
        if not len(vs):
            return pd.Series([], dtype=object)
        V = np.vstack(vs.to_numpy())  # (n, dim) float64
        bits = (V @ flat.T) > 0  # (n, T*P)
        buckets = (
            bits.reshape(len(vs), n_tables, n_planes) * weights
        ).sum(axis=2).astype("int32")
        return pd.Series(list(buckets))

    # real annotation objects: `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf cannot resolve
    f.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(f, "array<int>")


def srp_candidate_pairs(
    emb: DataFrame,
    dim: int,
    n_planes: int = DEDUP_LSH_PLANES,
    n_tables: int = DEDUP_LSH_TABLES,
    bucket_cap: int = DEDUP_BUCKET_CAP,
) -> DataFrame:
    """Candidate (vec_a < vec_b) pairs from multi-table SRP-LSH with
    hot-bucket splitting. `emb` must carry (vec_id, v).

    - n_tables independent plane sets; a pair is a candidate if it
      collides in ANY table (union + dedup) — the OR construction that
      buys recall back from the higher plane count.
    - Hot-bucket guard: a bucket holding B > bucket_cap vectors (one
      dense semantic cluster — near-identical boilerplate embeddings —
      that more planes cannot separate, because every SRP plane sees the
      same direction) is split into ceil(B/cap) salt groups by
      hash(vec_id, table); the self-join runs within a salt group, so
      the pair count is bounded by ~B*cap/2 — linear in B instead of
      B^2/2. Pairs split across salt groups in one table can still
      collide in another (the salt hashes the table id), so the
      multi-table OR also mitigates the recall cost of the cap.
    - Only (table, bkey, vec_id) travels through the self-join; vectors
      join back later on the (small) candidate set.
    """
    plane_sets = [
        [t * n_planes + p for p in range(n_planes)] for t in range(n_tables)
    ]
    buckets_udf = _srp_buckets_udf(dim, plane_sets)
    bucketed = (
        emb.select("vec_id", F.posexplode(buckets_udf("v")))
        .select(
            "vec_id",
            F.col("pos").alias("tbl"),
            F.col("col").alias("bucket"),
        )
    )
    # cache: (vec_id, tbl, bucket) is tiny, but each bucket value costs
    # n_planes dim-length dot products — consumed 3x below (counts +
    # both self-join sides) without the cache
    bucketed = bucketed.cache()
    counts = bucketed.groupBy("tbl", "bucket").agg(
        F.count("*").alias("bucket_n")
    )
    n_split = F.ceil(F.col("bucket_n") / F.lit(float(bucket_cap)))
    salt = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("vec_id").cast("string"),
                        F.lit(":"),
                        F.col("tbl").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % n_split
    )
    keyed = (
        bucketed.join(counts, ["tbl", "bucket"])
        .withColumn(
            "bkey",
            F.when(
                F.col("bucket_n") > bucket_cap,
                F.concat_ws(":", F.col("bucket"), salt),
            ).otherwise(F.col("bucket").cast("string")),
        )
        .select("vec_id", "tbl", "bkey")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, ["tbl", "bkey"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )


def dedup_embedding_cosine(
    df: DataFrame,
    dim: int,
    threshold: float = 0.98,
    n_planes: int = DEDUP_LSH_PLANES,
    n_tables: int = DEDUP_LSH_TABLES,
    bucket_cap: int = DEDUP_BUCKET_CAP,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: multi-table SRP-LSH bounds the
    candidate set (srp_candidate_pairs), exact cosine verifies. The
    scale shape for 'find semantic dups across 10^9 vectors': size
    n_planes ≈ log2(n) so candidates grow ~linearly with the corpus.
    `dim` is a required parameter — plane literals are built at plan
    time with no driver-side data probe."""
    aug = with_near_dup_vectors(df)
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    # cache: (vec_id, v, norm) feeds the bucketing pass plus both sides
    # of the candidate verify join — without it the md5 perturbation +
    # norm fold is evaluated 3x. (Spark caches spill to disk, so this
    # stays safe when the vector table outgrows executor memory.)
    emb = aug.withColumn("norm", norm).cache()
    cand = srp_candidate_pairs(
        emb.select("vec_id", "v"), dim, n_planes, n_tables, bucket_cap
    )
    slim = emb.select("vec_id", "v", "norm")
    cand = cand.join(
        slim.select(
            F.col("vec_id").alias("vec_a"),
            F.col("v").alias("v_a"),
            F.col("norm").alias("norm_a"),
        ),
        "vec_a",
    ).join(
        slim.select(
            F.col("vec_id").alias("vec_b"),
            F.col("v").alias("v_b"),
            F.col("norm").alias("norm_b"),
        ),
        "vec_b",
    )
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.withColumn(
            "cosine", F.round(dot / (F.col("norm_a") * F.col("norm_b")), 4)
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def ann_lsh_topk(
    df: DataFrame, dim: int, n_queries: int = 10, k: int = 5,
    n_planes: int = ANN_LSH_PLANES,
) -> DataFrame:
    """LSH-bucketed ANN — the scale path: vectors hash into 2^n_planes
    SRP buckets; each query scores its own bucket plus the n_planes
    hamming-1 probe buckets (multi-probe LSH — the recall knob that lets
    n_planes scale with corpus size while a query still sees ~(n_planes
    +1) * n/2^n_planes candidates, not one brittle bucket). The corpus
    side streams (broadcast query side), candidates verify with exact
    cosine, top-k per query. Recall < 1 by design; the oracle computes
    the same algorithm so results match exactly. `dim` is a required
    parameter — no driver-side data probe."""
    from pyspark.sql.window import Window

    emb = df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    buckets_udf = _srp_buckets_udf(dim, [list(range(n_planes))])
    emb = emb.withColumn("norm", norm).withColumn(
        "bucket", F.element_at(buckets_udf("v"), 1)
    )
    # each query probes its own bucket + every hamming-1 neighbor bucket
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << p))
            for p in range(n_planes)
        ],
    )
    q = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            F.explode(probes).alias("probe_bucket"),
        )
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        emb.join(
            F.broadcast(q), F.col("bucket") == F.col("probe_bucket"), "inner"
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(dot / (F.col("norm") * F.col("qnorm")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"),
                F.col("bucket").cast("long").alias("bucket"), "cosine")
    )


def ann_cosine_topk(df: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k: the small query side is broadcast, the
    corpus side streams — the scale path for 'give me neighbors of a few
    probes over 10^9 vectors'. Dot products via zip_with/aggregate in
    doubles (JVM, codegen)."""
    from pyspark.sql.window import Window

    emb = df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    norm = F.sqrt(
        F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    emb = emb.withColumn("norm", norm)
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = dot / (F.col("norm") * F.col("qnorm"))
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(sim, 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"),
                "cosine")
    )


# Gopher-style repetition gates (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", §A1.1 repetition filters — public spec; thresholds
# are constants of this repo so the oracle is reproducible).
REP_MIN_WORDS = 20
REP_MAX_WORDS = 100_000
REP_DUP_WORD_MAX = 0.30
REP_TOP_BIGRAM_MAX = 0.20


def repetition_scores(df: DataFrame) -> DataFrame:
    """Repetition-based quality signals per document: duplicate-word
    ratio (1 - distinct/total) and the corpus-classic top-bigram
    fraction (occurrences of the most frequent word bigram / total
    bigrams), plus the composed Gopher-style keep bit.

    Scale shape: ENTIRELY map-side — the per-doc bigram mode is
    computed inside an Arrow-batched kernel (a Counter per doc), so no
    explode ever reaches a shuffle; output is one slim row per doc.
    The expression alternative (explode bigrams -> groupBy(doc, bigram)
    -> window max) would shuffle the full token stream twice. Ties in
    the bigram mode don't matter: only the max COUNT is emitted.

    The Counter-per-doc loop is a MEASURED choice, not a default: the
    house flattened-batch form (factorize words once, np.unique over
    (doc, code) keys for distincts, sort + run-length + maximum.reduceat
    for the bigram mode) was built and A/B'd bit-identical — it ties on
    the 5k-doc bench table and is 2x SLOWER on a heavy-tail batch (one
    2M-word doc + 500 short: 1.7 s loop vs 3.3 s vectorized), because
    Counter's C-level dict ops beat the O(n log n) packed-key sort and
    the object-array flatten that feeds factorize. Per-doc dict ops are
    the right kernel when the reduction is per-doc modes over unbounded
    vocab, unlike the fixed-width hash folds where reduceat wins."""
    import pandas as pd

    def gen(batches):
        from collections import Counter

        for pdf in batches:
            ids, n_words, dup_ratio, top_big = [], [], [], []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                if t is None:
                    # one row per doc, like quality_scores: a null-text
                    # doc is REPORTED as rejected (n_words=0 fails the
                    # floor), not silently dropped — downstream
                    # left-join+coalesce gates (curate/pretrain) would
                    # otherwise reject it with no surfaced signal
                    # (ADVICE r03)
                    ids.append(int(did))
                    n_words.append(0)
                    dup_ratio.append(0.0)
                    top_big.append(0.0)
                    continue
                ws = t.split(" ")
                n = len(ws)
                ids.append(int(did))
                n_words.append(n)
                # NO Python round() here: it rounds half-to-even, while
                # Spark's F.round and DuckDB's round are HALF_UP — a
                # ratio like 2/64 = 0.03125 would diverge at 4 decimals.
                # Raw doubles out; F.round below keeps both engines on
                # the same IEEE value + the same rounding rule.
                dup_ratio.append(1.0 - len(set(ws)) / n)
                if n >= 2:
                    c = Counter(zip(ws, ws[1:]))
                    top_big.append(max(c.values()) / (n - 1))
                else:
                    top_big.append(0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "dup_word_ratio": pd.Series(dup_ratio, dtype="float64"),
                    "top_bigram_frac": pd.Series(top_big, dtype="float64"),
                }
            )

    scored = df.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).mapInPandas(
        gen,
        "doc_id long, n_words long, dup_word_ratio double, "
        "top_bigram_frac double",
    )
    scored = scored.select(
        "doc_id",
        "n_words",
        F.round("dup_word_ratio", 4).alias("dup_word_ratio"),
        F.round("top_bigram_frac", 4).alias("top_bigram_frac"),
    )
    return scored.withColumn(
        "repetition_ok",
        (F.col("n_words") >= REP_MIN_WORDS)
        & (F.col("n_words") <= REP_MAX_WORDS)
        & (F.col("dup_word_ratio") <= REP_DUP_WORD_MAX)
        & (F.col("top_bigram_frac") <= REP_TOP_BIGRAM_MAX),
    )


IVF_CENTROIDS = 16
IVF_PROBE = 2
IVF_TRAIN_ITERS = 2
# Fixed-point scale for Lloyd centroid means: coordinates quantize to
# micro units and sum as exact longs, so the mean is a ratio of two
# integers — identical in ANY aggregation order and in both engines.
# A float mean would depend on Spark's nondeterministic partition-sum
# order (and differ from DuckDB's), poisoning the downstream argmin.
IVF_CENT_SCALE = 1_000_000


def _ivf_d2() -> Column:
    """Squared L2 distance v<->cv as a sequential fold (list_reduce
    parity with the DuckDB oracle)."""
    return F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _ivf_cents(
    emb: DataFrame,
    n_queries: int,
    n_centroids: int,
    dim: int | None,
    train_iters: int,
) -> DataFrame:
    """(cid, cv) centroid table: deterministic seeds (the vectors with
    vec_id in [n_queries, n_queries + n_centroids)), refined by
    `train_iters` Lloyd iterations. Each iteration is the SAME argmin
    plan the index assignment uses (crossJoin against the broadcast
    centroid table -> map-side min-struct partial agg) followed by a
    per-list mean over micro-quantized fixed-point sums (IVF_CENT_SCALE
    — exact integer arithmetic, so the whole training is deterministic
    and the DuckDB oracle replays the identical iterations). Lists that
    go empty keep their previous centroid. Scale shape per iteration:
    one slim shuffle of (vec_id -> cid) argmin rows plus a dim-wide
    partial-agg shuffle of n_centroids rows; nothing driver-side.

    Each iteration MATERIALIZES its n_centroids-row output
    (localCheckpoint — the graphops CC-loop pattern): without the
    truncation, iteration i's plan nests iteration i-1's whole subtree
    inside dim-wide aggregates, and the consumer query then embeds that
    doubly-nested training tree once per use — at which point Catalyst
    analysis/codegen of the expression forest, not the data, dominates
    the wall (measured 1.2 s -> 10.5 s on the 2k-vector bench corpus
    when the training was left lazy). Index construction being a couple
    of tiny real jobs is the correct trade at any scale: a 10^9-vector
    run trains once and ships every task a 16-row table, not a nested
    training plan."""
    cents = emb.filter(
        (F.col("vec_id") >= n_queries)
        & (F.col("vec_id") < n_queries + n_centroids)
    ).select(
        (F.col("vec_id") - n_queries).alias("cid"),
        F.col("v").alias("cv"),
    )
    if train_iters <= 0:
        return cents
    if dim is None:
        raise ValueError("ann_ivf training requires dim (no data probe)")
    scale = float(IVF_CENT_SCALE)
    for _ in range(train_iters):
        pairs = (
            emb.select("vec_id", "v")
            .crossJoin(F.broadcast(cents))
            .withColumn("d2", _ivf_d2())
        )
        assign = (
            pairs.groupBy("vec_id")
            .agg(
                F.min(F.struct("d2", "cid")).alias("m"),
                F.first("v").alias("v"),
            )
            .select(F.col("m.cid").alias("cid"), "v")
        )
        # centroid means via posexplode -> (cid, pos) sums, NOT dim
        # per-coordinate aggregate columns: the O(dim) expression form
        # cost ~2 s of driver-side py4j construction + Catalyst
        # planning PER ITERATION (the dominant wall at any corpus
        # size); this shape is O(1) expressions, and the exploded
        # shuffle is n*dim slim longs — trivial next to the corpus
        # scan. Same integer math (long sums are order-independent),
        # so the DuckDB oracle's replay is still bit-identical.
        upd = (
            assign.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.round(F.col("x") * scale, 0).cast("long")).alias(
                    "s"
                ),
            )
            .withColumn("c", F.col("s") / (F.col("n") * F.lit(scale)))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda st: st["c"],
                ).alias("cv_new")
            )
        )
        cents = cents.join(upd, "cid", "left").select(
            "cid", F.coalesce("cv_new", "cv").alias("cv")
        )
    # ONE eager checkpoint after the last iteration: per-iteration
    # checkpoints would each pay a full job's fixed cost (~1.3 s of
    # scheduling + codegen for 16 rows, measured), while the slim
    # posexplode form nests train_iters deep without expression blowup
    # — one job runs the whole training, consumers see a 16-row table.
    return cents.localCheckpoint(eager=True)


def ivf_list_sizes(
    df: DataFrame,
    dim: int | None = None,
    n_queries: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    train_iters: int = IVF_TRAIN_ITERS,
) -> DataFrame:
    """(cid, list_n) inverted-list occupancy of the IVF index — the
    balance telemetry that says whether the coarse quantizer is doing
    its job (a max list >> mean list means probes scan far more than
    n_probe/n_centroids of the corpus). Pinned by the list-balance
    test: Lloyd training shrinks the imbalance on clustered corpora."""
    emb = df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).cache()
    cents = _ivf_cents(emb, n_queries, n_centroids, dim, train_iters)
    pairs = (
        emb.select("vec_id", "v")
        .crossJoin(F.broadcast(cents))
        .withColumn("d2", _ivf_d2())
    )
    return (
        pairs.groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .groupBy(F.col("m.cid").alias("cid"))
        .agg(F.count("*").alias("list_n"))
        .orderBy("cid")
    )


def ann_ivf_topk(
    df: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    dim: int | None = None,
    train_iters: int = IVF_TRAIN_ITERS,
) -> DataFrame:
    """IVF-flat ANN — the coarse-quantizer variant of the scale path
    (complement of the SRP ann_lsh_topk): vectors partition into
    `n_centroids` inverted lists by nearest centroid; each query scans
    only its `n_probe` nearest lists (~n_probe/n_centroids of the
    corpus), candidates verify with exact cosine, top-k per query.

    Centroids are SEEDED deterministically and Lloyd-refined for
    `train_iters` iterations (_ivf_cents — exact fixed-point means, so
    the DuckDB oracle rebuilds the identical index; each iteration
    materializes its 16-row output to keep consumer plans flat — see
    _ivf_cents; pass train_iters=0 for the untrained seeds,
    which on clustered corpora leave badly unbalanced lists — see
    ivf_list_sizes). `dim` is required when training (plan-time
    literals, no driver-side data probe). Scale shape: the argmin
    assignment is a map-side partial aggregation — the crossJoin
    against the broadcast centroid table collapses to one row per
    vector BEFORE any shuffle (min over (d2, cid) structs,
    deterministic under ties) — and the probe join streams the corpus
    against a broadcast query side. Distances fold sequentially
    (F.aggregate == list_reduce) so engine parity is exact."""
    from pyspark.sql.window import Window

    emb = df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    # cache: consumed by every training iteration plus the final
    # assignment and probe passes
    emb = emb.withColumn("norm", norm).cache()
    cents = _ivf_cents(emb, n_queries, n_centroids, dim, train_iters)
    pairs = emb.crossJoin(F.broadcast(cents)).withColumn("d2", _ivf_d2())
    assigned = (
        pairs.groupBy("vec_id")
        .agg(
            F.min(F.struct("d2", "cid")).alias("m"),
            F.first("v").alias("v"),
            F.first("norm").alias("norm"),
        )
        .select("vec_id", F.col("m.cid").alias("cid"), "v", "norm")
    )
    probe_w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    qprobe = (
        pairs.filter(F.col("vec_id") < n_queries)
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= n_probe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("cid").alias("probe_cid"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
        )
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        assigned.join(
            F.broadcast(qprobe), F.col("cid") == F.col("probe_cid")
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine", F.round(dot / (F.col("norm") * F.col("qnorm")), 4)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"),
                F.col("cid").cast("long").alias("cid"), "cosine")
    )


def ann_recall(
    df: DataFrame,
    dim: int,
    n_queries: int = 10,
    k: int = 5,
    lsh_planes: int | None = None,
    ivf_probe: int = IVF_PROBE,
) -> DataFrame:
    """recall@k of the two approximate ANN paths against the exact
    brute-force answer, one row per method: (method, hits, recall_at_k).
    This is the quality gauge the approximate indexes' knobs (multi-
    probe planes, n_probe) are tuned against — without it a pipeline
    dedups/searches blind (VERDICT r03 #3). Cost: the three top-k
    queries themselves (each streams the corpus once against a
    broadcast query side) plus two joins on the tiny (n_queries x k)
    result tables; recall floors are pinned by
    test_ann_recall_floor.

    Cache shape: the input is cached so the three methods' passes (and
    the IVF Lloyd iterations) read one materialization instead of
    re-scanning the source per branch, and the exact answer is cached
    so the per-method comparison join doesn't replay the brute-force
    pass per method. A production gauge runs on a bounded sample of
    the corpus (recall needs statistical, not exhaustive, coverage),
    so both caches are sample-sized; lifecycle is caller-owned (see
    curate_corpus's CACHE LIFECYCLE note)."""
    kw = {} if lsh_planes is None else {"n_planes": lsh_planes}
    df = df.cache()
    exact = ann_cosine_topk(df, n_queries, k).select(
        "query_id", "neighbor_id"
    ).cache()
    approx = {
        "ivf": ann_ivf_topk(
            df, n_queries, k, n_probe=ivf_probe, dim=dim
        ).select("query_id", "neighbor_id"),
        "lsh": ann_lsh_topk(df, dim, n_queries, k, **kw).select(
            "query_id", "neighbor_id"
        ),
        # the compressed-scan paths: ADC ranks by approximate L2, the
        # exact answer by cosine — on the unnormalized bench corpus
        # their recall reads LOWER than the geometry-preserving paths
        # by construction; the gauge exists to make that visible
        "pq": ann_pq_topk(
            df, dim, n_queries=n_queries, topk=k
        ).select("query_id", "neighbor_id"),
        "ivfpq": ann_ivfpq_topk(
            df, dim, n_probe=ivf_probe, n_queries=n_queries, topk=k
        ).select("query_id", "neighbor_id"),
    }
    denom = float(n_queries * k)
    per_method = [
        a.join(exact, ["query_id", "neighbor_id"]).agg(
            F.lit(m).alias("method"),
            F.count("*").cast("long").alias("hits"),
            F.round(F.count("*") / denom, 4).alias("recall_at_k"),
        )
        for m, a in approx.items()
    ]
    out = per_method[0]
    for p in per_method[1:]:
        out = out.unionByName(p)
    return out.orderBy("method")


PQ_M = 4            # subspaces (EMBED dim must divide evenly)
PQ_CODES = 16       # codes per subspace codebook (1 byte would be 256)
PQ_TRAIN_ITERS = 2  # Lloyd iterations per subspace (the IVF setting)
PQ_DIST_SCALE = 1_000_000  # fixed-point for order-independent ADC sums
PQ_RERANK = 8       # shortlist factor for the refine step (R*topk)


def _pq_emb(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _pq_d2(vslice: Column) -> Column:
    """Squared L2 between a subvector slice and the codeword `cv` as a
    sequential fold (list_reduce parity with the DuckDB oracle — the
    _ivf_d2 discipline)."""
    return F.aggregate(
        F.zip_with(vslice, F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_sliced(emb: DataFrame, dim: int, m: int) -> DataFrame:
    """(vec_id, sub, v): the m contiguous subvector slices of every
    vector, inline-exploded once — the working table both training and
    encoding join against."""
    sub = dim // m
    slices = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("sub"),
                F.slice("v", j * sub + 1, sub).alias("v"),
            )
            for j in range(m)
        ]
    )
    return emb.select(
        "vec_id", F.explode(slices).alias("s")
    ).select("vec_id", "s.sub", "s.v")


def pq_codebooks(
    emb: DataFrame,
    dim: int,
    m: int = PQ_M,
    k: int = PQ_CODES,
    train_iters: int = PQ_TRAIN_ITERS,
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011, PAMI): split
    the space into `m` contiguous subspaces of dim/m and train an
    independent k-means codebook per subspace — the SAME deterministic
    Lloyd update the IVF index uses (exact fixed-point centroid means,
    seeds = vec_id in [10, 10+k) sliced per subspace), so the DuckDB
    oracle replays every codebook bit-identically. Returns
    (sub, cid, cv): m*k rows, broadcast-sized by construction
    (m*k*dim/m = k*dim doubles, independent of corpus size).

    Scale/wall shape: all m subspaces train in ONE fused job under the
    compound (sub, cid) key — each iteration is one equi-join of the
    sliced table against the broadcast m*k-row centroid table (hash
    join, not a nested loop), one (vec_id, sub) argmin partial agg, one
    (sub, cid, pos) fixed-point mean — and ONE localCheckpoint
    materializes every codebook (the _ivf_cents per-training
    checkpoint, paid once instead of m times: the m-separate-trainings
    form cost m*fixed-job-overhead, measured 8.8 s -> fused ~4 s at
    sf0.1 where scheduling, not data, dominates). Per subspace the
    math is identical to _ivf_cents, which is why the per-subspace
    oracle replay needs no restructuring."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sliced = _pq_sliced(emb, dim, m)
    cents = sliced.filter(
        (F.col("vec_id") >= 10) & (F.col("vec_id") < 10 + k)
    ).select("sub", (F.col("vec_id") - 10).alias("cid"),
             F.col("v").alias("cv"))
    scale = float(IVF_CENT_SCALE)
    for _ in range(train_iters):
        pairs = sliced.join(F.broadcast(cents), "sub").withColumn(
            "d2", _pq_d2(F.col("v"))
        )
        assign = (
            pairs.groupBy("vec_id", "sub")
            .agg(
                F.min(F.struct("d2", "cid")).alias("mm"),
                F.first("v").alias("v"),
            )
            .select("sub", F.col("mm.cid").alias("cid"), "v")
        )
        upd = (
            assign.select("sub", "cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("sub", "cid", "pos")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.round(F.col("x") * scale, 0).cast("long")).alias(
                    "s"
                ),
            )
            .withColumn("c", F.col("s") / (F.col("n") * F.lit(scale)))
            .groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda st: st["c"],
                ).alias("cv_new")
            )
        )
        cents = cents.join(upd, ["sub", "cid"], "left").select(
            "sub", "cid", F.coalesce("cv_new", "cv").alias("cv")
        )
    return cents.localCheckpoint(eager=True)


def pq_codes(
    df: DataFrame,
    dim: int,
    m: int = PQ_M,
    k: int = PQ_CODES,
    train_iters: int = PQ_TRAIN_ITERS,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """PQ encoding: one row per (vec_id, sub) with the argmin codeword
    id — the compressed representation an ADC search scans instead of
    raw vectors (dim floats -> m small ints per vector; at dim=64,
    m=4, k=16 that is 256 bytes -> 4 codes, a 64x scan-size cut).

    Scale shape: ONE crossJoin against the broadcast m*k-row codebook
    table with the argmin collapsing map-side (partial min over
    (d2, cid) structs BEFORE the shuffle — the IVF assignment
    discipline), then a slim (vec_id, sub, code) shuffle. Bounded
    fanout k per (vector, subspace), never all-pairs — the codebook
    join is an EQUI-join on sub against the broadcast table. Pass
    `codebooks` to reuse an already-trained table (ann_pq_topk does —
    ONE training per query, not one per stage)."""
    return _pq_codes_of(_pq_emb(df), dim, m, k, train_iters, codebooks)


def _pq_codes_of(
    emb: DataFrame,
    dim: int,
    m: int,
    k: int,
    train_iters: int,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """pq_codes over a pre-shaped (vec_id, v) table — the form the
    IVF-PQ residual path encodes (its vectors are residuals, not the
    embedding column)."""
    cb = (
        codebooks
        if codebooks is not None
        else pq_codebooks(emb, dim, m, k, train_iters)
    )
    pairs = _pq_sliced(emb, dim, m).join(
        F.broadcast(cb), "sub"
    ).withColumn("d2", _pq_d2(F.col("v")))
    return (
        pairs.groupBy("vec_id", "sub")
        .agg(F.min(F.struct("d2", "cid")).alias("mm"))
        .select(
            "vec_id",
            F.col("sub").cast("long").alias("sub"),
            F.col("mm.cid").cast("long").alias("code"),
        )
    )


def ann_pq_topk(
    df: DataFrame,
    dim: int,
    m: int = PQ_M,
    k: int = PQ_CODES,
    train_iters: int = PQ_TRAIN_ITERS,
    n_queries: int = 10,
    topk: int = 5,
    rerank: int = 0,
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over PQ codes: the
    query stays exact, every database vector is its m codes, and
    distance ~ sum_j d2(q_slice_j, codebook[j][code_j]) — a lookup-table
    sum instead of a dim-wide dot per candidate. Output
    (query_id, rank, neighbor_id, adist), rank 1..topk ascending by
    approximate distance (vec_id tiebreak).

    `rerank=R` (R > 0) switches to the textbook shortlist-then-refine
    form: ADC keeps the top R*topk candidates, then EXACT cosine over
    just those re-ranks the final topk — output becomes (query_id,
    rank, neighbor_id, cosine), rank descending by cosine. Pure ADC
    cannot rank WITHIN a tight cluster (the quantizer collapses the
    cluster to one code signature and ties break by vec_id — recall
    degenerates toward topk/cluster_size; ann_recall makes this
    visible), so the refine step is how flat PQ reaches exact-path
    recall while still reading only R*topk full vectors per query.

    Determinism: each LUT entry is micro-quantized to a PQ_DIST_SCALE
    fixed-point long and the per-vector sum runs over longs, so the
    ADC distance is order-independent and the DuckDB replay is
    bit-identical (the _ivf_cents discipline applied to scoring);
    ranking compares integers, never float ties.

    Scale shape: the LUT is n_queries*m*k rows (broadcast by
    construction); codes join it on (sub, code) equality — an
    n*m-row slim table against a broadcast hash side, partial-agg
    summing map-side to n*n_queries rows before the shuffle. Per-query
    work is linear in n with a ~m-int payload: the 'scan compressed
    codes, not vectors' economics PQ exists for."""
    emb = _pq_emb(df)
    cb = pq_codebooks(emb, dim, m, k, train_iters)
    codes = pq_codes(df, dim, m, k, train_iters, codebooks=cb)
    qs = _pq_sliced(
        emb.filter(F.col("vec_id") < n_queries), dim, m
    ).withColumnRenamed("vec_id", "query_id")
    lut = (
        qs.join(F.broadcast(cb), "sub")
        .withColumn(
            "d2q",
            F.round(
                _pq_d2(F.col("v")) * F.lit(float(PQ_DIST_SCALE)), 0
            ).cast("long"),
        )
        .select("query_id", F.col("sub").cast("long").alias("sub"),
                F.col("cid").cast("long").alias("code"), "d2q")
    )
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2q").alias("dq"))
    )
    from pyspark.sql.window import Window

    win = Window.partitionBy("query_id").orderBy("dq", "vec_id")
    ranked = scored.withColumn(
        "rank", F.row_number().over(win).cast("long")
    )
    if not rerank:
        return ranked.filter(F.col("rank") <= topk).select(
            "query_id", "rank", F.col("vec_id").alias("neighbor_id"),
            (F.col("dq") / F.lit(float(PQ_DIST_SCALE))).alias("adist"),
        )
    # refine: exact cosine over the ADC shortlist only — R*topk full
    # vectors per query instead of n (equi-joins on vec_id/query_id;
    # the query side is n_queries rows, broadcast)
    norm = F.sqrt(
        F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    nv = emb.withColumn("norm", norm)
    shortlist = ranked.filter(
        F.col("rank") <= rerank * topk
    ).select("query_id", "vec_id")
    qn = nv.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    cos = F.round(
        F.aggregate(
            F.zip_with("v", "qv", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("norm") * F.col("qnorm")),
        4,
    )
    refined = (
        shortlist.join(nv, "vec_id")
        .join(F.broadcast(qn), "query_id")
        .withColumn("cosine", cos)
    )
    rwin = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        refined.withColumn("rank", F.row_number().over(rwin).cast("long"))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id", "rank", F.col("vec_id").alias("neighbor_id"),
            "cosine",
        )
    )


def ann_ivfpq_topk(
    df: DataFrame,
    dim: int,
    m: int = PQ_M,
    k: int = PQ_CODES,
    train_iters: int = PQ_TRAIN_ITERS,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    n_queries: int = 10,
    topk: int = 5,
) -> DataFrame:
    """IVF-PQ — the composition a 10^9+-vector deployment actually
    runs (the FAISS IVFPQ shape): the Lloyd-trained coarse quantizer
    prunes WHICH vectors to look at (each query probes its n_probe
    nearest inverted lists), and PQ codes trained on the RESIDUALS
    (v - centroid[cid]) shrink WHAT gets read per candidate. Residual
    quantization is what makes the two compose: within a list the
    residual distribution is centered, so the same k codewords cover
    it far more finely than they cover raw space. The ADC lookup table
    is built per (query, probed list) from the query's OWN residual
    against that list's centroid — n_queries*n_probe*m*k entries,
    broadcast-sized by construction. Output (query_id, rank,
    neighbor_id, cid, adist), rank ascending by approximate distance
    (vec_id tiebreak), integer-exact via the PQ_DIST_SCALE fixed-point
    discipline.

    Scale shape: both trainings are tiny materialized jobs (ONE
    localCheckpoint each); assignment and encoding collapse map-side;
    scoring joins the slim (vec_id, cid, sub, code) table against the
    broadcast LUT on (cid, sub, code) EQUALITY — the list pruning is
    IN the join key, so unprobed lists never leave the scan, and
    per-query work is n*n_probe/n_centroids candidates of m ints, not
    n*dim floats. No nested loop outside the bounded centroid
    crossJoins."""
    emb = _pq_emb(df)
    cents, rcb, codes = ivfpq_build(
        emb, dim, m, k, train_iters, n_centroids, n_queries
    )
    return ivfpq_search(
        emb.filter(F.col("vec_id") < n_queries),
        cents, rcb, codes, dim, m, n_probe, topk,
    )


def ivfpq_build(
    emb: DataFrame,
    dim: int,
    m: int = PQ_M,
    k: int = PQ_CODES,
    train_iters: int = PQ_TRAIN_ITERS,
    n_centroids: int = IVF_CENTROIDS,
    n_queries: int = 10,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """IVF-PQ index construction over a (vec_id, v) table: returns the
    three persistable artifacts — (cents(cid, cv), codebooks(sub, cid,
    cv), codes(vec_id, sub, code, cid)) — the train-once outputs a
    10^9-vector deployment writes to storage and every later query job
    reads instead of retraining (jobs/build_ann_index.py does exactly
    that)."""
    cents = _ivf_cents(emb, n_queries, n_centroids, dim, train_iters)
    pairs = emb.crossJoin(F.broadcast(cents)).withColumn("d2", _ivf_d2())
    assigned = (
        pairs.groupBy("vec_id")
        .agg(
            F.min(F.struct("d2", "cid")).alias("mm"),
            F.first("v").alias("v"),
        )
        .select("vec_id", F.col("mm.cid").alias("cid"), "v")
    )
    res = assigned.join(F.broadcast(cents), "cid").select(
        "vec_id",
        "cid",
        F.zip_with("v", "cv", lambda a, b: a - b).alias("v"),
    )
    rcb = pq_codebooks(
        res.select("vec_id", "v"), dim, m, k, train_iters
    )
    codes = _pq_codes_of(
        res.select("vec_id", "v"), dim, m, k, train_iters, codebooks=rcb
    ).join(assigned.select("vec_id", "cid"), "vec_id")
    return cents, rcb, codes


def ivfpq_search(
    qemb: DataFrame,
    cents: DataFrame,
    rcb: DataFrame,
    codes: DataFrame,
    dim: int,
    m: int = PQ_M,
    n_probe: int = IVF_PROBE,
    topk: int = 5,
) -> DataFrame:
    """ADC search over a PREBUILT IVF-PQ index: qemb is (vec_id, v)
    query vectors; cents/rcb/codes are ivfpq_build's artifacts (fresh
    or read back from parquet — the tables are the interface). Rows
    whose vec_id equals a query id are excluded (the self-neighbor
    convention of the ann family)."""
    # n_probe nearest lists per query, residual vs EACH probed
    # centroid (the query's residual differs per list)
    from pyspark.sql.window import Window

    qpairs = qemb.crossJoin(F.broadcast(cents)).withColumn(
        "d2", _ivf_d2()
    )
    pwin = Window.partitionBy("vec_id").orderBy("d2", "cid")
    probes = (
        qpairs.withColumn("pr", F.row_number().over(pwin))
        .filter(F.col("pr") <= n_probe)
        .select(
            F.col("vec_id").alias("query_id"),
            "cid",
            F.zip_with("v", "cv", lambda a, b: a - b).alias("v"),
        )
    )
    sub = dim // m
    pslices = probes.select(
        "query_id", "cid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("sub"),
                        F.slice("v", j * sub + 1, sub).alias("v"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("query_id", "cid", "s.sub", "s.v")
    # rcb's cid is the CODEWORD id; rename before the join so it can't
    # shadow the IVF list cid riding alongside
    rcb_k = rcb.select("sub", F.col("cid").alias("code"), "cv")
    lut = (
        pslices.join(F.broadcast(rcb_k), "sub")
        .withColumn(
            "d2q",
            F.round(
                _pq_d2(F.col("v")) * F.lit(float(PQ_DIST_SCALE)), 0
            ).cast("long"),
        )
        .select(
            "query_id",
            F.col("cid").cast("long").alias("cid"),
            F.col("sub").cast("long").alias("sub"),
            F.col("code").cast("long").alias("code"),
            "d2q",
        )
    )
    scored = (
        codes.select(
            "vec_id", F.col("cid").cast("long").alias("cid"),
            "sub", "code",
        )
        .join(F.broadcast(lut), ["cid", "sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2q").alias("dq"), F.first("cid").alias("cid"))
    )
    rwin = Window.partitionBy("query_id").orderBy("dq", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(rwin).cast("long"))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id", "rank", F.col("vec_id").alias("neighbor_id"),
            "cid",
            (F.col("dq") / F.lit(float(PQ_DIST_SCALE))).alias("adist"),
        )
    )


def semdedup(
    df: DataFrame,
    dim: int | None = None,
    n_centroids: int = IVF_CENTROIDS,
    train_iters: int = IVF_TRAIN_ITERS,
    cos_min: float = 0.95,
    augment: bool = True,
) -> DataFrame:
    """Semantic dedup, the SemDeDup shape (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space with the SAME
    deterministic Lloyd training the IVF index uses (_ivf_cents — exact
    fixed-point centroid means, seeds shared with the ANN index so the
    DuckDB oracle rebuilds the identical clustering), then compare
    cosine ONLY within each cluster and flag every vector that has a
    lower-id in-cluster neighbor with cosine >= cos_min. Returns one row
    per vector: (vec_id, cid, is_dup, nn_cosine) where nn_cosine is the
    max cosine to any lower-id in-cluster neighbor at/above the
    threshold (NULL for keepers) — the min-id-keeper contract of
    dedup_exact, so a near-identical group keeps exactly its lowest id.

    This is the scale answer to 'pairwise semantic dedup is O(n²)': the
    cluster partition bounds comparisons to sum(s_c²) over list sizes
    s_c ≈ n/k, so k (n_centroids) is the knob — the paper sizes
    k ~ n/1e4..1e5 so per-list work is constant. Plan shape: Lloyd
    training is a couple of tiny materialized jobs (16-row table
    broadcast everywhere); the final argmin assignment collapses
    map-side (min over (d2, cid) structs before any shuffle); the
    within-cluster scan shuffles the assigned table twice on cid
    (2·n·dim doubles) and pairs in-task — no global self-join ever
    forms. Hot-list skew is bounded by the training itself
    (ivf_list_sizes is the gauge; Lloyd halves a >5x max/mean
    imbalance), and the per-list O(s²) scan is the algorithm's own cost
    model, not an accident of the plan. Boundary caveat (documented,
    inherent to SemDeDup): a near-dup pair straddling a Voronoi
    boundary is invisible — the paper accepts this; use
    dedup_embedding_cosine (SRP-LSH, boundary-free) when recall
    dominates.

    `augment=True` injects with_near_dup_vectors' engineered perturbed
    copies so the detector has SQL-reproducible true positives at every
    SF (the dedup_embedding_cosine convention); production callers pass
    augment=False."""
    base = df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    if augment:
        base = with_near_dup_vectors(df)
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    # cache: feeds every Lloyd iteration plus the final assignment pass
    emb = base.withColumn("norm", norm).cache()
    # seeds deliberately share the ANN index window ([10, 10+16)) so the
    # oracle's trained-centroid CTE is ONE definition for both families
    cents = _ivf_cents(emb, 10, n_centroids, dim, train_iters)
    pairs = emb.crossJoin(F.broadcast(cents)).withColumn("d2", _ivf_d2())
    assigned = (
        pairs.groupBy("vec_id")
        .agg(
            F.min(F.struct("d2", "cid")).alias("m"),
            F.first("v").alias("v"),
            F.first("norm").alias("norm"),
        )
        .select("vec_id", F.col("m.cid").alias("cid"), "v", "norm")
    )
    lo = assigned.select(
        "cid",
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"),
        F.col("norm").alias("na"),
    )
    hi = assigned.select(
        "cid",
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"),
        F.col("norm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("av", "bv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dups = (
        lo.join(hi, "cid")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 4))
        .filter(F.col("cosine") >= cos_min)
        .groupBy("b_id")
        .agg(F.max("cosine").alias("nn_cosine"))
    )
    return (
        assigned.select("vec_id", F.col("cid").cast("long").alias("cid"))
        .join(dups, assigned.vec_id == dups.b_id, "left")
        .select(
            "vec_id",
            "cid",
            F.col("nn_cosine").isNotNull().alias("is_dup"),
            "nn_cosine",
        )
    )


# ---------------------------------------------------------------------------
# Session 8: Bloom membership dedup, snapshot diff, code mining, topics
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 1 << 20  # default filter width (bits) = 32k packed words
BLOOM_K = 5             # hash probes per key (double hashing)


def _bloom_hashed(df: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, h1, h2) projection for the Bloom probes: two independent
    60-bit engine-portable hashes of the content (md5_60 of text and of
    'b:'+text), bound as REAL columns at a projection boundary — the
    HOF-materialization house rule; inlining them in the probe lambda
    would re-run md5 once per probe instead of once per doc."""
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _md5_60_of(F.col(text_col)).alias("h1"),
        _md5_60_of(F.concat(F.lit("b:"), F.col(text_col))).alias("h2"),
    )


def _bloom_probes(k: int, m_bits: int) -> Column:
    """Exploded probe positions (h1 + j*h2) mod m_bits, j in [0, k)."""
    return F.explode(
        F.transform(
            F.sequence(
                F.lit(0).cast("long"), F.lit(int(k) - 1).cast("long")
            ),
            lambda j: (F.col("h1") + j * F.col("h2")) % F.lit(int(m_bits)),
        )
    ).alias("pos")


_BLOOM_BIT = "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"


def bloom_bitmap(
    docs: DataFrame,
    *,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    text_col: str = "text",
) -> DataFrame:
    """(word, bits) Bloom bitmap of a corpus's content fingerprints —
    bloom_dedup's persistable index artifact (the exact-dedup sibling
    of incremental_dedup's --save-sigs signature table). One
    partial-aggregatable bit_or shuffle of k slim probe rows per doc;
    the table is bounded at m_bits/32 rows regardless of corpus size.
    Geometry contract: m_bits and k are baked into the bit positions —
    a persisted bitmap must be probed with the SAME (m_bits, k) it was
    built with (jobs/incremental_dedup.py guards this the
    build_ann_index way). Accumulate cycles with bloom_merge — constant
    work in the accumulated corpus size."""
    h = _bloom_hashed(docs, text_col)
    return (
        h.select(_bloom_probes(k, m_bits))
        .select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.expr(_BLOOM_BIT).alias("b"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )


def bloom_fps(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Distinct (fp) content-fingerprint table — the exact-verify side
    of bloom_dedup, persistable next to the bitmap so a crawl cycle
    hashes each doc once, ever."""
    return (
        _bloom_hashed(docs, text_col)
        .select(F.col("h1").alias("fp"))
        .distinct()
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two SAME-geometry Bloom bitmaps: bitmap(A ∪ B) ==
    bloom_merge(bitmap(A), bitmap(B)) because bit_or is associative —
    so accumulating a new crawl into the running filter is a full-outer
    join of two m_bits/32-row tables, independent of how many documents
    either side ever saw."""
    return (
        a.join(b.withColumnRenamed("bits", "bits2"), "word", "full_outer")
        .select(
            "word",
            (
                F.coalesce(F.col("bits"), F.lit(0).cast("long")).bitwiseOR(
                    F.coalesce(F.col("bits2"), F.lit(0).cast("long"))
                )
            ).alias("bits"),
        )
    )


def bloom_dedup(
    new_docs: DataFrame,
    old_docs: DataFrame = None,
    *,
    old_bitmap: DataFrame = None,
    old_fps: DataFrame = None,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    text_col: str = "text",
) -> DataFrame:
    """Broadcast-Bloom incremental exact dedup: flag each NEW-crawl doc
    whose content fingerprint is (probably) already in the accumulated
    OLD corpus, paying a ~m_bits/8-byte bitmap instead of pairing the
    new crawl against a 10^12-row key table — the membership fast path
    next to dedup_incremental's near-dup band join. Output: one row per
    new doc, (doc_id, bloom_hit, exact_dup), where bloom_hit is the
    filter's verdict (NO false negatives; false positives at the
    standard ~(1 - e^(-k*n/m))^k rate — the two columns differing IS
    the false-positive telemetry) and exact_dup is the verified answer:
    only the bloom_hit fraction of the new side reaches the exact
    fingerprint join, which is the operator's point at scale.

    Determinism / oracle: probe j's bit is (h1 + j*h2) mod m_bits with
    h1 = md5_60(text), h2 = md5_60('b:'+text) — double hashing (Kirsch
    & Mitzenmacher 2006) in exact BIGINT math (h1 + (k-1)*h2 < k*2^60
    << 2^63 for k <= 7), so DuckDB replays every bit and the bitmap is
    a pure function of the old corpus's content.

    Scale shape: the bitmap is a (word, bits) table of m_bits/32 rows
    built by ONE partial-aggregatable bit_or shuffle over k slim probe
    rows per old doc; it broadcasts at the default width (2^20 bits =
    32k rows, 0.5 MB). The new side's probes join the broadcast
    map-side and collapse to a per-doc bool_and partial agg — the new
    corpus never shuffles for the membership test. Sizing: at n_old =
    10^10 keys you raise m_bits toward 10^11 (12.5 GB) — past broadcast
    range, at which point the SAME (word, bits) equi-join runs as a
    shuffle join moving k longs per doc; the plan's join key does not
    change. The exact verify join then sees only the bloom_hit docs
    (AQE broadcasts that side when small), so the old fingerprint table
    is probed, never paired.

    Persisted-artifact hatch (the --old-sigs idiom): pass `old_bitmap=`
    (bloom_bitmap output, SAME m_bits/k geometry) and `old_fps=`
    (bloom_fps output) instead of `old_docs` and the accumulated corpus
    is never re-read, let alone re-hashed — jobs/incremental_dedup.py's
    --exact-prefilter closes that loop, OR-merging each cycle's bitmap
    via bloom_merge."""
    if old_bitmap is None or old_fps is None:
        if old_docs is None:
            raise ValueError(
                "bloom_dedup needs old_docs or (old_bitmap AND old_fps)"
            )
        if old_bitmap is None:
            old_bitmap = bloom_bitmap(
                old_docs, m_bits=m_bits, k=k, text_col=text_col
            )
        if old_fps is None:
            old_fps = bloom_fps(old_docs, text_col=text_col)
    new_h = _bloom_hashed(new_docs, text_col).cache()
    probes = _bloom_probes(k, m_bits)
    bit = F.expr(_BLOOM_BIT)
    bitmap = old_bitmap
    flags = (
        new_h.select("doc_id", probes)
        .select(
            "doc_id",
            F.shiftright(F.col("pos"), 5).alias("word"),
            bit.alias("b"),
        )
        .join(F.broadcast(bitmap), "word", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("bits").bitwiseAND(F.col("b")) != 0, F.lit(False)
            ).alias("hit"),
        )
        .groupBy("doc_id")
        .agg(F.expr("bool_and(hit)").alias("bloom_hit"))
    )
    verified = (
        flags.filter(F.col("bloom_hit"))
        .join(new_h.select("doc_id", F.col("h1").alias("fp")), "doc_id")
        .join(old_fps, "fp", "left_semi")
        .select("doc_id", F.lit(True).alias("exact"))
    )
    return flags.join(verified, "doc_id", "left").select(
        "doc_id",
        "bloom_hit",
        F.coalesce(F.col("exact"), F.lit(False)).alias("exact_dup"),
    )


def corpus_diff(
    old_docs: DataFrame, new_docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Snapshot delta between two corpus states — the audit an
    incremental pipeline ships next to every refresh: per doc_id
    present in EITHER snapshot, whether it was added, removed, changed
    (content fingerprint differs) or unchanged. Output:
    (doc_id, status, old_fp, new_fp); fp = md5_60(text), NULL on the
    absent side.

    Scale shape: fingerprints are map-side (the text column never
    shuffles); the full-outer join moves two slim (doc_id, fp)
    projections hash-partitioned on doc_id — and the exchange
    disappears entirely when both snapshots are stored bucketed on
    doc_id (pipeline.write_bucketed). No windows; no skew surface
    (doc_id is unique per side)."""
    old_fp = old_docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _md5_60_of(F.col(text_col)).alias("old_fp"),
    )
    new_fp = new_docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _md5_60_of(F.col(text_col)).alias("new_fp"),
    )
    j = old_fp.join(new_fp, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("doc_id", status.alias("status"), "old_fp", "new_fp")


def code_wrapped(df: DataFrame) -> DataFrame:
    """Code-block fixture through the REAL parser. Per doc: a fenced
    <pre><code class="language-python"> block keyed on the doc's first
    word; for doc_id % 3 == 0 a bare <pre> (no code child -> lang
    NULL). Decoy: an INLINE <code> in the paragraph — inline code is
    not a block and must never emit."""
    sid = F.col("doc_id").cast("string")
    w1 = F.expr("element_at(split(text, ' '), 1)")
    b0 = F.concat(
        F.lit('<pre><code class="language-python">def f_'),
        sid,
        F.lit("(): return "),
        w1,
        F.lit("</code></pre>"),
    )
    b1 = F.when(
        F.col("doc_id").cast("long") % 3 == 0,
        F.concat(F.lit("<pre>raw block "), sid, F.lit("</pre>")),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<div><p>intro "),
        F.col("text"),
        F.lit(" <code>inline decoy</code></p>"),
        b0,
        b1,
        F.lit("</div>"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def extract_code_df(nodes_df: DataFrame) -> DataFrame:
    """Code-block mining from the flat parsed DOM — the step that
    routes fenced code into a code-training subcorpus instead of the
    word-soup text path. A block is a <pre> element (document order);
    its language is the 'language-*' suffix of the FIRST direct-child
    <code>'s class attr (NULL when absent or unprefixed), its text the
    DIRECT child text of that code element — or of the pre itself when
    there is no code child (the direct-child-text contract shared with
    tables/anchors/title). Inline <code> outside <pre> never emits.
    Output: (doc_id, block_idx, lang, code_text).

    Scale shape: one map-side HOF pass per doc + a single posexplode of
    slim block rows (the plan's only Generate) — zero shuffles; the
    nodes array never leaves the projection."""
    from dompa_spark.constants import TEXT_NAME

    nodes = F.col("nodes")

    def direct_text(el):
        kids = F.filter(
            nodes,
            lambda n: (n["parent_id"] == el["node_id"])
            & (n["name"] == TEXT_NAME),
        )
        return F.array_join(F.transform(kids, lambda n: n["value"]), "")

    def code_child(pre):
        return F.get(
            F.filter(
                nodes,
                lambda n: (n["parent_id"] == pre["node_id"])
                & (n["name"] == "code"),
            ),
            0,
        )

    def lang_of(el):
        cls = F.get(
            F.filter(el["attrs"], lambda kv: kv["key"] == "class"), 0
        )["val"]
        return F.nullif(
            F.regexp_extract(cls, r"^language-(.+)$", 1), F.lit("")
        )

    per = F.transform(
        F.filter(nodes, lambda n: n["name"] == "pre"),
        lambda p: F.struct(
            F.when(code_child(p).isNotNull(), lang_of(code_child(p)))
            .otherwise(F.lit(None).cast("string"))
            .alias("lang"),
            F.when(code_child(p).isNotNull(), direct_text(code_child(p)))
            .otherwise(direct_text(p))
            .alias("code_text"),
        ),
    )
    ex = nodes_df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(per).alias("block_idx", "b"),
    )
    return ex.select(
        "doc_id",
        F.col("block_idx").cast("long").alias("block_idx"),
        F.col("b.lang").alias("lang"),
        F.col("b.code_text").alias("code_text"),
    )


def cluster_topics(
    emb_df: DataFrame,
    docs: DataFrame,
    *,
    dim: int | None = None,
    n_centroids: int = IVF_CENTROIDS,
    train_iters: int = IVF_TRAIN_ITERS,
    top_terms: int = 5,
    min_count: int = 2,
    df_max_ppm: int = 250_000,
    text_col: str = "text",
) -> DataFrame:
    """Topic audit of the corpus for data mixing: Lloyd-cluster the
    embedding space with the SAME deterministic training the IVF index
    and semdedup use (_ivf_cents — one clustering serves index, dedup
    AND the mixture audit; the DuckDB oracle replays identical
    iterations), then label each cluster with the top terms of its
    member documents. Stopwords are excluded by corpus document
    frequency (df > df_max_ppm parts-per-million of the corpus — exact
    integer cross-multiplication, no float ratio); term ranking is
    (count desc, term asc) — fully deterministic. Output: one row per
    (cluster, ranked term): (cid, n_docs, rank, term, term_count).

    Scale shape: training is the shared couple-of-tiny-jobs Lloyd;
    assignment collapses map-side (min-struct partial agg over the
    broadcast n_centroids-row crossJoin). Member tokens shuffle ONCE
    as slim (cid, term) rows into a partial-aggregated count; the
    top-k window partitions by cid — n_centroids partitions, each
    bounded by the cluster's post-filter vocabulary (min_count prunes
    the hapax tail before the window, df_max_ppm prunes the stopword
    head), which is the per-task sort bound at any corpus size. The
    corpus df pass is one more partial-agg shuffle of distinct-per-doc
    terms; the 1-row corpus total broadcasts (the corpus_mixture
    idiom). Cache lifecycle of the embedding projection is
    caller-owned (curate_corpus's contract)."""
    from pyspark.sql.window import Window

    emb = emb_df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).cache()
    cents = _ivf_cents(emb, 10, n_centroids, dim, train_iters)
    pairs = emb.crossJoin(F.broadcast(cents)).withColumn("d2", _ivf_d2())
    assigned = (
        pairs.groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cid"))
    )
    sizes = assigned.groupBy("cid").agg(F.count("*").alias("n_docs"))
    d = docs.select(
        F.col("doc_id").cast("long").alias("vec_id"),
        F.col(text_col).alias("_t"),
    )
    tc = (
        assigned.join(d, "vec_id")
        .select("cid", F.explode(F.split("_t", " ")).alias("term"))
        .groupBy("cid", "term")
        .agg(F.count("*").alias("term_count"))
        .filter(F.col("term_count") >= int(min_count))
    )
    dfreq = (
        docs.select(
            F.explode(F.array_distinct(F.split(text_col, " "))).alias(
                "term"
            )
        )
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    tot = docs.agg(F.count("*").alias("n_total"))
    kept = (
        tc.join(dfreq, "term")
        .crossJoin(F.broadcast(tot))
        .filter(
            F.col("df") * F.lit(1_000_000)
            <= F.lit(int(df_max_ppm)) * F.col("n_total")
        )
    )
    w = Window.partitionBy("cid").orderBy(
        F.desc("term_count"), F.asc("term")
    )
    return (
        kept.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(top_terms))
        .join(F.broadcast(sizes), "cid")
        .select(
            F.col("cid").cast("long").alias("cid"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("term_count").cast("long").alias("term_count"),
        )
    )


def distinct_sketch(
    docs: DataFrame,
    *,
    group_col: str = "source",
    k: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Distinct-cardinality telemetry without a distinct shuffle: per
    group, estimate the number of DISTINCT terms from k independent
    hash minima — the k-minimum-value idea specialized to plain MIN
    aggregates, reusing the minhash universal-hash family
    ((a_j*h + b_j) mod P over one md5_60 per term; a_j/b_j from
    _minhash_coef, so the dedup pipeline and the sketch share one hash
    family). Output: (group, n_tokens, est_distinct).

    Why it scales where COUNT(DISTINCT) doesn't: min over a multiset
    equals min over its set, so duplicate occurrences need no
    deduplication — every aggregate here is a partial-aggregatable MIN
    that combines map-side, and the shuffle carries k+1 longs per group
    per task instead of every distinct (group, term) pair. At 10^12
    docs a per-host distinct-vocabulary pass is a k-long combine; the
    exact form is a (host, term) distinct shuffle of the whole token
    stream.

    Estimator, in exact integer math (deterministic, DuckDB-replayable;
    the contract is determinism, the accuracy is the standard
    KMV ~1/sqrt(k) relative error, k=32 ~ 18%): with n distinct terms
    each min_j is ~ P/(n+1), so
      est_distinct = (k * P) div (sum_j min_j + k) - 1
    clamped at 0; +k in the denominator guards the empty group and
    biases small counts by < 1. NULL/empty text contributes its split
    tokens like every token pass here (oracle replays the same)."""
    h = (_md5_60_of(F.col("term")) % F.lit(MINHASH_P)).alias("h")
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(text_col, " ")).alias("term"),
    ).select("grp", h)
    aggs = [F.count("*").alias("n_tokens")]
    for j in range(int(k)):
        a, b = _minhash_coef("a", j), _minhash_coef("b", j)
        aggs.append(
            F.min(
                (F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)
            ).alias(f"m{j}")
        )
    g = toks.groupBy("grp").agg(*aggs)
    ssum = None
    for j in range(int(k)):
        c = F.col(f"m{j}")
        ssum = c if ssum is None else ssum + c
    # exact BIGINT division (Spark `div` == DuckDB `//` on positives)
    est = F.greatest(
        F.lit(0).cast("long"),
        F.expr(
            f"(CAST({int(k)} AS BIGINT) * {MINHASH_P}) div (ssum "
            f"+ {int(k)}) - 1"
        ),
    )
    return g.withColumn("ssum", ssum).select(
        F.col("grp").alias(group_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        est.cast("long").alias("est_distinct"),
    )


def heavy_hitters(
    docs: DataFrame,
    *,
    rate: int = 8,
    min_est: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Sampled frequency telemetry — the hot-key / viral-content
    detector: estimate per-term occurrence counts from a deterministic
    1/rate hash sample of token OCCURRENCES and report the terms whose
    estimate clears min_est. Output: (term, sampled_n, est_count),
    est_count = sampled_n * rate — unbiased because the sampling key is
    the occurrence's identity (doc_id, pos), independent of the term.

    Why it scales: the full count (vocab_topk's shape) shuffles every
    token occurrence; this shuffles the 1/rate sample — at 10^12 docs
    and rate 256 that is a ~0.4% shuffle for frequency estimates whose
    relative error on a K-occurrence term is ~1/sqrt(K/rate) (a 10^6-
    occurrence viral segment at rate 256: ~1.6%). The groupBy(term) is
    a partial agg, so even the sampled hot keys combine map-side —
    term skew never concentrates a task. Companion gauges:
    distinct_sketch (how many keys) vs heavy_hitters (which keys are
    hot); both reuse the engine-portable md5_60 so DuckDB replays the
    exact sample."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(F.split(text_col, " ")).alias("pos", "term"),
    )
    keep = (
        _md5_60_of(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("pos").cast("string"),
            )
        )
        % F.lit(int(rate))
        == 0
    )
    return (
        toks.filter(keep)
        .groupBy("term")
        .agg(F.count("*").alias("sampled_n"))
        .withColumn("est_count", F.col("sampled_n") * F.lit(int(rate)))
        .filter(F.col("est_count") >= int(min_est))
        .select("term", "sampled_n", F.col("est_count").cast("long").alias("est_count"))
    )


# ---------------------------------------------------------------------------
# Retrieval / corpus-statistics family (session 9)
# ---------------------------------------------------------------------------

BM25_QUERIES = 4
BM25_TERMS_PER_QUERY = 3
BM25_TOPK = 5
BM25_K1 = 1.2
BM25_B = 0.75
BM25_SCALE = 10_000  # fixed-point for order-independent score sums
BM25_SALTS = 8


def bm25_topk(
    docs: DataFrame,
    *,
    n_queries: int = BM25_QUERIES,
    terms_per_query: int = BM25_TERMS_PER_QUERY,
    topk: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
    n_salts: int = BM25_SALTS,
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval over the corpus — the 'serve search queries from
    the training corpus' operator (contamination triage, eval-set
    leakage lookup, nearest-document audits all reduce to it). Queries
    are derived deterministically from the corpus itself: the top
    n_queries*terms_per_query terms by collection frequency (count
    desc, term asc), chunked into consecutive rank groups of
    terms_per_query. Output: (query_id, rank, doc_id, score_fp) — one
    row per (query, top-k doc), score in BM25_SCALE fixed point.

    Scale shape: ONE full-corpus shuffle (the (doc, term) tf partial
    aggregate); doc length, document frequency, collection stats and
    the query-term table all DERIVE from tf (dl = sum(tf) per doc,
    df_w = count per term — AQE reuses the tf exchange), so the token
    stream is hashed once. The query-term table is top-Q tiny and
    BROADCAST into tf, pruning the postings to query terms before any
    further shuffle — at 10^12 docs the candidate set is the posting
    lists of Q*T terms, never the corpus. Ranking is the salted
    two-phase exact top-k (domain_cap's argument): phase 1 keeps
    <= topk per (query, salt) so a stop-word query term cannot
    concentrate one task; phase 2 re-ranks <= topk*n_salts survivors.

    Engine parity: idf and the length-normalized tf factor are per-row
    doubles (structurally identical expression in the DuckDB oracle),
    snapped to BM25_SCALE fixed point per (doc, term) — F.round is
    HALF_UP on positives, matching DuckDB — and summed across query
    terms as exact BIGINTs, so no float ever depends on aggregation
    order. Docs with NULL text have no tokens and are not candidates;
    ties break (score_fp desc, doc_id asc)."""
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(text_col, " ")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    # dl / dfreq / stats all genuinely reference tf (sum(tf)), so the
    # three consumers share the tf exchange instead of re-exploding
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") >= 1, 1)).cast("long").alias("df_w"),
        F.sum("tf").cast("long").alias("cf"),
    )
    stats = dl.agg(
        F.count(F.when(F.col("dl") >= 1, 1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("n_tokens"),
    )
    n_qterms = int(n_queries) * int(terms_per_query)
    qterms = (
        dfreq.orderBy(F.desc("cf"), F.asc("term"))
        .limit(n_qterms)
        .select(
            "term",
            "df_w",
            F.row_number()
            .over(Window.orderBy(F.desc("cf"), F.asc("term")))
            .alias("qrank"),
        )
        .withColumn(
            "query_id",
            ((F.col("qrank") - 1) / int(terms_per_query))
            .cast("long"),
        )
        .drop("qrank")
    )
    cand = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
    )
    return _bm25_rank(cand, k1=k1, b=b, topk=topk, n_salts=n_salts)


def _bm25_rank(
    cand: DataFrame, *, k1: float, b: float, topk: int, n_salts: int
) -> DataFrame:
    """Shared BM25 scoring + exact salted two-phase top-k over a
    candidate table carrying (query_id, doc_id, tf, df_w, dl, n_docs,
    n_tokens) — the tail of bm25_topk, also reached from a persisted
    index via bm25_search."""
    from pyspark.sql.window import Window
    avgdl = F.col("n_tokens").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_w") + F.lit(0.5))
        / (F.col("df_w") + F.lit(0.5))
    )
    tfn = (F.col("tf") * F.lit(float(k1) + 1.0)) / (
        F.col("tf")
        + F.lit(float(k1))
        * (
            F.lit(1.0 - float(b))
            + F.lit(float(b)) * F.col("dl") / avgdl
        )
    )
    s_fp = F.round(idf * tfn * F.lit(BM25_SCALE)).cast("long")
    scores = (
        cand.withColumn("s_fp", s_fp)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s_fp").cast("long").alias("score_fp"))
    )
    # exact salted two-phase top-k (domain_cap's composition argument:
    # every globally-top-k row is top-k within its salt bucket)
    salted = scores.withColumn(
        "salt",
        (_md5_60_of(F.col("doc_id").cast("string")) % int(n_salts)).cast(
            "int"
        ),
    )
    w1 = Window.partitionBy("query_id", "salt").orderBy(
        F.desc("score_fp"), F.asc("doc_id")
    )
    survivors = (
        salted.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= int(topk))
        .drop("r1", "salt")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("score_fp"), F.asc("doc_id")
    )
    return (
        survivors.withColumn(
            "rank", F.row_number().over(w2).cast("long")
        )
        .filter(F.col("rank") <= int(topk))
        .select("query_id", "rank", "doc_id", "score_fp")
    )


def bm25_index(
    docs: DataFrame, *, text_col: str = "text"
) -> tuple:
    """The persistable text-search index: (postings, dictionary,
    docstats) — plain parquet-writable tables that ARE the interface
    (the build_ann_index layout philosophy; any engine can read them).
      postings   (term, doc_id, tf)   the big table — write it
                 repartitioned + sorted on term so query-time term
                 predicates prune row groups at the scan
      dictionary (term, df_w, cf)     per-term document/collection freq
      docstats   (doc_id, dl)         per-doc token length
    All three derive from ONE (doc, term) tf partial aggregate (the
    bm25_topk stage-sharing argument); building the index costs one
    full-corpus shuffle, after which every search touches only the
    queried terms' posting lists."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(text_col, " ")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") >= 1, 1)).cast("long").alias("df_w"),
        F.sum("tf").cast("long").alias("cf"),
    )
    return tf.select("term", "doc_id", "tf"), dfreq, dl


def bm25_search(
    qterms: DataFrame,
    postings: DataFrame,
    dictionary: DataFrame,
    docstats: DataFrame,
    *,
    stats: DataFrame | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
    n_salts: int = BM25_SALTS,
) -> DataFrame:
    """BM25 top-k from a (persisted) index — the query half of the
    train-once/search-many split: qterms is a tiny (query_id, term)
    table; no tokenization, no corpus shuffle. Scale shape: qterms
    broadcasts into the dictionary (slim equi-join) and the result
    broadcasts into postings, so the candidate set is the queried
    terms' posting lists only; collection stats arrive as a broadcast
    1-row aggregate (or precomputed from the index params). Scoring
    and the exact salted two-phase top-k are bm25_topk's own
    (_bm25_rank) — identical fixed-point results from a live corpus or
    a persisted index."""
    if stats is None:
        stats = docstats.agg(
            F.count(F.when(F.col("dl") >= 1, 1))
            .cast("long")
            .alias("n_docs"),
            F.sum("dl").cast("long").alias("n_tokens"),
        )
    qd = dictionary.join(
        F.broadcast(qterms.select("query_id", "term")), "term"
    ).select("term", "query_id", "df_w")
    cand = (
        postings.join(F.broadcast(qd), "term")
        .join(docstats, "doc_id")
        .join(F.broadcast(stats))
    )
    return _bm25_rank(cand, k1=k1, b=b, topk=topk, n_salts=n_salts)


PMI_MIN_COUNT = 5
PMI_TOPK = 32


def pmi_topk(
    docs: DataFrame,
    *,
    min_count: int = PMI_MIN_COUNT,
    k: int = PMI_TOPK,
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining: the k adjacent-word bigrams with the highest
    pointwise mutual information, pmi = ln(p(ab) / (p(a) p(b))) with
    p(ab) over the bigram stream and p(a) over the unigram stream —
    the phrase/named-entity discovery pass a tokenizer-training or
    vocab-curation pipeline runs over the corpus. Output: (bigram,
    c_ab, c1, c2, pmi), ties (pmi desc, bigram asc).

    Scale shape: bigrams are built MAP-SIDE per document (the
    shingles3 idiom at width 2, duplicates kept — counts need the
    multiset), so the only shuffles are two partial-aggregating
    groupBys (bigram counts, unigram counts), both combining map-side;
    corpus totals arrive as broadcast single-row aggregates. The
    min_count floor prunes the bigram table BEFORE the unigram joins,
    so the join input is the frequent-bigram set, not the hapax tail —
    at 10^12 docs that is the difference between joining ~10^6 rows
    and ~10^11. Final top-k is TakeOrderedAndProject (per-partition
    top-k, then a k-row merge on the driver — no global sort).

    Engine parity: pmi is a per-row double on exact BIGINT counts,
    structurally identical in the oracle, rounded to 4 decimals; no
    float aggregation anywhere."""
    # arrays_zip of shifted slices, not transform+slice lambdas: the
    # lambda form evaluates interpreted per element and measured 6x
    # slower at identical output (the lm2 builder lesson); zero-length
    # slices make short/NULL docs total with no when() guards
    w = words(text_col)
    len1 = F.greatest(F.size(w) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(w, 1, len1).alias("a"), F.slice(w, 2, len1).alias("b")
    )
    cb = (
        docs.select(F.explode(pairs).alias("t"))
        .select(
            F.concat_ws(" ", F.col("t.a"), F.col("t.b")).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("c_ab"))
    )
    n_bi = cb.agg(F.sum("c_ab").cast("long").alias("n_bi"))
    uni = (
        docs.select(F.explode(words(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    n_uni = uni.agg(F.sum("c").cast("long").alias("n_uni"))
    freq = cb.filter(F.col("c_ab") >= int(min_count)).select(
        "bigram",
        "c_ab",
        F.split("bigram", " ").getItem(0).alias("w1"),
        F.split("bigram", " ").getItem(1).alias("w2"),
    )
    joined = (
        freq.join(
            uni.select(
                F.col("term").alias("w1"), F.col("c").alias("c1")
            ),
            "w1",
        )
        .join(
            uni.select(
                F.col("term").alias("w2"), F.col("c").alias("c2")
            ),
            "w2",
        )
        .join(F.broadcast(n_bi))
        .join(F.broadcast(n_uni))
    )
    pmi = F.round(
        F.log(
            (F.col("c_ab").cast("double") * F.col("n_uni") * F.col("n_uni"))
            / (F.col("n_bi").cast("double") * F.col("c1") * F.col("c2"))
        ),
        4,
    )
    return (
        joined.select("bigram", "c_ab", "c1", "c2", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(int(k))
    )


QUANTILE_BIN_WIDTH = 64
QUANTILE_BPS = (2500, 5000, 7500, 9000, 9900)


def length_quantiles(
    docs: DataFrame,
    *,
    bin_width: int = QUANTILE_BIN_WIDTH,
    quantiles_bp: tuple = QUANTILE_BPS,
    len_col: str = "n_chars",
) -> DataFrame:
    """Distributed quantile estimates of the document-length
    distribution via a fixed-width histogram — the sizing telemetry a
    pipeline reads before choosing chunk lengths, skew salts and
    shuffle partition counts. Output: one row per requested quantile
    (p_bp in basis points): (p_bp, target_rank, bin, est_max_chars)
    where est_max_chars = (bin+1)*bin_width is the bin's exclusive
    upper bound — the estimate is exact to within bin_width.

    Scale shape: ONE partial-aggregating groupBy(bin) whose
    cardinality is bounded by the VALUE RANGE (max_chars / bin_width),
    not the corpus size — at 10^12 docs the shuffle still carries a
    few thousand (bin, count) rows per task. The cumulative sum runs
    in an unpartitioned window over that bounded bin table (documented
    single-task stage over ~10^3 rows, the same contract as the
    convergence counts in dedup_clusters); quantile extraction is a
    tiny cross join of the bin table with the literal quantile list.
    Exact integer math throughout: target_rank =
    (p_bp * n + 9999) div 10000, bin = min bin with cum >= rank —
    DuckDB replays every step bit-identically."""
    from pyspark.sql.window import Window

    bw = int(bin_width)
    bins = (
        docs.select(
            (
                F.coalesce(F.col(len_col).cast("long"), F.lit(0))
                / F.lit(bw)
            )
            .cast("long")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("c"))
    )
    cum = bins.withColumn(
        "cum",
        F.sum("c")
        .over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("long"),
    )
    n = bins.agg(F.sum("c").cast("long").alias("n"))
    spark = docs.sparkSession
    q = spark.createDataFrame(
        [(int(p),) for p in quantiles_bp], "p_bp long"
    )
    target = F.expr("(p_bp * n + 9999) div 10000")
    hits = (
        cum.join(F.broadcast(n))
        .join(F.broadcast(q))
        .withColumn("target_rank", target)
        .filter(F.col("cum") >= F.col("target_rank"))
    )
    return (
        hits.groupBy("p_bp", "target_rank")
        .agg(F.min("bin").cast("long").alias("bin"))
        .select(
            "p_bp",
            "target_rank",
            "bin",
            ((F.col("bin") + 1) * bw).cast("long").alias("est_max_chars"),
        )
    )


# natural log of 2 as a shared literal: both engines use the same
# 64-bit constant instead of each calling their own libm ln(2)
LN2 = 0.6931471805599453
CHAR_ENTROPY_MIN = 0.2
CHAR_ENTROPY_MAX = 1.9


def char_entropy_scores(
    docs: DataFrame,
    *,
    h_min: float = CHAR_ENTROPY_MIN,
    h_max: float = CHAR_ENTROPY_MAX,
    text_col: str = "text",
) -> DataFrame:
    """Character-class entropy quality gate: per document, the Shannon
    entropy (bits) of the {letter, digit, space, other} character-class
    distribution — a zero-shuffle mojibake/binary-spill detector that
    complements the word-level gates (quality_scores sees tokens;
    this sees the raw byte texture). Degenerate texts score near 0
    (one class dominates: all-letters runs, digit dumps); random
    binary spills score near the 2-bit class maximum; natural text
    sits in a narrow band. Output: one row per doc (doc_id, n_chars,
    h_bits, char_ok), char_ok = n_chars > 0 AND h_min <= h <= h_max.
    NULL text reports n_chars=0 / h_bits=0.0 / char_ok=false (the
    repetition_scores one-row-per-doc contract).

    Scale shape: pure map-side Catalyst expressions — four
    regexp_replace length-differences per row, no explode, no shuffle,
    no Python. Engine parity: each class term
    (c/n) * ln(n/c) is a per-row double with the structurally
    identical expression in the oracle, summed in fixed written order
    (4 terms — no aggregation), divided by the shared LN2 literal so
    neither engine calls its own ln(2), then rounded to 4 decimals."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    letters = n - F.length(F.regexp_replace(t, "[A-Za-z]", ""))
    digits = n - F.length(F.regexp_replace(t, "[0-9]", ""))
    spaces = n - F.length(F.regexp_replace(t, "[ \\t\\n\\r]", ""))
    other = n - letters - digits - spaces

    def term(c):
        return F.when(
            c > 0,
            (c.cast("double") / n) * F.log(n.cast("double") / c),
        ).otherwise(F.lit(0.0))

    h = F.when(
        n > 0,
        F.round(
            (term(letters) + term(digits) + term(spaces) + term(other))
            / F.lit(LN2),
            4,
        ),
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.cast("long").alias("n_chars"),
        h.alias("h_bits"),
        (
            (n > 0)
            & (h >= F.lit(float(h_min)))
            & (h <= F.lit(float(h_max)))
        ).alias("char_ok"),
    )


WINNOW_K = 4  # k-gram width (words)
WINNOW_W = 5  # winnowing window (consecutive k-gram hashes)


def winnow_fingerprints(
    docs: DataFrame,
    *,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): hash every
    k-word gram, slide a w-hash window, and keep the RIGHTMOST minimum
    of each window — the selected (position, hash) set is the doc's
    fingerprint. Guarantee: any two docs sharing a run of at least
    w+k-1 words share at least one selected hash, so span-level
    plagiarism/quotation is detectable from a set ~1/w the size of the
    full k-gram set (where minhash answers 'how similar are these
    docs', winnowing answers 'which spans did they copy'). Output:
    one row per selected fingerprint (doc_id, pos, fp), pos = 1-based
    k-gram start, fp = the house 60-bit md5 hash.

    Scale shape: ENTIRELY map-side — an Arrow-batched per-doc kernel
    (the repetition_scores idiom), no explode, no shuffle. The kernel
    is a MEASURED choice, not a style default: the pure-expression
    form (nested transform/filter/slice HOFs) was built first, passed
    the same oracle, and ran at ~0.19 s/doc — nested array lambdas
    fall out of whole-stage codegen into interpreted evaluation with a
    per-element allocation, three orders of magnitude off the ~60
    us/doc the Python loop does with C-level md5 + list ops. Per-doc
    cost is O(m*w) on m = n-k+1 grams; downstream pairing joins on fp
    are equi-joins on a column whose per-doc cardinality is ~m/w —
    self-limiting fanout. Docs shorter than w+k-1 words (and NULL
    text) emit no rows — they have no complete window; the oracle
    replays the same contract.

    Tie policy: rightmost minimum, the standard winnowing choice — it
    maximizes overlap of selections between adjacent windows,
    minimizing the fingerprint count; 60-bit hashes make in-window
    ties vanishingly rare anyway. Engine parity: pure integer hashing
    (md5 hex prefix, the md5_60 discipline in Python) and integer
    argmin — no floats anywhere; the DuckDB oracle replays the exact
    list pipeline."""
    import pandas as pd

    kk, ww = int(k), int(w)

    def gen(batches):
        import hashlib

        for pdf in batches:
            ids, poss, fps = [], [], []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                if t is None:
                    continue
                ws = t.split(" ")
                n = len(ws)
                if n < kk + ww - 1:
                    continue
                m = n - kk + 1
                hs = [
                    int(
                        hashlib.md5(
                            " ".join(ws[i:i + kk]).encode()
                        ).hexdigest()[:15],
                        16,
                    )
                    for i in range(m)
                ]
                sel = set()
                for j in range(m - ww + 1):
                    win = hs[j:j + ww]
                    mn = min(win)
                    sel.add(j + (ww - 1 - win[::-1].index(mn)))
                did = int(did)
                for p in sel:
                    ids.append(did)
                    poss.append(p + 1)  # 1-based, matching the oracle
                    fps.append(hs[p])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "pos": pd.Series(poss, dtype="int64"),
                    "fp": pd.Series(fps, dtype="int64"),
                }
            )

    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(gen, "doc_id long, pos long, fp long")


WINNOW_CONTAM_EVERY = 97
WINNOW_CONTAM_MIN = 1


def winnow_contamination(
    docs: DataFrame,
    bench: DataFrame | None = None,
    *,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = WINNOW_CONTAM_MIN,
) -> DataFrame:
    """Span-level benchmark-contamination check over winnowing
    fingerprints: flag documents sharing >= min_shared selected
    fingerprints with the benchmark set. Where contamination_flags
    joins every 3-shingle, this joins the winnowed ~1/w selection with
    the winnowing guarantee attached: any doc quoting >= w+k-1
    contiguous benchmark words IS flagged — same detection floor,
    ~1/w the join volume, which at 10^12 docs is the difference
    between shuffling the shingle stream and shuffling a sample with a
    coverage proof. The benchmark side defaults to every
    WINNOW_CONTAM_EVERY-th doc (deterministic, oracle-rebuildable);
    production passes the real eval-set table.

    Output: one row per doc that HAS fingerprints (>= w+k-1 words):
    (doc_id, n_fps, n_hits, contaminated); n_hits counts fingerprint
    occurrences (same fp at two positions counts twice). Benchmark
    docs drawn from the corpus flag themselves — the built-in sanity
    signal, mirroring contamination_flags.

    Scale shape: fingerprinting is winnow_fingerprints' zero-shuffle
    map-side pass, run ONCE — the bench-fp table broadcasts with a
    hit marker and a LEFT join + single partial-agg groupBy produces
    both the density (n_fps) and the hit count, so the corpus side
    shuffles one slim row per doc."""
    if bench is None:
        bench = docs.filter(
            F.col("doc_id") % WINNOW_CONTAM_EVERY == 0
        )
    corpus_fp = winnow_fingerprints(docs, k=k, w=w)
    bench_fp = (
        winnow_fingerprints(bench, k=k, w=w)
        .select("fp")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    flagged = corpus_fp.join(F.broadcast(bench_fp), "fp", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_fps"),
            F.count("hit").cast("long").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_fps",
            "n_hits",
            (F.col("n_hits") >= int(min_shared)).alias("contaminated"),
        )
    )


LM2_BIGRAM_K = 4096
LM2_PENALTY_BITS = 1  # stupid-backoff cost, kept integer (1 bit ~ x0.5)
LM2_SURPRISAL_MAX = 13.0


def lm2_surprisal_scores(
    df: DataFrame,
    vocab_k: int = LM_VOCAB_K,
    bigram_k: int = LM2_BIGRAM_K,
    penalty_bits: int = LM2_PENALTY_BITS,
    surprisal_max: float = LM2_SURPRISAL_MAX,
) -> DataFrame:
    """Bigram-LM quality gate with stupid backoff — the next rung
    above lm_surprisal_scores' unigram model: each token is scored by
    its CONDITIONAL surprisal under the corpus's own top-bigram_k
    bigram LM (p(w|prev) = c(prev,w)/c(prev)), backing off to the
    unigram bucket + penalty_bits when the transition (or its history
    word) is outside the LM. Coherent word ORDER now matters: shuffled
    text that sails through a unigram gate fails here, because its
    transitions never hit the bigram table. One row per doc: (doc_id,
    n_tokens, oov_ratio, bigram_hit_ratio, mean_surprisal, lm2_ok);
    bigram_hit_ratio is the fraction of tokens scored by the bigram
    path — the gauge that shows WHY a doc failed (low hits = scrambled
    order; high hits + high surprisal = rare-but-real content).

    ENGINE-EXACT math (the lm_surprisal discipline): surprisal is the
    integer bit bucket floor(log2(a div b)) = length(bin(a div b)) - 1
    in exact BIGINT arithmetic — conditional buckets use
    c(prev) div c(prev,w) (>= 1 always, since c(prev,w) <= c(prev)),
    backoff uses N div c_eff(w) plus penalty_bits; only the final mean
    is a single sum/count double division.

    Scale shape: LM training is two explode -> partial-agg passes
    (unigram counts, bigram counts) with distributed top-k
    (TakeOrderedAndProject) heads; BOTH LM tables broadcast, bounded
    by vocab_k/bigram_k at any corpus size, and N rides the 1-row
    broadcast aggregate. Scoring is ONE map-side pass building
    (pos, word, prev) structs per doc — no self-join of the token
    stream on (doc_id, pos-1), which would shuffle the corpus twice —
    followed by broadcast-left joins and a per-doc partial aggregate.
    Null-text docs report n_tokens=0 and fail (one row per doc)."""
    docs = df.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    tok = docs.select("doc_id", F.explode(words()).alias("word"))
    counts = tok.groupBy("word").agg(
        F.count("*").cast("long").alias("c")
    ).cache()
    uni_lm = counts.orderBy(F.desc("c"), F.asc("word")).limit(int(vocab_k))
    n_tot = counts.agg(F.sum("c").cast("long").alias("n_total"))

    # arrays_zip of shifted SLICES, not transform-with-struct-lambda:
    # nested lambdas evaluate interpreted per element (~10 us/token
    # measured — the winnow lesson in expression form); the zip form
    # is one built-in per row and measured 10x faster. Zero-length
    # slices make every case total: n=1 docs yield no bigrams, NULL
    # text propagates to a NULL zip that explode drops.
    s = words()
    n_s = F.size(s)
    len1 = F.greatest(n_s - 1, F.lit(0))
    bi_pairs = F.arrays_zip(
        F.slice(s, 1, len1).alias("w1"), F.slice(s, 2, len1).alias("w2")
    )
    bi_lm = (
        docs.select(F.explode(bi_pairs).alias("bg"))
        .groupBy("bg.w1", "bg.w2")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .orderBy(F.desc("c_ab"), F.asc("w1"), F.asc("w2"))
        .limit(int(bigram_k))
    )

    # one map-side pass: (word, prev-or-null) pairs per doc — wprev of
    # the first token is the NULL the leading shifted slot provides
    shifted = F.concat(
        F.array(F.lit(None).cast("string")), F.slice(s, 1, len1)
    )
    trans = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(shifted.alias("wprev"), s.alias("w"))
        ).alias("t"),
    ).select("doc_id", "t.w", "t.wprev")

    scored = (
        trans.join(
            F.broadcast(uni_lm.select(F.col("word").alias("w"), "c")),
            "w",
            "left",
        )
        .join(
            F.broadcast(
                uni_lm.select(
                    F.col("word").alias("wprev"),
                    F.col("c").alias("c_prev"),
                )
            ),
            "wprev",
            "left",
        )
        .join(
            F.broadcast(
                bi_lm.select(
                    F.col("w1").alias("wprev"),
                    F.col("w2").alias("w"),
                    "c_ab",
                )
            ),
            ["wprev", "w"],
            "left",
        )
        .join(F.broadcast(n_tot))
        .withColumn("c_eff", F.coalesce("c", F.lit(1)).cast("long"))
    )
    bits_cond = (
        F.length(F.bin(F.expr("c_prev div c_ab"))) - 1
    ).cast("long")
    bits_back = (
        F.length(F.bin(F.expr("n_total div c_eff"))) - 1
    ).cast("long")
    bigram_hit = (
        F.col("wprev").isNotNull()
        & F.col("c_ab").isNotNull()
        & F.col("c_prev").isNotNull()
    )
    surp = (
        F.when(bigram_hit, bits_cond)
        .when(F.col("wprev").isNull(), bits_back)
        .otherwise(bits_back + F.lit(int(penalty_bits)))
    )
    agg = (
        scored.withColumn("surp", surp)
        .withColumn("hit", F.when(bigram_hit, 1).otherwise(0))
        .withColumn("oov", F.when(F.col("c").isNull(), 1).otherwise(0))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("oov").cast("long").alias("oov_n"),
            F.sum("hit").cast("long").alias("hit_n"),
            F.round(F.avg("surp"), 4).alias("mean_surprisal"),
        )
    )
    out = docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(
            F.round(F.col("oov_n") / F.col("n_tokens"), 4), F.lit(0.0)
        ).alias("oov_ratio"),
        F.coalesce(
            F.round(F.col("hit_n") / F.col("n_tokens"), 4), F.lit(0.0)
        ).alias("bigram_hit_ratio"),
        F.coalesce("mean_surprisal", F.lit(0.0)).alias("mean_surprisal"),
    )
    return out.withColumn(
        "lm2_ok",
        (F.col("n_tokens") > 0)
        & (F.col("mean_surprisal") <= F.lit(float(surprisal_max))),
    )


def tokenizer_fertility(df: DataFrame, merges=None) -> DataFrame:
    """Per-language tokenizer fertility — BPE tokens per whitespace
    word under the frozen merge table — the gauge a data-mixing
    pipeline reads next to corpus_mixture: token budgets are paid in
    TOKENIZER tokens, and fertility differs per language, so mixing by
    word share silently misbudgets high-fertility languages. Output:
    (lang, n_docs, n_words, n_bpe_tokens, fertility), fertility =
    round(bpe/words, 4), one row per observed lang (NULL lang groups
    like any GROUP BY; zero-word langs report 0.0).

    Scale shape: tokenize_bpe's zero-shuffle map-side encode, joined
    slim (doc_id -> lang) and collapsed by ONE partial-aggregating
    groupBy(lang) — the shuffle carries one row per lang per task."""
    tk = tokenize_bpe(df, merges)
    langs = df.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )
    return (
        langs.join(tk, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
        .withColumn(
            "fertility",
            F.when(
                F.col("n_words") > 0,
                F.round(F.col("n_bpe_tokens") / F.col("n_words"), 4),
            ).otherwise(F.lit(0.0)),
        )
    )


# ---------------------------------------------------------------------------
# Unicode-script profile (CCNet-style pre-langid script detection)
# ---------------------------------------------------------------------------

# BMP-literal character ranges — literal ranges (not \p{Script=...}
# classes) because Java regex and DuckDB's RE2 agree on literal ranges
# unconditionally, while named script properties differ by engine
# version/table. BMP-only so DuckDB's codepoint len() and the JVM's
# UTF-16 length() count identically. LETTERS ONLY by construction
# (review catch): latin-1's × U+00D7 / ÷ U+00F7, cyrillic combining
# marks U+0483-0489, and arabic digits/diacritics/punctuation are
# excluded — a dimensions table full of '×' must not read as scripted
# text, and Arabic-Indic digits must not drag a latin doc's dominant
# share below the gate.
SCRIPT_CLASSES = [
    # (name, regex char class); declaration order is the tie-break
    ("latin", "[A-Za-zÀ-ÖØ-öø-ɏ]"),
    ("cyrillic", "[Ѐ-҂Ҋ-ӿ]"),
    ("cjk", "[一-鿿぀-ヿ가-힯]"),
    ("arabic", "[ؠ-يٮ-ٯٱ-ۓەۮ-ۯۺ-ۼۿ]"),
]
SCRIPT_MAIN_MIN_PPM = 900_000  # main script must own >= 90% of letters


def script_profile(
    docs: DataFrame,
    *,
    main_min_ppm: int = SCRIPT_MAIN_MIN_PPM,
    text_col: str = "text",
) -> DataFrame:
    """Unicode-script detection — the step a CCNet-style pipeline runs
    BEFORE n-gram language-ID: lang_id's trigram tables assume the
    right script family, and mixed-script text (spam keyword stuffing,
    mojibake, bidi-spoofed URLs) is a reject signal of its own that
    word-level gates never see. Per document: letter counts for the
    four major script families (latin incl. latin-1/extended,
    cyrillic, CJK incl. kana + hangul, arabic), each as an exact
    parts-per-million share of SCRIPTED letters (integer div — no
    doubles anywhere in the row, so the value hash is engine-exact by
    construction), the dominant script with a fixed priority-order
    tie-break (SCRIPT_CLASSES declaration order — deterministic,
    engine-independent), and script_ok = the dominant script owns >=
    main_min_ppm of the scripted letters (the mixed-script gate).
    Docs with no scripted letters (or NULL text): main_script='none',
    all ppm 0, script_ok=false — one row per doc always (the
    repetition_scores contract).

    Scale shape: pure map-side Catalyst expressions — one
    regexp_replace length-difference per script class, no explode, no
    shuffle, no Python; whole-stage codegen end to end. At 10^12 docs
    this is a scan-bound pass like char_entropy_scores, and the two
    gates share their scan when composed in one select."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    counts = [
        (name, (n - F.length(F.regexp_replace(t, pat, ""))).cast("long"))
        for name, pat in SCRIPT_CLASSES
    ]
    n_letters = counts[0][1]
    for _, c in counts[1:]:
        n_letters = n_letters + c

    # stage 1: materialize the counts as real columns so stage 2 can use
    # SQL `div` (exact integer floor — a double `/` + cast would admit a
    # one-ulp truncation flap on exact ratios) and the dominant-script
    # when-chain references each count once.
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.cast("long").alias("n_chars"),
        n_letters.alias("n_scripted"),
        *[c.alias(f"c_{name}") for name, c in counts],
    )

    # dominant script: strict-greater scan in declaration order ==
    # priority-order tie-break (earlier class wins ties).
    main_cnt = F.col(f"c_{SCRIPT_CLASSES[0][0]}")
    main_name = F.when(
        main_cnt > 0, F.lit(SCRIPT_CLASSES[0][0])
    ).otherwise(F.lit("none"))
    for name, _ in SCRIPT_CLASSES[1:]:
        c = F.col(f"c_{name}")
        main_name = F.when(c > main_cnt, F.lit(name)).otherwise(main_name)
        main_cnt = F.greatest(c, main_cnt)

    ppm_cols = [
        F.expr(
            f"(c_{name} * 1000000) div greatest(n_scripted, 1)"
        ).alias(f"{name}_ppm")
        for name, _ in SCRIPT_CLASSES
    ]
    main_ppm_ok = (
        main_cnt * F.lit(1_000_000).cast("long")
        >= F.lit(int(main_min_ppm)) * F.greatest(
            F.col("n_scripted"), F.lit(1).cast("long")
        )
    )
    return staged.select(
        "doc_id",
        "n_chars",
        "n_scripted",
        *ppm_cols,
        main_name.alias("main_script"),
        ((F.col("n_scripted") > 0) & main_ppm_ok).alias("script_ok"),
    )


# ---------------------------------------------------------------------------
# DOM skeleton fingerprints + host template detection
# ---------------------------------------------------------------------------

TEMPLATE_FRAC_MIN_PPM = 150_000  # a template owns >= 15% of a host's docs
TEMPLATE_MIN_DOCS = 2


def template_wrapped(df: DataFrame) -> DataFrame:
    """Template fixture through the REAL parser: four page layouts with
    deliberately skewed frequencies (60/25/10/5 via doc_id % 20),
    hosted on 23 synthetic hosts. Within a layout the text payload and
    attribute VALUES vary per doc while the tag sequence stays constant
    — exactly the invariance dom_skeleton must exhibit."""
    sid = F.col("doc_id").cast("string")
    v = F.col("doc_id").cast("long") % 20
    w1 = F.expr("element_at(split(text, ' '), 1)")
    t = F.col("text")
    html = (
        F.when(
            v < 12,
            F.concat(
                F.lit('<div class="page p'), sid, F.lit('"><h1>T'), sid,
                F.lit("</h1><p>"), t, F.lit("</p></div>"),
            ),
        )
        .when(
            v < 17,
            F.concat(
                F.lit("<article><p>"), t, F.lit('</p><img src="x'), sid,
                F.lit('.png"><p>fin</p></article>'),
            ),
        )
        .when(
            v < 19,
            F.concat(
                F.lit("<ul><li>"), w1, F.lit("</li><li>"), t,
                F.lit("</li></ul>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('<table><tr><td id="c'), sid, F.lit('">'), t,
                F.lit("</td></tr></table><hr>"),
            )
        )
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def dom_skeleton(nodes_df: DataFrame) -> DataFrame:
    """Per-document DOM structure fingerprint: md5_60 over the
    document-order tag-name sequence of the parsed flat DOM, text and
    attribute CONTENT excluded — two pages built from the same layout
    hash identically however their copy differs. This is the signal
    behind site-template detection (host chrome repeats structure, not
    text, so segment-level dedup misses it when the chrome re-words).
    Output: (doc_id, skeleton, n_tags).

    Scale shape: the filtered element array binds at a projection
    boundary (the HOF-materialization house rule — it is referenced by
    both the join and the size), then one transform + array_join + md5
    per row; zero shuffles, zero explodes, no Python beyond the shared
    parse kernel. doc_id passes through UNTOUCHED (string ids welcome —
    the dedup_near_stream id_mode lesson: a forced long cast poisons
    'doc-…' corpora under ANSI)."""
    from dompa_spark.constants import TEXT_NAME

    staged = nodes_df.select(
        F.col("doc_id"),
        F.filter(
            F.col("nodes"), lambda n: n["name"] != TEXT_NAME
        ).alias("elems"),
    )
    seq = F.array_join(
        F.transform(F.col("elems"), lambda n: n["name"]), ">"
    )
    return staged.select(
        "doc_id",
        _md5_60_of(seq).alias("skeleton"),
        F.size("elems").cast("long").alias("n_tags"),
    )


def template_detect(
    nodes_df: DataFrame,
    hosts: DataFrame,
    *,
    frac_min_ppm: int = TEMPLATE_FRAC_MIN_PPM,
    min_docs: int = TEMPLATE_MIN_DOCS,
) -> DataFrame:
    """Host template detection over DOM-skeleton fingerprints: a
    (host, skeleton) group is a template iff it owns >= frac_min_ppm of
    the host's docs (exact cross-multiplied ppm — no doubles) and at
    least min_docs docs. The per-host complement of host_boilerplate:
    that operator votes on repeated text SEGMENTS; this one votes on
    repeated page STRUCTURE, which survives re-worded chrome. Input:
    parsed nodes + a slim (doc_id, host) map. Output one row per
    (host, skeleton): n_docs, n_tags, host_docs, is_template.

    Scale shape: skeleton is map-side; ONE partial-aggregatable
    groupBy(host, skeleton) collapses the corpus to the template table
    (bounded by layouts x hosts, not docs); host totals re-aggregate
    THAT table (partial agg of an already-tiny input) and join back on
    host — the corpus is never shuffled twice and no window ever sees
    a doc row. A mega-host costs its tasks' map-side combines."""
    sk = dom_skeleton(nodes_df)
    per = (
        sk.join(hosts, "doc_id")
        .groupBy("host", "skeleton")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("n_tags").cast("long").alias("n_tags"),
        )
    )
    totals = per.groupBy("host").agg(
        F.sum("n_docs").cast("long").alias("host_docs")
    )
    return per.join(totals, "host").select(
        "host",
        "skeleton",
        "n_docs",
        "n_tags",
        "host_docs",
        (
            (F.col("n_docs") >= F.lit(int(min_docs)))
            & (
                F.col("n_docs") * F.lit(1_000_000).cast("long")
                >= F.lit(int(frac_min_ppm)) * F.col("host_docs")
            )
        ).alias("is_template"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (bounded-memory frequency estimates)
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows (reuses MINHASH_A/B[0..3])
CMS_W = 512  # buckets per row
CMS_TOPK = 20


def _cms_buckets(d: int, w: int):
    """The d (row, bucket) pairs for a pre-hashed `hv` column — ONE
    definition of the universal-hash bucket math shared by the sketch
    builder and the point-query probe (the two must stay bit-identical
    or point queries against persisted sketches silently break)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).cast("int").alias("r"),
                    (
                        (
                            (
                                F.lit(MINHASH_A[r]) * F.col("hv")
                                + F.lit(MINHASH_B[r])
                            )
                            % F.lit(MINHASH_P)
                        )
                        % F.lit(w)
                    ).cast("int").alias("b"),
                )
                for r in range(d)
            ]
        )
    ).alias("rb")


def cms_sketch(
    df: DataFrame,
    *,
    d: int = CMS_D,
    w: int = CMS_W,
    text_col: str = "text",
) -> DataFrame:
    """Count-min sketch of the corpus term frequencies (Cormode &
    Muthukrishnan 2005): d x w counters, counter[r][b] = number of
    token occurrences hashing to bucket b under row r's hash. The
    BOUNDED-MEMORY member of the frequency family: heavy_hitters
    shuffles a 1/rate occurrence sample (unbiased, sample-sized state),
    distinct_sketch estimates cardinality — this one answers point
    frequency queries for ANY term after the fact from d*w longs,
    never materializing the vocabulary. Estimates only OVERcount
    (min over d rows bounds the collision error at ~e*N/w with
    probability 1-e^-d) — the safe direction for stopword/blocklist
    screening, where a false high is a wasted exact check and a false
    low would be a miss. Output: (r, b, cnt), d*w rows max.

    Scale shape: one token explode x d bucket rows, collapsed by ONE
    partial-aggregatable groupBy(r, b) over a key space bounded by d*w
    (NOT corpus size) — every task combines to <= d*w rows map-side,
    the canonical sketch shuffle. Sketches of corpus shards MERGE by
    elementwise sum (same GROUP BY — pinned by test), so shard-level
    sketches union for free. Hash parity: md5_60(term) % P through the
    minhash universal-hash family (one hash discipline across dedup
    and telemetry), bucket = ((a*h + b) % P) % w — every step exact
    BIGINT, DuckDB-replayable."""
    toks = df.select(F.explode(words(text_col)).alias("term"))
    staged = toks.select(
        (_md5_60_of(F.col("term")) % F.lit(MINHASH_P)).alias("hv")
    )
    rows = staged.select(_cms_buckets(d, w))
    return (
        rows.select(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .groupBy("r", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    *,
    d: int = CMS_D,
    w: int = CMS_W,
    term_col: str = "term",
) -> DataFrame:
    """Point-query a count-min sketch: per term, min over the d row
    counters at the term's buckets. Missing buckets (never incremented)
    read as 0. The probe side replays the identical bucket math, so a
    sketch persisted as parquet serves any later session.

    Scale shape: the probe set is the small side by construction
    (someone is ASKING about these terms) — d probe rows per term
    equi-join the d*w-row sketch; both sides are tiny next to the
    corpus that built the sketch, and the final groupBy(term) is a
    partial-aggregatable MIN."""
    staged = terms.select(
        F.col(term_col).alias("term"),
        (_md5_60_of(F.col(term_col)) % F.lit(MINHASH_P)).alias("hv"),
    )
    probes = staged.select("term", _cms_buckets(d, w)).select(
        "term", F.col("rb.r").alias("r"), F.col("rb.b").alias("b")
    )
    joined = probes.join(sketch, ["r", "b"], "left").select(
        "term", F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt")
    )
    return joined.groupBy("term").agg(
        F.min("cnt").cast("long").alias("cms_est")
    )


def cms_counts(
    df: DataFrame,
    *,
    k: int = CMS_TOPK,
    d: int = CMS_D,
    w: int = CMS_W,
    text_col: str = "text",
) -> DataFrame:
    """The count-min accuracy gauge (ann_recall's frequency sibling):
    sketch the corpus, then compare the sketch's estimate against the
    exact count for the k most frequent terms (count desc / term asc
    tie-break — the house deterministic top-k). cms_est >= exact_cnt
    ALWAYS (one-sided error is the CMS contract); the overshoot is the
    collision telemetry that says whether w is sized right for the
    corpus. Output: (term, exact_cnt, cms_est)."""
    toks = df.select(F.explode(words(text_col)).alias("term"))
    exact = toks.groupBy("term").agg(
        F.count("*").cast("long").alias("exact_cnt")
    )
    topk = exact.orderBy(
        F.desc("exact_cnt"), F.asc("term")
    ).limit(int(k))
    sk = cms_sketch(df, d=d, w=w, text_col=text_col)
    est = cms_estimate(sk, topk.select("term"), d=d, w=w)
    return topk.join(est, "term").select("term", "exact_cnt", "cms_est")


# ---------------------------------------------------------------------------
# RSS / Atom feed ingestion (frontier discovery, sitemap's sibling)
# ---------------------------------------------------------------------------


def feed_wrapped(df: DataFrame) -> DataFrame:
    """Feed fixture through the REAL parser: even docs carry an RSS 2.0
    feed (item -> channel -> rss chain, link as DIRECT-CHILD TEXT),
    odd docs an Atom feed (entry -> feed chain, link as the HREF ATTR
    of a void <link> element — the parser treats link as a void tag,
    which is exactly why the two syntaxes exercise different
    extraction paths). Each feed has one complete entry, one link-LESS
    decoy (must drop but still occupy its document-order position),
    and one minimal entry (RSS: no pubDate; Atom: no title). The
    channel/feed-level <title> is a decoy too — it must never emit as
    an entry title. An orphan <item> outside any channel closes the
    fixture."""
    d = F.col("doc_id").cast("long")
    sid = F.col("doc_id").cast("string")
    month = (d % 9 + 1).cast("string")
    w1 = F.expr("element_at(split(text, ' '), 1)")
    rss = F.concat(
        F.lit('<rss version="2.0"><channel><title>Feed '), sid,
        F.lit("</title><item><title>First "), w1,
        F.lit("</title><link>https://EX.org:443/a/"), sid,
        F.lit("/</link><pubDate>2026-0"), month,
        F.lit("-01</pubDate></item>"
              "<item><title>No link</title></item>"
              "<item><title>Second</title><link>https://ex.org/a/"),
        sid,
        F.lit("?utm_source=r#f</link></item></channel></rss>"
              "<item><title>orphan</title><link>https://bad.org/x"
              "</link></item>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom"><title>A '), sid,
        F.lit("</title><entry><title>E1 "), w1,
        F.lit('</title><link href="https://ex.org/b/'), sid,
        F.lit('"/><updated>2026-0'), month,
        F.lit("-02</updated></entry>"
              "<entry><title>No link entry</title></entry>"
              '<entry><link href="https://ex.org/b2/'),
        sid, F.lit('"/></entry></feed>'),
    )
    html = F.when(d % 2 == 0, rss).otherwise(atom)
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def feed_entries_df(nodes_df: DataFrame) -> DataFrame:
    """RSS/Atom feed ingestion for the URL frontier — sitemap's
    sibling for the publish-side discovery channel (feeds surface NEW
    urls hours before a sitemap regenerates). Walks the flat parsed
    DOM for RSS items (item -> channel -> rss parent chain; the link
    is the item's <link> DIRECT-CHILD TEXT) and Atom entries (entry ->
    feed chain; the link is the HREF ATTRIBUTE of the entry's void
    <link> child), emitting one row per entry WITH a link: (doc_id,
    entry_pos, feed_type, title, link, published, url_canon, host).
    entry_pos is the document-order index over the doc's entries
    (dropped link-less entries still occupy their position); published
    is RSS pubDate / Atom updated text, NULL when absent; url_canon /
    host come from the SHARED url_canon_cols, so feed-discovered URLs
    join the same frontier dup groups as crawled links and sitemap
    locs. Orphan items outside the chain never emit.

    Scale shape: map-side HOF passes per doc + one posexplode (the
    plan's only Generate); every derived id/struct array binds at a
    projection boundary (the HOF-materialization house rule). Zero
    shuffles, zero Python beyond the shared parse kernel."""
    from dompa_spark.constants import TEXT_NAME

    nodes = F.col("nodes")

    def ids_of(name, parents_col=None):
        pred = (
            (lambda n: n["name"] == name)
            if parents_col is None
            else (
                lambda n: (n["name"] == name)
                & F.array_contains(F.col(parents_col), n["parent_id"])
            )
        )
        return F.transform(F.filter(nodes, pred), lambda n: n["node_id"])

    t1 = nodes_df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "nodes",
        ids_of("rss").alias("rssids"),
        ids_of("feed").alias("feedids"),
    )
    t2 = t1.select(
        "doc_id", "nodes",
        ids_of("channel", "rssids").alias("chids"),
        "feedids",
    )
    t3 = t2.select(
        "doc_id", "nodes",
        ids_of("item", "chids").alias("iids"),
        ids_of("entry", "feedids").alias("eids"),
    )
    t4 = t3.select(
        "doc_id", "nodes", "iids",
        F.concat(F.col("iids"), F.col("eids")).alias("uids"),
    )

    def kid_structs(name):
        # (1-based entry position, direct-child text, href attr) per
        # <name> element chained to an entry
        return F.transform(
            F.filter(
                nodes,
                lambda n: (n["name"] == name)
                & F.array_contains(F.col("uids"), n["parent_id"]),
            ),
            lambda el: F.struct(
                F.array_position(F.col("uids"), el["parent_id"]).alias(
                    "upos"
                ),
                F.array_join(
                    F.transform(
                        F.filter(
                            nodes,
                            lambda n: (n["parent_id"] == el["node_id"])
                            & (n["name"] == TEXT_NAME),
                        ),
                        lambda n: n["value"],
                    ),
                    "",
                ).alias("txt"),
                F.get(
                    F.filter(
                        el["attrs"], lambda kv: kv["key"] == "href"
                    ),
                    0,
                )["val"].alias("href"),
            ),
        )

    # <link> is a VOID element to the HTML parser (HTML semantics win
    # even inside RSS markup — parity with the reference's void table),
    # so an RSS <link>url</link> parses as a childless link node whose
    # url text lands as the NEXT SIBLING under the item; recover it as
    # the text node at node_id + 1 with the same parent. Atom's
    # <link href="..."/> reads the href attr — no sibling walk.
    link_structs = F.transform(
        F.filter(
            nodes,
            lambda n: (n["name"] == "link")
            & F.array_contains(F.col("uids"), n["parent_id"]),
        ),
        lambda el: F.struct(
            F.array_position(F.col("uids"), el["parent_id"]).alias(
                "upos"
            ),
            F.get(
                F.filter(
                    nodes,
                    lambda n: (n["parent_id"] == el["parent_id"])
                    & (n["node_id"] == el["node_id"] + 1)
                    & (n["name"] == TEXT_NAME),
                ),
                0,
            )["value"].alias("txt"),
            F.get(
                F.filter(el["attrs"], lambda kv: kv["key"] == "href"),
                0,
            )["val"].alias("href"),
        ),
    )

    t5 = t4.select(
        "doc_id", "iids", "uids",
        kid_structs("title").alias("ts"),
        link_structs.alias("ls"),
        kid_structs("pubDate").alias("ps"),
        kid_structs("updated").alias("us"),
    )

    def first_of(arr_col, ui):
        return F.get(
            F.filter(F.col(arr_col), lambda x: x["upos"] == ui + 1), 0
        )

    per = F.transform(
        F.col("uids"),
        lambda uid, ui: F.struct(
            F.array_contains(F.col("iids"), uid).alias("is_rss"),
            first_of("ts", ui)["txt"].alias("title"),
            first_of("ls", ui)["txt"].alias("link_txt"),
            first_of("ls", ui)["href"].alias("link_href"),
            first_of("ps", ui)["txt"].alias("pubdate"),
            first_of("us", ui)["txt"].alias("updated"),
        ),
    )
    ex = t5.select(
        "doc_id", F.posexplode(per).alias("entry_pos", "e")
    ).select(
        "doc_id",
        F.col("entry_pos").cast("long").alias("entry_pos"),
        F.when(F.col("e.is_rss"), F.lit("rss"))
        .otherwise(F.lit("atom"))
        .alias("feed_type"),
        F.col("e.title").alias("title"),
        F.when(F.col("e.is_rss"), F.col("e.link_txt"))
        .otherwise(F.col("e.link_href"))
        .alias("link"),
        F.when(F.col("e.is_rss"), F.col("e.pubdate"))
        .otherwise(F.col("e.updated"))
        .alias("published"),
    ).where(F.col("link").isNotNull())
    canon, host, _ = url_canon_cols("link")
    return ex.select("*", canon.alias("url_canon"), host.alias("host"))


# ---------------------------------------------------------------------------
# Bitext mining (margin-based cross-lingual alignment, CCMatrix shape)
# ---------------------------------------------------------------------------

BITEXT_K = 4  # margin normalizer: top-k neighborhood average
BITEXT_MARGIN_MIN_PPM = 1_050_000  # accept at margin >= 1.05
BITEXT_SRC_MAX = 40


def bitext_mine(
    emb: DataFrame,
    langs: DataFrame,
    *,
    src_lang: str = "en",
    tgt_lang: str = "de",
    src_id_max: int = BITEXT_SRC_MAX,
    k: int = BITEXT_K,
    margin_min_ppm: int = BITEXT_MARGIN_MIN_PPM,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019; the CCMatrix
    / parallel-corpus-from-crawl shape): for each source-language doc,
    the best target-language doc scored by the RATIO of its cosine to
    the average of both docs' top-k neighborhoods — raw cosine
    thresholds fail because 'hubness' docs are close to everything;
    margin normalizes that away. accepted = margin >= margin_min_ppm
    (the classic ~1.05-1.06 mining threshold).

    Engine parity: per-pair cosines are rounded-then-scaled to exact
    BIGINT (the PQ_DIST_SCALE discipline) BEFORE any aggregation, so
    the top-k sums are order-independent integer sums and the margin is
    one exact integer division: margin_ppm = (n_src_k + n_tgt_k) * c *
    10^6 div (sum_topk_src + sum_topk_tgt), where n_src_k / n_tgt_k are
    the ACTUAL neighborhood sizes (min(k, candidates) — a fixed 2k
    numerator would inflate margins whenever fewer than k targets or
    sources exist). A zero-norm embedding yields NULL cosine (never
    NaN/Inf — round().cast(long) on those is undefined under ANSI) and
    is excluded from every neighborhood; a non-positive denominator
    (all-negative neighborhoods) yields NULL margin / accepted=false.

    Scale shape: the source side is a bounded probe set (vec_id <
    src_id_max — the ann_cosine_topk gauge contract) and BROADCASTS;
    the target corpus streams through ONE scored map stage. The
    per-TARGET top-k window is bounded (at most n_src rows per
    partition), but the per-SOURCE window partitions over the ENTIRE
    scored target side — one task sorts |tgt| rows per probe, which is
    fine for a bounded gauge (the crossJoin already paid n_src x |tgt|)
    and is exactly why full corpus-x-corpus mining must NOT go through
    this operator directly: compose with the IVF/LSH pruners so each
    probe's candidate set (and therefore its window partition) is
    pruned first — this operator is the scoring contract those
    candidates feed."""
    from pyspark.sql.window import Window

    base = emb.join(langs, "vec_id").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "lang",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    base = base.withColumn(
        "norm",
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)),
    )
    src = base.where(
        (F.col("lang") == src_lang) & (F.col("vec_id") < src_id_max)
    ).select(
        F.col("vec_id").alias("src_id"),
        F.col("v").alias("sv"),
        F.col("norm").alias("snorm"),
    )
    tgt = base.where(F.col("lang") == tgt_lang).select(
        F.col("vec_id").alias("tgt_id"), "v", "norm"
    )
    dot = F.aggregate(
        F.zip_with("v", "sv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    valid = (F.col("norm") > 0) & (F.col("snorm") > 0)
    sim = dot / (F.col("norm") * F.col("snorm"))
    pairs = (
        tgt.crossJoin(F.broadcast(src))
        .select(
            "src_id",
            "tgt_id",
            F.when(valid, F.round(sim, 4)).alias("cosine"),
            F.when(valid, F.round(sim * 10_000).cast("long"))
            .alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    scorable = pairs.where(F.col("c").isNotNull())
    ws = Window.partitionBy("src_id").orderBy(
        F.desc("c"), F.asc("tgt_id")
    )
    src_sum = (
        scorable.withColumn("r", F.row_number().over(ws))
        .where(F.col("r") <= k)
        .groupBy("src_id")
        .agg(
            F.sum("c").cast("long").alias("ssum"),
            F.count("*").cast("long").alias("ns"),
        )
    )
    wt = Window.partitionBy("tgt_id").orderBy(
        F.desc("c"), F.asc("src_id")
    )
    tgt_sum = (
        scorable.withColumn("r", F.row_number().over(wt))
        .where(F.col("r") <= k)
        .groupBy("tgt_id")
        .agg(
            F.sum("c").cast("long").alias("tsum"),
            F.count("*").cast("long").alias("nt"),
        )
    )
    # left joins: a source whose every pair is NULL-cosine still emits
    # its one (NULL margin, accepted=false) row
    scored = (
        pairs.join(src_sum, "src_id", "left")
        .join(tgt_sum, "tgt_id", "left")
        .withColumn(
            "margin_ppm",
            F.when(
                F.col("c").isNotNull()
                & ((F.col("ssum") + F.col("tsum")) > 0),
                F.expr(
                    "((ns + nt) * c * 1000000) div (ssum + tsum)"
                ),
            ),
        )
    )
    wbest = Window.partitionBy("src_id").orderBy(
        F.desc_nulls_last("margin_ppm"), F.asc("tgt_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wbest))
        .where(F.col("rk") == 1)
        .select(
            "src_id",
            "tgt_id",
            "cosine",
            "margin_ppm",
            F.coalesce(
                F.col("margin_ppm") >= F.lit(int(margin_min_ppm)),
                F.lit(False),
            ).alias("accepted"),
        )
    )


def robots_sitemaps(
    df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """Sitemap: directives from robots.txt — the third discovery
    channel next to sitemap_urls (the files themselves) and
    feed_entries (publish-side): most crawls FIND their sitemap files
    here. Per REP, Sitemap lines are group-INDEPENDENT (they bind to
    no User-agent run and do not close one — robots_parse's group
    logic never sees them as rules), live anywhere in the file, and
    may point cross-host (a CDN-hosted sitemap is legal). Output one
    row per non-empty Sitemap line: (host, sm_idx, url, url_canon,
    sm_host, cross_host); sm_idx is the document-order index over the
    host's Sitemap lines — empty-value lines drop but hold their
    position (the feed_entries gap contract); url_canon/sm_host come
    from the SHARED url_canon_cols so a robots-discovered sitemap URL
    and a frontier-crawled one join the same dup group; cross_host
    flags sm_host != robots host.

    Scale shape: the shared _robots_lines map-side scan + one
    posexplode of slim (idx) rows; canonicalization is map-side regex
    on the exploded rows. Zero shuffles, zero Python."""
    t1 = _robots_lines(df, host_col, txt_col)
    sm = t1.select(
        "host",
        "vals",
        F.filter(
            F.sequence(F.lit(0), F.size("flds") - 1),
            lambda i: F.element_at(F.col("flds"), i + 1) == "sitemap",
        ).alias("smidx"),
    )
    ex = sm.select(
        "host",
        "vals",
        F.posexplode("smidx").alias("sm_idx", "i"),
    ).select(
        "host",
        F.col("sm_idx").cast("long").alias("sm_idx"),
        F.element_at(F.col("vals"), F.col("i") + 1).alias("url"),
    ).where(F.col("url") != "")
    canon, sm_host, _ = url_canon_cols("url")
    out = ex.select(
        "host", "sm_idx", "url",
        canon.alias("url_canon"), sm_host.alias("sm_host"),
    )
    return out.select(
        "*", (F.col("sm_host") != F.col("host")).alias("cross_host")
    )


# ---------------------------------------------------------------------------
# Recrawl scheduling (change-rate priority from snapshot diff history)
# ---------------------------------------------------------------------------

RECRAWL_BASE_DAYS = 64


def recrawl_priority(
    obs: DataFrame, *, base_days: int = RECRAWL_BASE_DAYS
) -> DataFrame:
    """Recrawl scheduling from observed change history — the loop that
    closes corpus_diff: each crawl cycle diffs against the last
    snapshot (added/changed/unchanged/removed per doc), and THIS
    operator turns the accumulated statuses into a fetch interval
    (change-rate-proportional recrawl is the classic freshness model:
    a page that changed on k of its observations gets ~base/(k+1)
    days). Input: (doc_id, cycle, status) observation rows. Output per
    doc: n_obs, n_changes ('changed' observations only — 'added' is
    first sight, not volatility), change_ppm = changes*10^6 div obs
    (exact), last_status (by max cycle), interval_days =
    max(base_days div (1 + n_changes), 1) — halving-style decay in
    exact integer division — or NULL when the doc was REMOVED at its
    last observation (dead URLs leave the schedule; a later re-add
    cycle revives them through 'added').

    Scale shape: ONE partial-aggregatable groupBy(doc_id) — counts,
    conditional counts, and last_status via max(struct(cycle, status))
    all combine map-side; no windows over the observation log. The
    10^12-URL frontier pays one slim shuffle row per doc per task."""
    o = obs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cycle").cast("long").alias("cycle"),
        "status",
    )
    agg = o.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum(
            F.when(F.col("status") == "changed", 1).otherwise(0)
        ).cast("long").alias("n_changes"),
        F.max(F.struct("cycle", "status"))["status"].alias(
            "last_status"
        ),
    )
    return agg.select(
        "doc_id",
        "n_obs",
        "n_changes",
        F.expr("(n_changes * 1000000) div n_obs").alias("change_ppm"),
        "last_status",
        F.when(
            F.col("last_status") != "removed",
            F.greatest(
                F.expr(f"{int(base_days)} div (1 + n_changes)"),
                F.lit(1).cast("long"),
            ),
        ).alias("interval_days"),
    )


def quality_calibration(df: DataFrame, **clf_kwargs) -> DataFrame:
    """Distillation-calibration gauge for the trainable quality
    classifier: the confusion matrix of the learned perceptron against
    the handcrafted gate that labeled its training data, plus
    accuracy/precision/recall in exact ppm. THE go/no-go number for
    swapping the heuristic gate out for the model (the CCNet move):
    ship the classifier when recall on gate-positives holds and
    precision says it isn't flooding the kept set. One output row:
    (n_docs, tp, fp, fn, tn, accuracy_ppm, precision_ppm, recall_ppm)
    — tp = gate-positive predicted positive; rates are integer
    divisions with greatest(...,1) guards so degenerate corpora (all
    one class) stay defined.

    Scale shape: train_quality_classifier's own plan (one corpus scan
    + broadcast-weight rounds) followed by ONE exact global aggregate
    — four conditional counts partial-aggregate map-side; the gauge
    adds no shuffle wider than a single combined row per task."""
    scored = train_quality_classifier(df, **clf_kwargs)

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    lab = F.col("label")
    pred = F.col("pred")
    agg = scored.agg(
        F.count("*").cast("long").alias("n_docs"),
        cnt((lab == 1) & (pred == 1)).alias("tp"),
        cnt((lab == -1) & (pred == 1)).alias("fp"),
        cnt((lab == 1) & (pred == -1)).alias("fn"),
        cnt((lab == -1) & (pred == -1)).alias("tn"),
    )
    return agg.select(
        "n_docs", "tp", "fp", "fn", "tn",
        F.expr(
            "((tp + tn) * 1000000) div greatest(n_docs, 1)"
        ).alias("accuracy_ppm"),
        F.expr(
            "(tp * 1000000) div greatest(tp + fp, 1)"
        ).alias("precision_ppm"),
        F.expr(
            "(tp * 1000000) div greatest(tp + fn, 1)"
        ).alias("recall_ppm"),
    )


def script_mixture(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Corpus-level script composition — corpus_mixture's sibling one
    rung below language: per dominant script, document and scripted-
    letter counts plus how many of its docs the mixed-script gate
    rejects. The report-card row a multilingual ingest reads first:
    a surging 'none' row is binary spill, a cyrillic row with high
    rejects is mojibake or spam, and the letter counts (not doc
    counts) are what tokenizer-budget planning needs. Output one row
    per observed main_script: (main_script, n_docs, n_scripted,
    n_rejected), all exact BIGINT.

    Scale shape: script_profile's zero-shuffle per-doc pass + ONE
    partial-aggregatable groupBy over a key space of 5 ('none' + the
    four families)."""
    prof = script_profile(df, text_col=text_col)
    return prof.groupBy("main_script").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_scripted").cast("long").alias("n_scripted"),
        F.sum(
            F.when(~F.col("script_ok"), 1).otherwise(0)
        ).cast("long").alias("n_rejected"),
    )


EMB_STATS_SCALE = 10_000


def embedding_stats(emb: DataFrame) -> DataFrame:
    """Per-dimension embedding audit — the sanity gauge an ANN ingest
    runs BEFORE spending a training pass on the index: a dead
    (constant) dimension means a broken featurizer, a mean far off the
    others means an unnormalized batch, and the per-dim spread drives
    the PQ subspace split. Values snap to EMB_STATS_SCALE fixed point
    (the PQ_DIST_SCALE discipline), so every aggregate is an exact
    BIGINT and the row hashes engine-identically. Output one row per
    dimension: (dim_idx, n_vecs, mean_fp, min_fp, max_fp, sumsq_fp) —
    variance is the consumer's division (emitting raw sums keeps the
    row re-aggregatable across shards, the domain_stats argument);
    is-dead is min_fp == max_fp.

    Scale shape: one posexplode × dim + ONE partial-aggregatable
    groupBy over a key space bounded by the DIMENSION (not corpus
    size) — every task combines to <= dim rows map-side, the cms/
    sketch shuffle shape. Overflow: |sum| <= n·scale·|x|max,
    sumsq <= n·(scale·|x|max)² — BIGINT-safe past 10^10 unit-scale
    vectors."""
    ex = emb.select(
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(
                    x.cast("double") * EMB_STATS_SCALE
                ).cast("long"),
            )
        ).alias("dim_idx", "v")
    )
    return (
        ex.groupBy("dim_idx")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.expr("sum(v) div count(*)").alias("mean_fp"),
            F.min("v").cast("long").alias("min_fp"),
            F.max("v").cast("long").alias("max_fp"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias(
                "sumsq_fp"
            ),
        )
        .select(
            F.col("dim_idx").cast("long").alias("dim_idx"),
            "n_vecs", "mean_fp", "min_fp", "max_fp", "sumsq_fp",
        )
    )


def sitemap_index_wrapped(df: DataFrame) -> DataFrame:
    """Sitemap-INDEX fixture through the REAL parser: a <sitemapindex>
    with two <sitemap> entries (one carrying lastmod, one whose loc
    needs canonicalization) and a loc-less decoy holding its
    document-order position; a top-level orphan <sitemap> outside any
    index must never emit."""
    sid = F.col("doc_id").cast("string")
    month = (F.col("doc_id").cast("long") % 9 + 1).cast("string")
    html = F.concat(
        F.lit('<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
              'sitemap/0.9"><sitemap><loc>https://EX.org:443/maps/m'),
        sid, F.lit(".xml</loc><lastmod>2026-0"), month,
        F.lit("-20</lastmod></sitemap>"
              "<sitemap><priority>0.2</priority></sitemap>"
              "<sitemap><loc>https://ex.org/maps/n"),
        sid,
        F.lit(".xml?utm_source=i</loc></sitemap></sitemapindex>"
              "<sitemap><loc>https://bad.org/x.xml</loc></sitemap>"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(html_span(html, 0)).alias("spans"),
    )


def _sitemap_entries(
    nodes_df: DataFrame, container: str, entry: str, pos_name: str
) -> DataFrame:
    """ONE sitemap-protocol walker for both file shapes (urlset/url
    and sitemapindex/sitemap): strict entry->container parent chain,
    direct-child-text loc (required) / lastmod (optional), document-
    order positions with gaps, shared url_canon_cols. Every derived
    id/struct array binds at a projection boundary — the O(nodes^2)
    HOF-materialization trap documented on sitemap_urls_df; one walker
    means a future fix cannot miss a copy (review catch)."""
    from dompa_spark.constants import TEXT_NAME

    ixids = F.transform(
        F.filter(F.col("nodes"), lambda n: n["name"] == container),
        lambda n: n["node_id"],
    )
    t1 = nodes_df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "nodes",
        ixids.alias("ixids"),
    )
    sids = F.transform(
        F.filter(
            F.col("nodes"),
            lambda n: (n["name"] == entry)
            & F.array_contains(F.col("ixids"), n["parent_id"]),
        ),
        lambda n: n["node_id"],
    )
    t2 = t1.select("doc_id", "nodes", sids.alias("uids"))

    def kid_structs(name):
        return F.transform(
            F.filter(
                F.col("nodes"),
                lambda n: (n["name"] == name)
                & F.array_contains(F.col("uids"), n["parent_id"]),
            ),
            lambda el: F.struct(
                F.array_position(F.col("uids"), el["parent_id"]).alias(
                    "upos"
                ),
                F.array_join(
                    F.transform(
                        F.filter(
                            F.col("nodes"),
                            lambda n: (n["parent_id"] == el["node_id"])
                            & (n["name"] == TEXT_NAME),
                        ),
                        lambda n: n["value"],
                    ),
                    "",
                ).alias("txt"),
            ),
        )

    t3 = t2.select(
        "doc_id", "uids",
        kid_structs("loc").alias("ls"),
        kid_structs("lastmod").alias("ms"),
    )
    per = F.transform(
        F.col("uids"),
        lambda uid, ui: F.struct(
            F.get(
                F.filter(F.col("ls"), lambda x: x["upos"] == ui + 1), 0
            )["txt"].alias("loc"),
            F.get(
                F.filter(F.col("ms"), lambda x: x["upos"] == ui + 1), 0
            )["txt"].alias("lastmod"),
        ),
    )
    ex = t3.select(
        "doc_id", F.posexplode(per).alias(pos_name, "u")
    ).where(F.col("u.loc").isNotNull())
    canon, host, _ = url_canon_cols("loc")
    return ex.select(
        "doc_id",
        F.col(pos_name).cast("long").alias(pos_name),
        F.col("u.loc").alias("loc"),
        F.col("u.lastmod").alias("lastmod"),
    ).select("*", canon.alias("url_canon"), host.alias("host"))


def sitemap_index_df(nodes_df: DataFrame) -> DataFrame:
    """Sitemap-index ingestion — the recursion step of sitemap
    discovery (large sites MUST shard: the protocol caps a sitemap
    file at 50k URLs / 50 MB, so real sitemaps are indexes of
    sitemaps; robots_sitemaps finds the index, THIS operator finds the
    shards, sitemap_urls_df reads them). Walks <sitemap> entries that
    are DIRECT children of a <sitemapindex> — the same strict
    parent-chain / direct-child-text / loc-required contracts as
    sitemap_urls_df, emitting (doc_id, sm_pos, loc, lastmod,
    url_canon, host) with the SHARED frontier canonicalization, so an
    index-discovered shard URL dedups against a robots-discovered one.

    Scale shape: identical to sitemap_urls_df — map-side HOF passes +
    one posexplode, every derived array bound at a projection
    boundary; zero shuffles, zero Python beyond the parse kernel."""
    return _sitemap_entries(
        nodes_df, "sitemapindex", "sitemap", "sm_pos"
    )
