"""dom_skeleton / template_detect: structure fingerprints + host
template detection.

Pins content-invariance (same layout, different copy/attr values ->
same skeleton), text/comment exclusion, the exact ppm gate, and the
min_docs floor.
"""

import pytest
from pyspark.sql import functions as F

from dompa_spark import pipeline, textops


def _nodes(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, html string")
    spans = df.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.col("html").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    return pipeline.parse_nodes_df(spans)


def _skel(spark, rows):
    out = textops.dom_skeleton(_nodes(spark, rows))
    return {
        str(r["doc_id"]): (r["skeleton"], r["n_tags"])
        for r in out.collect()
    }


def test_skeleton_content_invariant(spark):
    sk = _skel(
        spark,
        [
            ("1", '<div class="a"><h1>One</h1><p>alpha beta</p></div>'),
            ("2", '<div id="zz9"><h1>Two!</h1><p>totally different</p></div>'),
            ("3", "<div><h1>x</h1><p>y</p></div>"),
        ],
    )
    assert sk["1"] == sk["2"] == sk["3"]
    assert sk["1"][1] == 3


def test_skeleton_sees_structure_not_text(spark):
    sk = _skel(
        spark,
        [
            ("1", "<div><p>a</p></div>"),
            ("2", "<div><p>a</p><p>b</p></div>"),  # extra element
            ("3", "<span><p>a</p></span>"),  # different tag
        ],
    )
    assert sk["1"] != sk["2"]
    assert sk["1"] != sk["3"]


def test_text_nodes_excluded_comment_quirk_pinned(spark):
    # text nodes never contribute to the skeleton; a TOP-LEVEL comment
    # is dropped outright. A comment INSIDE an element kills the
    # enclosing element (the reference's comment/unify quirk, same in
    # kernel and oracle) — so it DOES change the skeleton, pinned here
    # so nobody "fixes" it into divergence from the reference.
    sk = _skel(
        spark,
        [
            ("1", "<div><p>x</p></div>"),
            ("2", "<div>lead text<p>y</p>tail</div>"),
            ("3", "<!-- note --><div><p>z</p></div>"),
            ("4", "<div><!-- note --><p>w</p></div>"),
        ],
    )
    assert sk["1"] == sk["2"] == sk["3"]
    assert sk["4"] != sk["1"]
    assert sk["4"][1] == 1  # the div was killed; only the p remains


def test_void_elements_count(spark):
    sk = _skel(spark, [("1", "<p>a</p><hr><img src='x.png'>")])
    assert sk["1"][1] == 3


def test_template_gate_ppm_and_min_docs(spark):
    # host A: 8 docs layout-1, 2 docs layout-2 (20%), 1 doc layout-3
    # (10%): with frac_min 15% + min_docs 2, layouts 1-2 are templates,
    # layout 3 fails BOTH gates.
    rows = []
    for i in range(8):
        rows.append((str(i), "<div><p>d%d</p></div>" % i))
    for i in range(8, 10):
        rows.append((str(i), "<ul><li>u%d</li></ul>" % i))
    rows.append(("10", "<table><tr><td>t</td></tr></table>"))
    nodes = _nodes(spark, rows)
    hosts = spark.createDataFrame(
        [(str(i), "a.com") for i in range(11)],
        "doc_id string, host string",
    )
    out = textops.template_detect(nodes, hosts).collect()
    by_n = {r["n_docs"]: r for r in out}
    assert set(by_n) == {8, 2, 1}
    assert by_n[8]["is_template"] is True
    assert by_n[2]["is_template"] is True
    assert by_n[1]["is_template"] is False
    assert all(r["host_docs"] == 11 for r in out)


def test_template_scoped_per_host(spark):
    # the same skeleton is a template on the host where it dominates
    # and not on the host where it is rare.
    rows = [(str(i), "<div><p>x%d</p></div>" % i) for i in range(6)]
    rows += [(str(i), "<ul><li>y%d</li></ul>" % i) for i in range(6, 26)]
    nodes = _nodes(spark, rows)
    hosts = spark.createDataFrame(
        [(str(i), "small.com" if i < 4 else "big.com")
         for i in range(26)],
        "doc_id string, host string",
    )
    out = textops.template_detect(nodes, hosts, min_docs=1).collect()
    # the div skeleton appears on both hosts: 4/4 docs on small.com
    # (template) but 2/22 (~9%) on big.com (below the 15% gate).
    div_skel = next(
        r["skeleton"] for r in out if r["host"] == "small.com"
    )
    div_rows = {
        r["host"]: r for r in out if r["skeleton"] == div_skel
    }
    assert div_rows["small.com"]["is_template"] is True
    assert div_rows["small.com"]["n_docs"] == 4
    assert div_rows["big.com"]["is_template"] is False
    assert div_rows["big.com"]["n_docs"] == 2
    assert div_rows["big.com"]["host_docs"] == 22


def test_skeleton_differential_vs_oracle_on_fuzz_corpus(spark):
    """dom_skeleton == an oracle-parser Python replay (pre-order
    element-name walk + the same md5_60) over 120 messy generated docs
    — malformed/unclosed/crossed tags, comments, junk tokens."""
    import hashlib

    from dompa_spark import corpus, oracle
    from dompa_spark.constants import TEXT_NAME

    def names_of(nodes, out):
        for n in nodes or []:
            if n["name"] != TEXT_NAME:
                out.append(n["name"])
                names_of(n.get("children"), out)
        return out

    rows, want = [], {}
    for i in range(120):
        doc_id, spans = corpus.gen_doc(i)
        html = "".join(
            s["text"] or ""
            for s in sorted(
                (s for s in spans if s["kind"] == "html"),
                key=lambda s: s["offset"],
            )
        )
        rows.append((doc_id, html))
        names = names_of(oracle.parse(html), [])
        seq = ">".join(names)
        want[doc_id] = (
            int(hashlib.md5(seq.encode()).hexdigest()[:15], 16),
            len(names),
        )

    got = _skel(spark, rows)
    assert got == want
