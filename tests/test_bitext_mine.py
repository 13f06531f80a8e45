"""bitext_mine: margin-based cross-lingual alignment.

Differential against a pure-Python reference of the same
scaled-integer margin math, plus the non-positive-denominator guard
and the acceptance threshold contract.
"""

import math

import pytest
from pyspark.sql import functions as F

from dompa_spark import textops


def _mk(spark, vecs, langs):
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    lng = spark.createDataFrame(
        [(i, l) for i, l in langs.items()], "vec_id long, lang string"
    )
    return emb, lng


def _round_away(x):
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _py_reference(vecs, langs, src_max, k, thr):
    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0 or nb == 0:
            return None  # zero-norm: NULL cosine, never NaN/Inf
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    srcs = sorted(
        i for i, l in langs.items() if l == "en" and i < src_max
    )
    tgts = sorted(i for i, l in langs.items() if l == "de")
    c = {}
    for s in srcs:
        for t in tgts:
            sim = cos(vecs[s], vecs[t])
            c[(s, t)] = (
                None if sim is None else _round_away(sim * 10_000)
            )

    def topk(vals):
        vv = sorted(
            (v for v in vals if v is not None), reverse=True
        )[:k]
        return (sum(vv), len(vv)) if vv else (None, 0)

    ssum = {s: topk(c[(s, t)] for t in tgts) for s in srcs}
    tsum = {t: topk(c[(s, t)] for s in srcs) for t in tgts}
    out = {}
    for s in srcs:
        best = None
        for t in tgts:
            cv = c[(s, t)]
            ss, ns = ssum[s]
            ts, nt = tsum[t]
            m = None
            if (cv is not None and ss is not None
                    and ts is not None and ss + ts > 0):
                # actual neighborhood sizes, not a fixed 2k
                m = ((ns + nt) * cv * 1_000_000) // (ss + ts)
            key = (-(m if m is not None else -(10**18)), t)
            if best is None or key < best[0]:
                best = (key, t, m)
        _, t, m = best
        out[s] = (t, m, bool(m is not None and m >= thr))
    return out


def test_differential_vs_python_reference(spark):
    # deterministic 4-dim vectors: 6 'en' sources, 7 'de' targets
    vecs, langs = {}, {}
    for i in range(13):
        vecs[i] = [
            1.0 + ((i * 7 + j * 3) % 11) / 10.0 - 0.5 for j in range(4)
        ]
        langs[i] = "en" if i % 2 == 0 else "de"
    emb, lng = _mk(spark, vecs, langs)
    got = {
        r["src_id"]: (r["tgt_id"], r["margin_ppm"], r["accepted"])
        for r in textops.bitext_mine(emb, lng).collect()
    }
    want = _py_reference(
        vecs, langs, textops.BITEXT_SRC_MAX, textops.BITEXT_K,
        textops.BITEXT_MARGIN_MIN_PPM,
    )
    assert got == want


def test_true_pair_outscores_offdiagonal(spark):
    # near-identical (src, tgt) pairs: each source must pick its own
    # translation and accept it; margin > 1 by construction.
    vecs, langs = {}, {}
    base = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    for i, b in enumerate(base):
        vecs[2 * i] = b
        vecs[2 * i + 1] = [x + 0.05 for x in b]
        langs[2 * i] = "en"
        langs[2 * i + 1] = "de"
    emb, lng = _mk(spark, vecs, langs)
    got = {
        r["src_id"]: r for r in textops.bitext_mine(emb, lng).collect()
    }
    for i in range(3):
        assert got[2 * i]["tgt_id"] == 2 * i + 1
        assert got[2 * i]["accepted"] is True


def test_fewer_than_k_candidates_margin_not_inflated(spark):
    # 2 sources x 2 targets with k=4: each neighborhood holds only 2
    # terms, so the numerator must scale by ns+nt=4, not 2k=8 (the old
    # fixed-2k margin doubled -- and wrongly accepted -- these).
    vecs = {
        0: [1.0, 0.0], 2: [0.8, 0.6],   # en sources
        1: [1.0, 0.0], 3: [0.0, 1.0],   # de targets
    }
    langs = {0: "en", 2: "en", 1: "de", 3: "de"}
    emb, lng = _mk(spark, vecs, langs)
    got = {
        r["src_id"]: (r["tgt_id"], r["margin_ppm"], r["accepted"])
        for r in textops.bitext_mine(emb, lng).collect()
    }
    want = _py_reference(
        vecs, langs, textops.BITEXT_SRC_MAX, textops.BITEXT_K,
        textops.BITEXT_MARGIN_MIN_PPM,
    )
    assert got == want
    # closed form for src 0 -> tgt 1: c=10000, ssum=10000+0,
    # tsum=10000+8000, ns=nt=2 -> 4*10000*1e6 // 28000 = 1_428_571
    assert got[0] == (1, 1_428_571, True)


def test_zero_norm_embedding_yields_null_not_nan(spark):
    # one zero-norm source and one zero-norm target: their pairs get
    # NULL cosine (excluded from every neighborhood), the zero-norm
    # source still emits its one NULL-margin accepted=false row, and
    # the healthy pair is unaffected.
    vecs = {
        0: [1.0, 0.0], 2: [0.0, 0.0],   # en; src 2 is zero-norm
        1: [1.0, 0.0], 3: [0.0, 0.0],   # de; tgt 3 is zero-norm
    }
    langs = {0: "en", 2: "en", 1: "de", 3: "de"}
    emb, lng = _mk(spark, vecs, langs)
    rows = {
        r["src_id"]: r for r in textops.bitext_mine(emb, lng).collect()
    }
    assert set(rows) == {0, 2}
    assert rows[2]["margin_ppm"] is None
    assert rows[2]["accepted"] is False
    assert rows[2]["cosine"] is None
    # healthy pair: single 1-term neighborhood each side ->
    # (1+1)*10000*1e6 // 20000 = exactly 1_000_000 (ratio 1.0)
    assert rows[0]["tgt_id"] == 1
    assert rows[0]["margin_ppm"] == 1_000_000
    assert rows[0]["accepted"] is False  # 1.0 < 1.05 threshold


def test_nonpositive_denominator_guard(spark):
    # every target opposes every source: all cosines negative, both
    # neighborhood sums negative -> NULL margin, accepted=false.
    vecs = {0: [1.0, 0.0], 2: [0.9, 0.1], 1: [-1.0, 0.0], 3: [-0.9, -0.2]}
    langs = {0: "en", 2: "en", 1: "de", 3: "de"}
    emb, lng = _mk(spark, vecs, langs)
    out = textops.bitext_mine(emb, lng).collect()
    assert len(out) == 2
    for r in out:
        assert r["margin_ppm"] is None
        assert r["accepted"] is False
