"""charset.py — detection-policy units, WHATWG fallback, Spark round-trip."""

import codecs

import pytest

from dompa_spark import charset as cs


# --- detect_and_decode policy tiers -----------------------------------------


def test_bom_utf8_sig():
    charset, text = cs.detect_and_decode(codecs.BOM_UTF8 + "héllo".encode())
    assert (charset, text) == ("utf-8-sig", "héllo")


def test_bom_utf16le():
    charset, text = cs.detect_and_decode(
        codecs.BOM_UTF16_LE + "héllo 漢".encode("utf-16-le")
    )
    assert (charset, text) == ("utf-16le", "héllo 漢")


def test_bom_utf16be():
    charset, text = cs.detect_and_decode(
        codecs.BOM_UTF16_BE + "héllo 漢".encode("utf-16-be")
    )
    assert (charset, text) == ("utf-16be", "héllo 漢")


def test_plain_ascii_reports_utf8():
    assert cs.detect_and_decode(b"plain ascii") == ("utf-8", "plain ascii")


def test_multibyte_utf8_no_bom():
    payload = "mixé 漢字 𐍈".encode()  # 2-, 3-, and 4-byte sequences
    assert cs.detect_and_decode(payload) == ("utf-8", "mixé 漢字 𐍈")


def test_empty_payload_is_utf8_empty():
    assert cs.detect_and_decode(b"") == ("utf-8", "")


def test_invalid_utf8_falls_to_cp1252():
    # 0x80/0x97/0x95 are never valid UTF-8 at these positions
    charset, text = cs.detect_and_decode(b"price \x80 dash \x97 dot \x95")
    assert charset == "cp1252"
    assert text == "price € dash — dot •"


def test_cp1252_unmapped_bytes_use_whatwg_c1_passthrough():
    # 0x81 has no cp1252 mapping; WHATWG decodes it as U+0081 while the
    # mapped high bytes in the SAME payload keep their cp1252 meanings
    # (a whole-payload latin-1 retry would get 0x80 wrong)
    charset, text = cs.detect_and_decode(b"x\x80y\x81z")
    assert charset == "cp1252"
    assert text == "x€y\x81z"


def test_bom_declared_body_violation_replaces_not_raises():
    # UTF-16LE BOM with an odd-length (truncated) body
    charset, text = cs.detect_and_decode(codecs.BOM_UTF16_LE + b"a\x00b")
    assert charset == "utf-16le"
    assert text == "a�"


def test_stripped_bom_never_surfaces_in_text():
    for bom, enc in [
        (codecs.BOM_UTF8, "utf-8"),
        (codecs.BOM_UTF16_LE, "utf-16-le"),
        (codecs.BOM_UTF16_BE, "utf-16-be"),
    ]:
        _, text = cs.detect_and_decode(bom + "ok".encode(enc))
        assert text == "ok"


# --- declared-charset + prescan tiers ----------------------------------------


def test_declared_cp1252_decodes_ascii_payload_as_cp1252():
    # the label changes the VERDICT even when bytes alone would say utf-8
    assert cs.detect_and_decode(b"plain", declared="windows-1252") == (
        "cp1252",
        "plain",
    )


def test_declared_latin1_aliases_to_cp1252_per_whatwg():
    charset, text = cs.detect_and_decode(b"a\x80b", declared="ISO-8859-1")
    assert (charset, text) == ("cp1252", "a€b")


def test_declared_utf16le_without_bom_is_trusted():
    payload = "héllo".encode("utf-16-le")  # no BOM
    assert cs.detect_and_decode(payload, declared="utf-16le") == (
        "utf-16le",
        "héllo",
    )


def test_bom_overrides_declaration():
    payload = codecs.BOM_UTF8 + "x".encode()
    assert cs.detect_and_decode(payload, declared="windows-1252")[0] == (
        "utf-8-sig"
    )


def test_unknown_label_is_ignored_not_fatal():
    assert cs.detect_and_decode(b"ok", declared="klingon-8") == ("utf-8", "ok")


def test_declared_utf8_still_validates_strictly():
    # a lying utf-8 label on cp1252 bytes must not produce U+FFFD
    charset, text = cs.detect_and_decode(b"a\x97b", declared="utf-8")
    assert (charset, text) == ("cp1252", "a—b")


def test_prescan_meta_charset_html5_form():
    html = b'<html><head><meta charset="windows-1252"></head>a\x97b'
    assert cs.detect_and_decode(html, prescan=True)[0] == "cp1252"
    assert cs.prescan_meta_charset(html) == "cp1252"


def test_prescan_meta_charset_http_equiv_form():
    html = (
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=iso-8859-1">x'
    )
    assert cs.prescan_meta_charset(html) == "cp1252"


def test_prescan_only_reads_first_1024_bytes():
    html = b" " * 1100 + b'<meta charset="windows-1252">'
    assert cs.prescan_meta_charset(html) is None


def test_prescan_utf16_label_treated_as_utf8_per_whatwg():
    assert cs.prescan_meta_charset(b'<meta charset="utf-16le">') == "utf-8"


def test_declared_beats_prescan():
    html = b'<meta charset="utf-8">a\x97b'
    charset, _ = cs.detect_and_decode(
        html, declared="windows-1252", prescan=True
    )
    assert charset == "cp1252"


# --- Spark kernels -----------------------------------------------------------


@pytest.fixture(scope="module")
def encoded_roundtrip(spark):
    rows = [
        (0, "bare utf-8 é漢"),
        (1, "bom utf-8 é漢"),
        (2, "utf-16 漢字"),
        (3, "legacy €—•"),  # cp1252-specific bytes force the fallback tier
        (4, ""),
        (7, None),  # cp1252 branch, NULL text -> empty payload
    ]
    df = spark.createDataFrame(rows, "doc_id long, prep_text string")
    out = cs.detect_transcode(cs.docs_to_encoded(df))
    return {r["doc_id"]: r.asDict() for r in out.collect()}, dict(rows)


def test_spark_roundtrip_text_and_charset(encoded_roundtrip):
    got, src = encoded_roundtrip
    # ASCII-only payloads on the cp1252 branch (doc 7: empty) correctly
    # report utf-8 — the byte sequences are indistinguishable and the
    # transcoded text is identical; only genuine high bytes (doc 3)
    # exercise the fallback verdict
    expect_charset = {
        0: "utf-8",
        1: "utf-8-sig",
        2: "utf-16le",
        3: "cp1252",
        4: "utf-8",
        7: "utf-8",
    }
    for doc_id, row in got.items():
        assert row["charset"] == expect_charset[doc_id]
        assert row["text_out"] == (src[doc_id] or "")


def test_spark_roundtrip_n_bytes(encoded_roundtrip):
    got, src = encoded_roundtrip
    assert got[0]["n_bytes"] == len("bare utf-8 é漢".encode())
    assert got[1]["n_bytes"] == len("bom utf-8 é漢".encode()) + 3
    assert got[2]["n_bytes"] == 2 + len("utf-16 漢字".encode("utf-16-le"))
    assert got[3]["n_bytes"] == len("legacy €—•")  # 1 byte/char in cp1252
    assert got[4]["n_bytes"] == 0  # empty text, bare-utf-8 branch
    assert got[7]["n_bytes"] == 0  # NULL text -> empty payload


def test_spark_declared_col_threading(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"a\x97b"), "windows-1252"),
         (2, bytearray(b"plain"), None),
         (3, bytearray(b"x\x80y"), "nonsense-charset")],
        "doc_id long, content binary, http_charset string",
    )
    rows = {
        r["doc_id"]: (r["charset"], r["text_out"])
        for r in cs.detect_transcode(
            df, declared_col="http_charset"
        ).collect()
    }
    assert rows[1] == ("cp1252", "a—b")  # header hint honored
    assert rows[2] == ("utf-8", "plain")  # NULL hint -> content tiers
    assert rows[3] == ("cp1252", "x€y")  # junk hint ignored, fallback


def test_transcode_expr_warc_ingest_recipe(spark):
    """The exact composition jobs/ingest_warc.py uses: parse_warc ->
    charset= extracted from the HTTP Content-Type -> transcode_expr
    masked to html rows with prescan on. One record per tier: header-
    declared cp1252, undeclared UTF-8, meta-prescan iso-8859-1."""
    from pyspark.sql import functions as F

    from dompa_spark import warc

    CRLF = "\r\n"

    def response(url, body, ctype):
        http = (
            f"HTTP/1.1 200 OK{CRLF}Content-Type: {ctype}{CRLF}{CRLF}"
        ).encode() + body
        hdr = (
            f"WARC/1.0{CRLF}WARC-Type: response{CRLF}"
            f"WARC-Target-URI: {url}{CRLF}"
            f"Content-Type: application/http;msgtype=response{CRLF}"
            f"Content-Length: {len(http)}{CRLF}{CRLF}"
        ).encode()
        return hdr + http + (CRLF * 2).encode()

    shard = (
        response(
            "http://a/1",
            "café — naïve€".encode("cp1252"),
            "text/html; charset=windows-1252",
        )
        + response("http://a/2", "plain utf-8 é漢".encode(), "text/html")
        + response(
            "http://a/3",
            '<meta charset="iso-8859-1">sëlf'.encode("cp1252"),
            "text/html",
        )
    )
    shards = spark.createDataFrame(
        [(1, bytearray(shard))], "warc_id long, content binary"
    )
    recs = warc.parse_warc(shards).filter(F.col("url").isNotNull())
    is_html = (
        (F.col("warc_type") == "response")
        & F.col("http_status").between(200, 299)
        & F.col("mime").startswith("text/html")
    )
    declared = F.regexp_extract(
        F.col("mime"), r"(?i);\s*charset=\"?\s*([A-Za-z0-9_\-]+)", 1
    )
    dec = cs.transcode_expr(
        F.when(is_html, F.col("payload")), declared, prescan=True
    )
    rows = {
        r["url"]: (r["cs"], r["t"])
        for r in recs.filter(is_html)
        .select("url", dec["charset"].alias("cs"), dec["text"].alias("t"))
        .collect()
    }
    assert rows["http://a/1"] == ("cp1252", "café — naïve€")
    assert rows["http://a/2"] == ("utf-8", "plain utf-8 é漢")
    assert rows["http://a/3"] == ("cp1252", '<meta charset="iso-8859-1">sëlf')


def test_fixture_suffix_constants_match_oracle_literals():
    # the SQL oracle embeds these literally; a drift here is a silent
    # hash mismatch at the driver
    import __spark_entry__ as entry

    sql = entry.oracle_sql()["charset_transcode"]
    assert cs.CP1252_SUFFIX in sql
    assert cs.UNICODE_SUFFIX.strip() in sql
    assert cs.CP1252_SUFFIX.encode("cp1252") == b"\x80\x97\x95"
