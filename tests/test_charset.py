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


def test_fixture_suffix_constants_match_oracle_literals():
    # the SQL oracle embeds these literally; a drift here is a silent
    # hash mismatch at the driver
    import __spark_entry__ as entry

    sql = entry.oracle_sql()["charset_transcode"]
    assert cs.CP1252_SUFFIX in sql
    assert cs.UNICODE_SUFFIX.strip() in sql
    assert cs.CP1252_SUFFIX.encode("cp1252") == b"\x80\x97\x95"
