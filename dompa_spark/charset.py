"""Charset sniffing + transcoding — the decode step a crawl pipeline
runs before ANY text processing. Real crawl payloads arrive as bytes in
a zoo of encodings; feeding them to the parser as if they were UTF-8
silently mangles every non-ASCII page. This module pins a deterministic
detection policy (the tier order real browsers and crawlers use) and
transcodes everything to Unicode text in one Arrow-batched pass:

  1. BOM sniff (authoritative when present, per the Unicode standard):
       EF BB BF        -> 'utf-8-sig'
       FF FE           -> 'utf-16le'
       FE FF           -> 'utf-16be'
  2. declared charset — the HTTP Content-Type's charset= parameter
     (pass per-row via detect_transcode's declared_col) or, opt-in, a
     WHATWG-style <meta charset> prescan of the first 1024 bytes.
     Known labels only (unknown labels are ignored, never an error);
     a declared UTF-8 still validates strictly before being trusted.
  3. strict UTF-8 validation -> 'utf-8' (pure ASCII is valid UTF-8, so
     ASCII payloads report 'utf-8'; no separate 'ascii' tier — the
     transcoded text is identical either way and one fewer label keeps
     the verdict deterministic across mixed corpora).
  4. fallback 'cp1252' (windows-1252 — the de-facto "latin-1" of the
     web; every byte sequence decodes, so detection always succeeds).
     The five bytes cp1252 leaves unmapped (0x81 8D 8F 90 9D) decode
     as the same-valued C1 controls, matching the WHATWG Encoding
     Standard's windows-1252 table rather than Python's strict codec.

Known, documented limitation shared with every BOM sniffer: a cp1252
document whose first two BYTES happen to be FF FE (i.e. text starting
with 'ÿþ') is indistinguishable from a UTF-16LE BOM and detects as
UTF-16 — inherent to the format, not a bug in the policy.

Scale shape: both kernels are mapInPandas over Arrow batches; the
per-row work is CPython's C codec machinery (bytes.decode/str.encode),
no interpreted per-character loops. Embarrassingly parallel, zero
shuffles — parallelism is whatever the input partitioning provides
(callers repartition upstream like the media decode family does).
"""

from __future__ import annotations

import codecs
import re
from typing import Iterator

from pyspark.sql import DataFrame

ENCODED_SCHEMA = "doc_id long, content binary"


def _c1_passthrough(err: UnicodeDecodeError):
    """codecs error handler: map each undecodable byte to the same-valued
    code point (U+0081 for 0x81, ...). Registered once; with cp1252 this
    reproduces the WHATWG windows-1252 table byte-for-byte — Python's
    strict codec leaves 0x81 8D 8F 90 9D unmapped, WHATWG defines them
    as the C1 controls — WITHOUT disturbing the 27 mapped high bytes
    the way a whole-payload latin-1 retry would (latin-1 turns 0x80
    into U+0080, not '€')."""
    return (
        "".join(chr(b) for b in err.object[err.start : err.end]),
        err.end,
    )


codecs.register_error("dompa_c1_passthrough", _c1_passthrough)
DECODED_SCHEMA = "doc_id long, charset string, text_out string, n_bytes long"

# fixture branch suffixes, mirrored literally in the SQL oracle:
# multibyte coverage for the Unicode branches (2-byte é + 3-byte 漢 in
# UTF-8; both BMP in UTF-16), cp1252-specific high bytes (80 97 95 —
# all invalid as UTF-8 lead/continuation sequences, so the fallback
# tier is genuinely exercised) for the legacy branch.
UNICODE_SUFFIX = " é漢"  # " é漢"
CP1252_SUFFIX = "€—•"  # "€—•" -> bytes 80 97 95


# labels accepted as declared-charset hints (transport header or meta
# prescan), normalized to the codec we decode with. Everything else —
# unknown labels, typos, encodings outside the supported set — is
# IGNORED and detection falls through to content tiers, never raises.
_DECLARED_LABELS = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "iso-8859-1": "cp1252",  # WHATWG aliases latin-1 TO windows-1252
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "us-ascii": "utf-8",  # ASCII is a UTF-8 subset; one fewer label
    "ascii": "utf-8",
    "utf-16le": "utf-16le",
    "utf-16be": "utf-16be",
}

# WHATWG prescan subset: <meta charset="..."> and
# <meta http-equiv="content-type" content="...; charset=...">, matched
# over the first PRESCAN_BYTES of the payload decoded as latin-1 (the
# prescan operates on bytes; latin-1 is the identity byte->char map)
PRESCAN_BYTES = 1024

_META_CHARSET = re.compile(
    r"""<meta[^>]+?charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""",
    re.IGNORECASE,
)


def prescan_meta_charset(content: bytes) -> str | None:
    """WHATWG-style prescan: find a charset declaration in the first
    1024 BYTES of an HTML payload (both the HTML5 `<meta charset=X>`
    and the legacy `http-equiv` + `content="...;charset=X"` forms match
    the same pattern — charset= is what carries the label in either).
    Returns the normalized codec name or None. Per the standard, a
    UTF-16 label found via prescan means the document self-describes
    impossibly (the prescan only works on ASCII-compatible bytes) and
    is treated as UTF-8."""
    head = content[:PRESCAN_BYTES].decode("latin-1")
    m = _META_CHARSET.search(head)
    if not m:
        return None
    label = _DECLARED_LABELS.get(m.group(1).lower())
    if label in ("utf-16le", "utf-16be"):
        return "utf-8"
    return label


def detect_and_decode(
    content: bytes, declared: str | None = None, prescan: bool = False
) -> tuple[str, str]:
    """Single-payload detection + transcode (the kernel's core; exposed
    for unit tests and non-Spark callers). Returns (charset, text).

    Tier order (the browser/crawler priority):
      BOM  >  declared transport charset (e.g. the HTTP Content-Type's
      charset= parameter, pass via `declared`)  >  meta prescan (opt-in
      via prescan=True for HTML payloads)  >  strict UTF-8  >  cp1252.

    A BOM is consumed, never surfaced in the text, and OVERRIDES any
    declaration (the byte-order mark is ground truth; servers lie).
    A declared/prescanned UTF-8 that fails strict validation falls
    through to the content tiers rather than replacing — a wrong label
    shouldn't destroy bytes that cp1252 can decode totally. Bodies that
    violate their BOM-declared encoding transcode with U+FFFD
    replacement (crawl robustness: a truncated UTF-16 tail must not
    kill the task); the BOM-less tiers never need replacement — strict
    UTF-8 failure IS the signal that routes to cp1252, and
    cp1252+passthrough decodes every byte."""
    if content.startswith(codecs.BOM_UTF8):
        return "utf-8-sig", content[len(codecs.BOM_UTF8):].decode(
            "utf-8", "replace"
        )
    if content.startswith(codecs.BOM_UTF16_LE):
        return "utf-16le", content[2:].decode("utf-16-le", "replace")
    if content.startswith(codecs.BOM_UTF16_BE):
        return "utf-16be", content[2:].decode("utf-16-be", "replace")
    hint = _DECLARED_LABELS.get((declared or "").lower())
    if hint is None and prescan:
        hint = prescan_meta_charset(content)
    if hint == "cp1252":
        return "cp1252", content.decode("cp1252", "dompa_c1_passthrough")
    if hint in ("utf-16le", "utf-16be"):
        # declared UTF-16 without a BOM: trust the transport header
        return hint, content.decode(hint.replace("16", "16-"), "replace")
    # hint is utf-8 or absent: identical path — strict UTF-8, then fall
    try:
        return "utf-8", content.decode("utf-8")
    except UnicodeDecodeError:
        # WHATWG windows-1252: total (every byte decodes) — the five
        # bytes Python's strict cp1252 rejects pass through as C1
        return "cp1252", content.decode("cp1252", "dompa_c1_passthrough")


def transcode_expr(
    content, declared=None, prescan: bool = False
):
    """Column-level variant for composing into an existing Catalyst
    plan (e.g. the WARC ingest select): returns a
    struct<charset:string, text:string> Column decoded from a binary
    `content` Column and an optional per-row declared-charset Column
    (pass the HTTP Content-Type's charset= parameter; '' and NULL both
    mean no hint). NULL content yields a NULL-fielded struct, so
    callers can mask the input with F.when(...) and only pay the decode
    for the rows that need it. Arrow-vectorized pandas UDF — the same
    C-codec per-row work as detect_transcode, usable inside one
    projection instead of forcing a mapInPandas restructure."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    out_type = StructType(
        [
            StructField("charset", StringType()),
            StructField("text", StringType()),
        ]
    )

    def _udf(c, d):
        charsets, texts = [], []
        for content_b, declared_s in zip(c, d):
            if content_b is None:
                charsets.append(None)
                texts.append(None)
                continue
            hint = (
                None
                if declared_s is None or declared_s == ""
                else str(declared_s)
            )
            cs_name, text = detect_and_decode(
                bytes(content_b), declared=hint, prescan=prescan
            )
            charsets.append(cs_name)
            texts.append(text)
        return pd.DataFrame({"charset": charsets, "text": texts})

    # real annotation objects — `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf's type inference
    # can't resolve for local aliases (same pattern as textops.py)
    _udf.__annotations__ = {
        "c": pd.Series,
        "d": pd.Series,
        "return": pd.DataFrame,
    }
    udf = F.pandas_udf(_udf, out_type)
    if declared is None:
        declared = F.lit(None).cast("string")
    return udf(content, declared)


def detect_transcode(
    df: DataFrame,
    content_col: str = "content",
    declared_col: str | None = None,
    prescan: bool = False,
) -> DataFrame:
    """(doc_id, content:binary[, declared:string]) ->
    (doc_id, charset, text_out, n_bytes) via the module-header policy.
    declared_col names an optional per-row transport-charset hint (the
    HTTP Content-Type's charset= parameter, e.g. from parse_warc's
    headers); prescan=True enables the meta-prescan tier for HTML
    payloads. One Arrow pass, no shuffle."""
    import pandas as pd

    cols = ["doc_id", content_col] + ([declared_col] if declared_col else [])

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            ids, charsets, texts, sizes = [], [], [], []
            declared_vals = (
                pdf[declared_col] if declared_col else [None] * len(pdf)
            )
            for doc_id, content, declared in zip(
                pdf["doc_id"], pdf[content_col], declared_vals
            ):
                content = bytes(content) if content is not None else b""
                charset, text = detect_and_decode(
                    content,
                    declared=None if declared is None else str(declared),
                    prescan=prescan,
                )
                ids.append(int(doc_id))
                charsets.append(charset)
                texts.append(text)
                sizes.append(len(content))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "charset": charsets,
                    "text_out": texts,
                    "n_bytes": sizes,
                }
            )

    return df.select(*cols).mapInPandas(_iter, schema=DECODED_SCHEMA)


def docs_to_encoded(df: DataFrame, text_col: str = "prep_text") -> DataFrame:
    """Fixture kernel: render prepared text as raw bytes in an encoding
    cycled by pmod(doc_id, 4) — 0: UTF-8 bare, 1: UTF-8 with BOM,
    2: UTF-16LE with BOM, 3: cp1252 — so the detector sees a genuinely
    mixed corpus. The CALLER prepares the text branch-appropriately in
    Catalyst (ASCII-stripped + CP1252_SUFFIX for branch 3 so cp1252 can
    encode it, + UNICODE_SUFFIX otherwise); this kernel only encodes,
    keeping the Python surface one C-codec call per row."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            ids, contents = [], []
            for doc_id, txt in zip(pdf["doc_id"], pdf[text_col]):
                doc_id = int(doc_id)
                txt = "" if txt is None else str(txt)
                b = doc_id % 4  # Python %: non-negative for any id sign
                if b == 0:
                    content = txt.encode("utf-8")
                elif b == 1:
                    content = codecs.BOM_UTF8 + txt.encode("utf-8")
                elif b == 2:
                    content = codecs.BOM_UTF16_LE + txt.encode("utf-16-le")
                else:
                    content = txt.encode("cp1252")
                ids.append(doc_id)
                contents.append(content)
            yield pd.DataFrame({"doc_id": ids, "content": contents})

    return df.select("doc_id", text_col).mapInPandas(
        _iter, schema=ENCODED_SCHEMA
    )
