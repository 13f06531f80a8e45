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
  2. strict UTF-8 validation -> 'utf-8' (pure ASCII is valid UTF-8, so
     ASCII payloads report 'utf-8'; no separate 'ascii' tier — the
     transcoded text is identical either way and one fewer label keeps
     the verdict deterministic across mixed corpora).
  3. fallback 'cp1252' (windows-1252 — the de-facto "latin-1" of the
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


def detect_and_decode(content: bytes) -> tuple[str, str]:
    """Single-payload detection + transcode (the kernel's core; exposed
    for unit tests and non-Spark callers). Returns (charset, text).
    A BOM is consumed, never surfaced in the text. Bodies that violate
    their BOM-declared encoding transcode with U+FFFD replacement
    (crawl robustness: a truncated UTF-16 tail must not kill the task);
    the BOM-less tiers never need replacement — strict UTF-8 failure IS
    the signal that routes to cp1252, and cp1252+passthrough decodes
    every byte."""
    if content.startswith(codecs.BOM_UTF8):
        return "utf-8-sig", content[len(codecs.BOM_UTF8):].decode(
            "utf-8", "replace"
        )
    if content.startswith(codecs.BOM_UTF16_LE):
        return "utf-16le", content[2:].decode("utf-16-le", "replace")
    if content.startswith(codecs.BOM_UTF16_BE):
        return "utf-16be", content[2:].decode("utf-16-be", "replace")
    try:
        return "utf-8", content.decode("utf-8")
    except UnicodeDecodeError:
        # WHATWG windows-1252: total (every byte decodes) — the five
        # bytes Python's strict cp1252 rejects pass through as C1
        return "cp1252", content.decode("cp1252", "dompa_c1_passthrough")


def detect_transcode(df: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, content:binary) -> (doc_id, charset, text_out, n_bytes)
    via the module-header policy. One Arrow pass, no shuffle."""
    import pandas as pd

    def _iter(batches: Iterator["pd.DataFrame"]):
        for pdf in batches:
            ids, charsets, texts, sizes = [], [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf[content_col]):
                content = bytes(content) if content is not None else b""
                charset, text = detect_and_decode(content)
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

    return df.select("doc_id", content_col).mapInPandas(
        _iter, schema=DECODED_SCHEMA
    )


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
