"""PDF / layout parse — the second document format of the extraction
pipeline (BASELINE.json north_rule: "HTML boilerplate strip, PDF/layout
parse, DOM heuristics").

Built from scratch on public format knowledge (ISO 32000-1 subset), no
third-party PDF library:

* **object layer** — byte-level tokenizer for PDF dictionaries, arrays,
  names, numbers, literal/hex strings, indirect references; object
  discovery by `N G obj` scan (xref-independent, tolerant of truncated /
  corrupt trailers, mirroring the reference's malformed-HTML tolerance —
  /root/reference/src/dompa/coordinates.cljc:123-167 applies the same
  "never throw, recover structurally" stance to tags);
* **stream layer** — /Length-sliced stream payloads (direct or indirect
  length, with a backward `endstream` scan fallback), FlateDecode via
  stdlib zlib;
* **content layer** — an FSM over the page content stream implementing
  the text-positioning subset: BT/ET, Tf, TL, Td, TD, Tm, T*, Tj, ', ",
  TJ (with per-mille advance adjustments), using the standard simplified
  advance model (0.5 em per char) that preserves intra-line ordering;
* **layout layer** — text runs -> lines (y-clustering) -> columns
  (largest-gap split over line-start x) -> reading order (columns left
  to right, lines top to bottom), emitting the same ordered
  (kind, text, media_ref, offset) span arrays as the HTML kernel.

A deterministic generator (`build_pdf`) renders arbitrary text into this
subset (fixed 80-char lines, 40 lines/page, single- or two-column pages,
Flate-compressed streams, escaped strings) so the full
generate -> parse -> layout -> text path is oracle-checkable: the
recovered text must equal the source byte-for-byte, and page/line counts
are closed-form in len(text) (see __spark_entry__ `pdf_layout`).

Spark-side: Arrow-batched mapInPandas operators only — no per-row Python
UDF in any plan; per-document byte work happens inside the batch, the
same execution shape as kernel.parse_flat.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Layout grid of the generator (and the closed-form oracle): 80-char
# lines, 40 lines per page (two-column pages: 20 per column), Letter
# media box, 11 pt type on 14 pt leading.
LINE_WIDTH = 80
LINES_PER_PAGE = 40
PAGE_W, PAGE_H = 612, 792
MARGIN_X, TOP_Y = 72, 720
COL2_X = 320
FONT_SIZE, LEADING = 11, 14

# Two-column pages must not overlap the gutter: 80 chars at the 0.5 em
# advance model is 40*size pt wide, and the column pitch is
# COL2_X - MARGIN_X = 248 pt, so two-column text renders at 5 pt.
FONT_SIZE_2COL = 5

# Layout-analysis tolerances: runs within Y_TOL pt share a line; an
# x-range never covered by any run and wider than GUTTER_MIN pt is a
# column gutter (x-interval-union projection, the vertical step of
# recursive XY-cut); a baseline-to-baseline y-gap taller than
# BAND_GUTTER_MIN pt is a horizontal band gutter (the horizontal step).
# BAND_GUTTER_MIN is calibrated in baseline-gap space — the parser does
# not track glyph heights — strictly above 2x LEADING so a single blank
# grid line never opens a band, and well under the generator's
# header/body gap (78 pt).
Y_TOL = 3.0
GUTTER_MIN = 36.0
BAND_GUTTER_MIN = 40.0

# Banded page geometry (build_pdf banded=True): a full-width header band
# of BAND_HEADER_LINES lines at FONT_SIZE from TOP_Y, then a two-column
# body at FONT_SIZE_2COL starting at BAND_BODY_Y (header bottom baseline
# 720 - 3*14 = 678; 678 - 600 = 78 pt band gap).
BAND_HEADER_LINES = 4
BAND_BODY_Y = 600

_ESC = {ord("\\"): b"\\\\", ord("("): b"\\(", ord(")"): b"\\)",
        ord("\n"): b"\\n", ord("\r"): b"\\r", ord("\t"): b"\\t"}
_UNESC = {ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
          ord("b"): b"\b", ord("f"): b"\f", ord("("): b"(",
          ord(")"): b")", ord("\\"): b"\\"}

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _esc_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    if not any(b in _ESC for b in raw):
        return raw
    return b"".join(_ESC.get(b, bytes([b])) for b in raw)


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

def build_pdf(text: str, two_col: bool = False,
              banded: bool = False) -> bytes:
    """Render `text` as a minimal valid PDF (1.4): fixed-width lines on a
    page grid, Flate-compressed content streams, correct xref/trailer.

    Deterministic: same text+mode -> same bytes. Two-column pages place
    lines 0..19 in the left column and 20..39 in the right one; banded
    pages place lines 0..3 in a full-width header band and the rest in
    a two-column body below a 78 pt band gap (reading order preserved by
    the layout pass in both modes). Content streams exercise the full
    operator subset: Tm+TL+T* (single column), Td/TD and TJ-with-kerning
    on every 7th line, indirect /Length objects in two-col mode.
    """
    if two_col and banded:
        raise ValueError("two_col and banded are mutually exclusive")
    lines = [text[i:i + LINE_WIDTH] for i in range(0, len(text), LINE_WIDTH)]
    pages = [lines[i:i + LINES_PER_PAGE]
             for i in range(0, len(lines), LINES_PER_PAGE)] or [[]]

    objs: list[bytes] = []  # 1-indexed object bodies (without N 0 obj wrapper)

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font_id = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids: list[int] = []
    kid_refs: list[bytes] = []
    # object ids are assigned in emission order; /Parent back-refs need the
    # pages-node id, which we reserve by appending a placeholder last.
    pages_node_id = None

    content_ids = []
    for pg in pages:
        stream = _page_stream(pg, two_col, banded)
        comp = zlib.compress(stream)
        if two_col:
            # indirect /Length: exercises two-phase length resolution
            len_id = add(str(len(comp)).encode())
            head = b"<< /Length %d 0 R /Filter /FlateDecode >>" % len_id
        else:
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(comp)
        content_ids.append(
            add(head + b"\nstream\n" + comp + b"\nendstream"))

    # reserve ids: page objects, then pages node, then catalog
    first_page_id = len(objs) + 1
    pages_node_id = first_page_id + len(pages)
    catalog_id = pages_node_id + 1
    for i, cid in enumerate(content_ids):
        page_ids.append(add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (pages_node_id, PAGE_W, PAGE_H, font_id, cid)))
    kid_refs = b" ".join(b"%d 0 R" % p for p in page_ids)
    add(b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kid_refs, len(page_ids)))
    add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node_id)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0] * (len(objs) + 1)
    for i, body in enumerate(objs, start=1):
        offsets[i] = len(out)
        out += b"%d 0 obj\n" % i
        out += body
        out += b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objs) + 1):
        out += b"%010d 00000 n \n" % offsets[i]
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, catalog_id, xref_at))
    return bytes(out)


def _page_stream(pg_lines: list[str], two_col: bool,
                 banded: bool = False) -> bytes:
    buf = bytearray()
    if not pg_lines:
        return bytes(buf)
    if two_col:
        half = LINES_PER_PAGE // 2
        cols = [(MARGIN_X, pg_lines[:half]), (COL2_X, pg_lines[half:])]
        for x0, col in cols:
            if not col:
                continue
            buf += b"BT /F1 %d Tf %d %d Td " % (FONT_SIZE_2COL, x0, TOP_Y)
            for j, ln in enumerate(col):
                if j:
                    # TD: sets leading AND moves — parser must handle both
                    buf += b"0 %d TD " % -LEADING
                buf += _line_ops(ln, j)
            buf += b"ET\n"
    elif banded:
        head = pg_lines[:BAND_HEADER_LINES]
        body = pg_lines[BAND_HEADER_LINES:]
        buf += (b"BT /F1 %d Tf %d TL 1 0 0 1 %d %d Tm "
                % (FONT_SIZE, LEADING, MARGIN_X, TOP_Y))
        for j, ln in enumerate(head):
            if j:
                buf += b"T* "
            buf += _line_ops(ln, j)
        buf += b"ET\n"
        half = (len(body) + 1) // 2
        for x0, col in ((MARGIN_X, body[:half]), (COL2_X, body[half:])):
            if not col:
                continue
            buf += b"BT /F1 %d Tf %d %d Td " % (FONT_SIZE_2COL, x0,
                                                BAND_BODY_Y)
            for j, ln in enumerate(col):
                if j:
                    buf += b"0 %d TD " % -LEADING
                buf += _line_ops(ln, j)
            buf += b"ET\n"
    else:
        buf += (b"BT /F1 %d Tf %d TL 1 0 0 1 %d %d Tm "
                % (FONT_SIZE, LEADING, MARGIN_X, TOP_Y))
        for j, ln in enumerate(pg_lines):
            if j:
                buf += b"T* "
            buf += _line_ops(ln, j)
        buf += b"ET\n"
    return bytes(buf)


def _line_ops(ln: str, j: int) -> bytes:
    # every 7th line: split into a kerned TJ array (two runs, -40/1000 em
    # adjustment) so the parser's TJ + advance model is on the hot path
    if j % 7 == 3 and len(ln) > 10:
        mid = len(ln) // 2
        return (b"[(%s) -40 (%s)] TJ "
                % (_esc_string(ln[:mid]), _esc_string(ln[mid:])))
    return b"(%s) Tj " % _esc_string(ln)


# ---------------------------------------------------------------------------
# object-layer parser
# ---------------------------------------------------------------------------

class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


class _Name(str):
    """PDF name token (distinct from string values)."""


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment to EOL
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
        else:
            break
    return i


def _parse_value(data: bytes, i: int):
    """Parse one PDF object value at i -> (value, next_i)."""
    i = _skip_ws(data, i)
    n = len(data)
    if i >= n:
        return None, i
    c = data[i]
    if data.startswith(b"<<", i):
        return _parse_dict(data, i)
    if c == 0x3C:  # hex string
        j = data.index(b">", i + 1)
        hx = re.sub(rb"\s", b"", data[i + 1:j])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii", "replace")), j + 1
    if c == 0x28:  # literal string
        return _parse_lit_string(data, i)
    if c == 0x5B:  # array
        out = []
        i += 1
        while True:
            i = _skip_ws(data, i)
            if i >= n or data[i] == 0x5D:
                return out, i + 1
            v, i = _parse_value(data, i)
            out.append(v)
    if c == 0x2F:  # name
        j = i + 1
        while j < n and data[j] not in _WS and data[j] not in _DELIM:
            j += 1
        raw = data[i + 1:j]
        # #xx hex escapes in names
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})",
                         lambda m: bytes([int(m.group(1), 16)]), raw)
        return _Name(raw.decode("latin-1")), j
    m = re.match(rb"[+-]?(?:\d+\.?\d*|\.\d+)", data[i:])
    if m:
        j = i + m.end()
        tok = m.group()
        # lookahead: `N G R` indirect reference
        k = _skip_ws(data, j)
        m2 = re.match(rb"(\d+)\s+R(?![A-Za-z])", data[k:k + 32])
        if m2 and b"." not in tok:
            return _Ref(int(tok)), k + m2.end()
        return (float(tok) if b"." in tok else int(tok)), j
    m = re.match(rb"true|false|null", data[i:])
    if m:
        v = {b"true": True, b"false": False, b"null": None}[m.group()]
        return v, i + m.end()
    return None, i + 1  # unknown byte: skip (tolerant)


def _parse_dict(data: bytes, i: int):
    d = {}
    i += 2
    n = len(data)
    while True:
        i = _skip_ws(data, i)
        if i >= n:
            return d, i
        if data.startswith(b">>", i):
            return d, i + 2
        k, i = _parse_value(data, i)
        v, i = _parse_value(data, i)
        if isinstance(k, _Name):
            d[str(k)] = v


def _parse_lit_string(data: bytes, i: int):
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _UNESC:
                out += _UNESC[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < min(i + 3, n) and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(int(data[i:j], 8) & 0xFF)
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        elif c == 0x0D:  # EOL in string -> LF (spec 7.3.4.2)
            out.append(0x0A)
            i += 1
            if i < n and data[i] == 0x0A:
                i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i  # unterminated: tolerant


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def parse_objects(data: bytes) -> dict[int, tuple[dict | object, bytes | None]]:
    """Scan for `N G obj` and parse each object -> {num: (value, stream)}.

    xref-independent by design: works on truncated or lied-about xref
    tables (length fallback: backward scan to `endstream`).
    """
    objs: dict[int, tuple[object, bytes | None]] = {}
    pending_len: list[tuple[int, object, int]] = []  # (num, dict, stream_at)
    pos = 0
    while True:
        # sequential cursor (not finditer): stream payloads are skipped
        # wholesale so binary bytes can't fake an `N G obj` header
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        val, i = _parse_value(data, m.end())
        i = _skip_ws(data, i)
        stream = None
        if data.startswith(b"stream", i):
            i += 6
            if data.startswith(b"\r\n", i):
                i += 2
            elif i < len(data) and data[i] in (0x0A, 0x0D):
                i += 1
            length = val.get("Length") if isinstance(val, dict) else None
            if isinstance(length, _Ref):
                pending_len.append((num, val, i))
                stream = b""
                j = data.find(b"endstream", i)
                i = j + 9 if j >= 0 else len(data)
            elif isinstance(length, int) and \
                    data.startswith(b"endstream", _skip_ws(data, i + length)):
                stream = data[i:i + length]
                i = _skip_ws(data, i + length) + 9
            else:  # absent or wrong /Length: scan
                j = data.find(b"endstream", i)
                stream = data[i:j if j >= 0 else len(data)].rstrip(b"\r\n")
                i = j + 9 if j >= 0 else len(data)
        objs[num] = (val, stream)
        pos = max(i, m.end())
    for num, val, i in pending_len:  # second phase: indirect /Length
        ref = val["Length"]
        tgt = objs.get(ref.num)
        if tgt and isinstance(tgt[0], int):
            objs[num] = (val, data[i:i + tgt[0]])
        else:
            j = data.find(b"endstream", i)
            objs[num] = (val, data[i:j if j >= 0 else len(data)].rstrip(b"\r\n"))
    return objs


def _deref(objs, v):
    while isinstance(v, _Ref):
        got = objs.get(v.num)
        v = got[0] if got else None
    return v


def _decode_stream(d: dict, raw: bytes) -> bytes | None:
    filt = d.get("Filter")
    if isinstance(filt, list):
        filt = filt[0] if len(filt) == 1 else str(filt)
    if filt is None:
        return raw
    if str(filt) == "FlateDecode":
        try:
            return zlib.decompress(raw)
        except zlib.error:
            try:  # tolerate trailing garbage
                return zlib.decompressobj().decompress(raw)
            except zlib.error:
                return None
    return None  # unsupported filter (DCT etc.): not text content


def page_content_streams(data: bytes) -> list[bytes]:
    """All text content streams in document page order.

    Page order: /Root -> /Pages -> /Kids traversal (nested Pages nodes
    supported); falls back to byte order of /Type /Page objects when the
    catalog chain is broken.
    """
    objs = parse_objects(data)

    def content_of(page_d: dict) -> bytes:
        cont = page_d.get("Contents")
        refs = cont if isinstance(cont, list) else [cont]
        parts = []
        for r in refs:
            if isinstance(r, _Ref) and r.num in objs:
                d, raw = objs[r.num]
                if raw is not None and isinstance(d, dict):
                    dec = _decode_stream(d, raw)
                    if dec is not None:
                        parts.append(dec)
        return b"\n".join(parts)

    # catalog chain
    pages: list[dict] = []
    root = None
    matches = list(re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", data))
    if matches:  # last match: the live trailer is the one nearest EOF
        root = _deref(objs, _Ref(int(matches[-1].group(1))))
    if not isinstance(root, dict):  # no trailer: first /Type /Catalog
        root = next((v for v, _ in objs.values()
                     if isinstance(v, dict) and str(v.get("Type")) == "Catalog"),
                    None)

    def walk(node) -> None:
        node = _deref(objs, node)
        if not isinstance(node, dict):
            return
        t = str(node.get("Type"))
        if t == "Page":
            pages.append(node)
        elif t == "Pages":
            for kid in node.get("Kids") or []:
                walk(kid)

    if isinstance(root, dict):
        walk(root.get("Pages"))
    if not pages:  # broken catalog: byte order
        pages = [v for v, _ in objs.values()
                 if isinstance(v, dict) and str(v.get("Type")) == "Page"]
    return [content_of(p) for p in pages]


# ---------------------------------------------------------------------------
# content-stream FSM
# ---------------------------------------------------------------------------

_CONTENT_TOK = re.compile(
    rb"(?P<str>\()|(?P<hex><[0-9A-Fa-f\s]*>)|(?P<arr>[\[\]])|"
    rb"(?P<name>/[^\s()<>\[\]{}/%]*)|"
    rb"(?P<num>[+-]?(?:\d+\.?\d*|\.\d+))|"
    rb"(?P<op>[A-Za-z'\"*]+)|(?P<cmt>%[^\n\r]*)")


def text_runs(content: bytes) -> list[tuple[float, float, str, float]]:
    """FSM over a content stream -> [(x, y, text, x_end)] runs.

    Position model: text-line origin (lx, ly) moved by Td/TD/Tm/T*;
    within a line x advances ~0.5 em per char (+ TJ adjustments) — exact
    glyph metrics are unnecessary for ordering, only monotonicity; x_end
    feeds the gutter projection in layout_lines.
    """
    runs: list[tuple[float, float, str, float]] = []
    size, leading = 12.0, 0.0
    lx = ly = x = y = 0.0
    stack: list = []  # operand stack
    in_text = False
    i, n = 0, len(content)
    while i < n:
        m = _CONTENT_TOK.search(content, i)
        if not m:
            break
        i = m.end()
        kind = m.lastgroup
        if kind == "str":
            s, i = _parse_lit_string(content, m.start())
            stack.append(s)
        elif kind == "hex":
            hx = re.sub(rb"\s", b"", m.group()[1:-1])
            if len(hx) % 2:
                hx += b"0"
            stack.append(bytes.fromhex(hx.decode("ascii", "replace")))
        elif kind == "arr":
            stack.append(b"[" if m.group() == b"[" else b"]")
        elif kind == "num":
            g = m.group()
            stack.append(float(g) if b"." in g else int(g))
        elif kind == "name":
            stack.append(_Name(m.group()[1:].decode("latin-1")))
        elif kind == "op":
            op = m.group()
            if op == b"BT":
                in_text, lx, ly, x, y = True, 0.0, 0.0, 0.0, 0.0
            elif op == b"ET":
                in_text = False
            elif op == b"Tf" and len(stack) >= 1:
                size = float(stack[-1]) if isinstance(
                    stack[-1], (int, float)) else size
            elif op == b"TL" and stack:
                leading = float(stack[-1])
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                tx, ty = float(stack[-2]), float(stack[-1])
                if op == b"TD":
                    leading = -ty
                lx, ly = lx + tx, ly + ty
                x, y = lx, ly
            elif op == b"Tm" and len(stack) >= 6:
                e, f = (float(v) for v in stack[-2:])
                lx, ly = e, f
                x, y = lx, ly
            elif op == b"T*":
                ly -= leading
                x, y = lx, ly
            elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
                x = _emit(runs, x, y, stack[-1], size, in_text)
            elif op == b"'" and stack and isinstance(stack[-1], bytes):
                ly -= leading
                x, y = lx, ly
                x = _emit(runs, x, y, stack[-1], size, in_text)
            elif op == b'"' and len(stack) >= 3 and isinstance(stack[-1], bytes):
                ly -= leading
                x, y = lx, ly
                x = _emit(runs, x, y, stack[-1], size, in_text)
            elif op == b"TJ":
                # operands back to the matching [
                j = len(stack) - 1
                while j >= 0 and stack[j] != b"[":
                    j -= 1
                for el in stack[j + 1:]:
                    if isinstance(el, bytes) and el not in (b"[", b"]"):
                        x = _emit(runs, x, y, el, size, in_text)
                    elif isinstance(el, (int, float)):
                        x -= float(el) / 1000.0 * size
            stack.clear()
    return runs


def _emit(runs, x, y, raw: bytes, size: float, in_text: bool) -> float:
    text = raw.decode("utf-8", "replace")
    # advance on characters, not bytes: a multibyte-heavy line must not
    # be modeled wider than its glyph count (it would swallow the gutter)
    x_end = x + 0.5 * size * len(text)
    if in_text and text:
        runs.append((x, y, text, x_end))
    return x_end


# ---------------------------------------------------------------------------
# layout analysis
# ---------------------------------------------------------------------------

def _column_boundaries(runs) -> list[float]:
    """Project run x-intervals onto the x-axis; every maximal uncovered
    range wider than GUTTER_MIN is a column gutter. Returns the gutter
    midpoints (ascending) — n gutters => n+1 columns. This is the
    vertical step of recursive XY-cut (Nagy & Seth 1984), which a mid-
    line kerning gap cannot fake: TJ runs abut, so their union is
    contiguous across a single column."""
    ivs = sorted((r[0], r[3]) for r in runs)
    merged: list[list[float]] = []
    for a, b in ivs:
        if merged and a - merged[-1][1] < GUTTER_MIN:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    return [(merged[k][1] + merged[k + 1][0]) / 2
            for k in range(len(merged) - 1)]


def _band_boundaries(runs) -> list[float]:
    """Project run baselines onto the y-axis; every gap between adjacent
    distinct baselines taller than BAND_GUTTER_MIN is a horizontal band
    gutter. Returns the gutter midpoints in descending y (top->bottom
    reading order) — n gutters => n+1 bands. This is the horizontal step
    of recursive XY-cut (Nagy & Seth 1984). Baselines stand in for glyph
    boxes (the run model carries no glyph height), so the threshold is
    calibrated in baseline-gap space: normal leading is LEADING pt, and
    side-by-side columns with staggered baselines can only SHRINK a gap,
    never fake one."""
    ys = sorted({r[1] for r in runs}, reverse=True)
    return [(a + b) / 2 for a, b in zip(ys, ys[1:])
            if a - b > BAND_GUTTER_MIN]


def _leaf_lines(runs) -> list[str]:
    """Terminal zone of the XY-cut: cluster runs into lines by y
    (tolerance Y_TOL), order lines top->bottom, runs within a line
    left->right (stable on x ties)."""
    runs = sorted(runs, key=lambda r: -r[1])
    lines: list[list] = []
    for r in runs:
        if lines and abs(lines[-1][0][1] - r[1]) <= Y_TOL:
            lines[-1].append(r)
        else:
            lines.append([r])
    out: list[str] = []
    for ln in lines:
        ln.sort(key=lambda r: r[0])
        out.append("".join(t for _, _, t, _ in ln))
    return out


def _xy_lines(runs, axis: str) -> list[str]:
    """One level of recursive XY-cut. Try a cut on `axis`; if it splits,
    recurse into each part on the OTHER axis (a y-split leaves no
    further y-gutter inside a band, and symmetrically for x, so the
    immediate re-try is always the other projection); if neither axis
    cuts, the zone is a leaf. Terminates because a found cut always
    splits into >=2 strictly smaller non-empty parts (gutters lie
    between occupied intervals)."""
    for _ in range(2):
        if axis == "y":
            cuts = _band_boundaries(runs)
            if cuts:
                bands: list[list] = [[] for _ in range(len(cuts) + 1)]
                for r in runs:
                    k = 0
                    while k < len(cuts) and r[1] < cuts[k]:
                        k += 1
                    bands[k].append(r)
                return [ln for band in bands if band
                        for ln in _xy_lines(band, "x")]
        else:
            bounds = _column_boundaries(runs)
            if bounds:
                cols: list[list] = [[] for _ in range(len(bounds) + 1)]
                for r in runs:
                    k = 0
                    while k < len(bounds) and r[0] >= bounds[k]:
                        k += 1
                    cols[k].append(r)
                return [ln for col in cols if col
                        for ln in _xy_lines(col, "y")]
        axis = "x" if axis == "y" else "y"
    return _leaf_lines(runs)


def layout_lines(runs: list[tuple[float, float, str, float]]) -> list[str]:
    """Runs of one page -> ordered line texts (reading order) by full
    recursive XY-cut:

    1. horizontal band cuts first (y-projection gaps > BAND_GUTTER_MIN),
       so full-width header/footer bands and stacked zones order
       top->bottom before any column logic sees them;
    2. column cuts within a band (x-interval-union projection, gutters
       > GUTTER_MIN) — columns split BEFORE line grouping, since
       clustering on y first would glue same-baseline lines of adjacent
       columns together;
    3. recurse (a column may itself stack zones) until no gutter
       remains, then cluster the leaf zone's runs into lines by y
       (tolerance Y_TOL), ordering bands top->bottom, columns
       left->right, lines top->bottom, runs left->right.
    """
    if not runs:
        return []
    return _xy_lines(runs, "y")


def extract_pdf(data: bytes) -> dict:
    """Whole-document extraction: parse -> per-page layout -> ordered
    spans. Returns {n_pages, n_lines, text, spans} where spans is the
    engine's (kind, text, media_ref, offset) array (offset = char offset
    of the line start in the concatenated text)."""
    streams = page_content_streams(data)
    spans = []
    off = 0
    n_lines = 0
    parts: list[str] = []
    for st in streams:
        for line in layout_lines(text_runs(st)):
            spans.append(
                {"kind": "text", "text": line, "media_ref": None,
                 "offset": off})
            off += len(line)
            parts.append(line)
            n_lines += 1
    return {"n_pages": len(streams), "n_lines": n_lines,
            "text": "".join(parts), "spans": spans}


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

PDF_SCHEMA = StructType([
    StructField("doc_id", LongType(), nullable=False),
    StructField("pdf", BinaryType()),
])

PDF_EXTRACT_SCHEMA = StructType([
    StructField("doc_id", LongType(), nullable=False),
    StructField("n_pages", LongType()),
    StructField("n_lines", LongType()),
    StructField("text", StringType()),
])

PDF_SPANS_SCHEMA = StructType([
    StructField("doc_id", LongType(), nullable=False),
    StructField("spans", ArrayType(StructType([
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]))),
])


def docs_to_pdf(df: DataFrame, two_col_mod: int = 3) -> DataFrame:
    """(doc_id, text) -> (doc_id, pdf bytes). Arrow-batched; layout mode
    is deterministic in doc_id (`doc_id % mod == 0` -> two-column,
    `doc_id % mod == 1` -> banded header + two-column body, else single
    column) so the corpus exercises all three page geometries — and both
    XY-cut steps — on every run."""
    import pandas as pd

    def _gen(batches: Iterator["pd.DataFrame"]):
        for pdf_b in batches:
            blobs = [
                build_pdf(t if isinstance(t, str) else "",
                          two_col=bool(int(d) % two_col_mod == 0),
                          banded=bool(int(d) % two_col_mod == 1))
                for d, t in zip(pdf_b["doc_id"], pdf_b["text"])
            ]
            yield pd.DataFrame({"doc_id": pdf_b["doc_id"].astype("int64"),
                                "pdf": blobs})

    return df.mapInPandas(_gen, schema=PDF_SCHEMA)


def pdf_layout_extract(df: DataFrame) -> DataFrame:
    """(doc_id, pdf) -> (doc_id, n_pages, n_lines, text). The scale shape
    is identical to the HTML kernel: one Arrow-batched map over salted
    partitions, no shuffle, no per-row Python in the plan."""
    import pandas as pd

    def _ex(batches: Iterator["pd.DataFrame"]):
        for pdf_b in batches:
            rows = [extract_pdf(bytes(b) if b is not None else b"")
                    for b in pdf_b["pdf"]]
            yield pd.DataFrame({
                "doc_id": pdf_b["doc_id"].astype("int64"),
                "n_pages": [r["n_pages"] for r in rows],
                "n_lines": [r["n_lines"] for r in rows],
                "text": [r["text"] for r in rows],
            })

    return df.mapInPandas(_ex, schema=PDF_EXTRACT_SCHEMA)


PDF_REF_SPANS_SCHEMA = StructType([
    StructField("media_ref", StringType(), nullable=False),
    StructField("pdf_spans", PDF_SPANS_SCHEMA["spans"].dataType),
])


def pdf_spans_by_ref(df: DataFrame) -> DataFrame:
    """(media_ref, pdf) -> (media_ref, pdf_spans). The media-table-keyed
    variant of pdf_layout_spans, for joining back into interleaved docs."""
    import pandas as pd

    def _ex(batches: Iterator["pd.DataFrame"]):
        for pdf_b in batches:
            spans = [extract_pdf(bytes(b) if b is not None else b"")["spans"]
                     for b in pdf_b["pdf"]]
            yield pd.DataFrame({"media_ref": pdf_b["media_ref"],
                                "pdf_spans": spans})

    return df.mapInPandas(_ex, schema=PDF_REF_SPANS_SCHEMA)


def splice_pdf_spans(
    docs: DataFrame, media: DataFrame, broadcast_media: bool = True
) -> DataFrame:
    """Resolve PDF payloads referenced by interleaved documents: every
    span with kind='media' whose media_ref matches a kind='pdf' media row
    is replaced, inline at its interleave position, by that PDF's layout-
    extracted text spans; all other spans pass through. Offsets are
    renumbered densely over the spliced sequence.

    Scale shape: the PDF corpus is layout-extracted once per distinct
    payload (mapInPandas over the media table — typically orders of
    magnitude smaller than the doc table), then joined to the exploded
    span table. With broadcast_media=True the join is a BroadcastHashJoin
    (no shuffle of the big side); set False at 10^12-doc scale with a
    huge PDF corpus to get a shuffled hash join on media_ref instead.
    The single wide shuffle is the groupBy(doc_id) reassembly.
    """
    pdfs = media.filter(F.col("kind") == "pdf").select(
        "media_ref", F.col("content").alias("pdf"))
    ex = pdf_spans_by_ref(pdfs)
    if broadcast_media:
        ex = F.broadcast(ex)
    sp = docs.select("doc_id", F.explode("spans").alias("s"))
    joined = sp.join(ex, sp["s.media_ref"].eqNullSafe(ex["media_ref"]),
                     "left")
    # replacement sub-array: the pdf's spans, or the original span alone
    sub = F.when(
        (F.col("s.kind") == "media") & F.col("pdf_spans").isNotNull(),
        F.col("pdf_spans"),
    ).otherwise(F.array(F.col("s")))
    # inner posexplode: an empty replacement (0-line PDF) contributes no
    # spans; the doc itself survives via its other spans
    exploded = joined.select(
        "doc_id", F.col("s.offset").alias("pos"),
        F.posexplode(sub).alias("sub_pos", "out"),
    )
    # deterministic reassembly: struct comparison is lexicographic, so
    # sort_array orders by (pos, sub_pos); then renumber offsets densely
    assembled = exploded.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("pos", "sub_pos", "out"))
        ).alias("keyed")
    )
    renum = F.transform(
        F.col("keyed"),
        lambda kv, i: F.struct(
            kv["out"]["kind"].alias("kind"),
            kv["out"]["text"].alias("text"),
            kv["out"]["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return assembled.select("doc_id", renum.alias("spans"))


def pdf_layout_spans(df: DataFrame) -> DataFrame:
    """(doc_id, pdf) -> (doc_id, spans) in the engine's span schema —
    the PDF counterpart of pipeline.extract_df, so PDF documents flow
    into the same downstream sinks/dedup/quality operators as HTML."""
    import pandas as pd

    def _ex(batches: Iterator["pd.DataFrame"]):
        for pdf_b in batches:
            spans = [extract_pdf(bytes(b) if b is not None else b"")["spans"]
                     for b in pdf_b["pdf"]]
            yield pd.DataFrame({"doc_id": pdf_b["doc_id"].astype("int64"),
                                "spans": spans})

    return df.mapInPandas(_ex, schema=PDF_SPANS_SCHEMA)
