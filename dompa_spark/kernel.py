"""Vectorized parse/serialize/extract kernels — the engine's hot path.

Semantics are identical to dompa_spark.oracle (differentially fuzzed in
tests/test_kernel_differential.py); the implementation is different by
design:

- the reference / oracle walk the document char-by-char
  (coordinates.cljc:16-85); here the tokenizer is EVENT-DRIVEN over the
  positions of '<' and '>' found with one numpy scan of the UTF-32
  codepoint buffer, so interpreted work is O(#boundaries), not O(#chars);
- the reference builds trees by O(k²) interval filtering per level
  (coordinates.cljc:169-187); here a single linear stack pass assigns
  parents (valid because unified coordinates are properly nested or
  disjoint — they come from one push/pop stack);
- extraction drop-propagation uses numpy prefix-max over pre-order
  subtree extents instead of per-node ancestor walks.

Everything here is driver/executor-side pure Python+numpy, invoked only
from inside Arrow-batched ``mapInPandas`` (see dompa_spark.pipeline) —
there is no per-row Python UDF anywhere in the Spark plan.

Char positions: the reference indexes by character. We build the numpy
view via UTF-32-LE so indices are codepoint indices, matching the oracle
exactly for any Unicode input.
"""

from __future__ import annotations

import numpy as np

from .constants import (
    ANCHOR_TAG,
    ATTR_TRUE,
    DROP_TAGS,
    HTML_KIND,
    LINK_DENSITY_MAX,
    LINK_DENSITY_TEXT_EXEMPT,
    MD_CONTAINERS,
    MD_HEADINGS,
    MEDIA_KIND,
    MEDIA_SRC_ATTR,
    MEDIA_TAG,
    PARSER_VOID,
    SERIALIZER_VOID,
    TEXT_DENSITY_MIN,
    TEXT_KIND,
    TEXT_NAME,
)

_LT = 60  # '<'
_GT = 62  # '>'
_SP = 32  # ' '
_SLASH = 47  # '/'

_NAME_STRIP = str.maketrans("", "", "</")


def _codepoints(s: str) -> np.ndarray:
    """Codepoint view of s with CHAR indices. ASCII fast path: a uint8
    view costs 1/4 the memory bandwidth and byte indices == char indices;
    only non-ASCII strings pay for the UTF-32 expansion. All boundary
    constants (_LT etc.) are < 128, valid in both dtypes."""
    if s.isascii():
        return np.frombuffer(s.encode("ascii"), dtype=np.uint8)
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


# ---------------------------------------------------------------------------
# Tokenizer (event-driven equivalent of the reference compose FSM)
# ---------------------------------------------------------------------------

def compose_coords(
    s: str,
    cp: np.ndarray | None = None,
    bnd: np.ndarray | None = None,
) -> list[tuple[int, int]]:
    """Inclusive [start, end] coordinates, identical to oracle.compose.

    Walks only boundary ('<'/'>') positions; the full FSM clause table
    (SURVEY.md §2.2.1) collapses to the transitions below because between
    boundaries only the no-op clause can fire (after the one clause-1
    classification char following each reset, handled via `reset_pos`).
    """
    n = len(s)
    if n == 0:
        return []
    if cp is None:
        cp = _codepoints(s)
    if bnd is None:
        bnd = np.flatnonzero((cp == _LT) | (cp == _GT))
    coords: list[tuple[int, int]] = []
    # states: 0 = undecided (clause 1 pending at reset_pos+1), 1 = text,
    # 2 = tag
    state = 0
    start = 0
    reset_pos = -1
    is_lt = (cp[bnd] == _LT).tolist()
    for e, lt in zip(bnd.tolist(), is_lt):
        if state == 0:
            nxt = reset_pos + 1
            if nxt == e:
                # clause 1 fires on the boundary char itself -> tag
                state = 2
                start = e
                continue
            # clause 1 fired earlier on a non-boundary char -> text
            state = 1
            start = nxt
        if state == 1:
            if lt:
                coords.append((start, e - 1))  # clause 2
                state = 2
                start = e
            else:
                coords.append((start, e))  # clause 6 (or 3 at last idx)
                state = 0
                reset_pos = e
        else:  # state == 2 (tag)
            if lt:
                coords.append((start, e - 1))  # clause 4: truncated tag
                start = e
            else:
                coords.append((start, e))  # clause 6
                state = 0
                reset_pos = e
    if state == 0:
        # pending clause 1 after the last reset: a text run survives only
        # if at least TWO chars remain (clause 1 consumes one, clause 3
        # needs a later char — single trailing chars are dropped, Q2)
        nxt = reset_pos + 1
        if nxt <= n - 2:
            coords.append((nxt, n - 1))
    # state 2 at end: unterminated tag emits nothing
    return coords


# ---------------------------------------------------------------------------
# Flat document: parse = classify + unify + tree in one pass
# ---------------------------------------------------------------------------

class FlatDoc:
    """Flat pre-order DOM encoding of one parsed document.

    Parallel arrays (length = node count, pre-order/document order):
      name[i]   : tag name str, or TEXT_NAME
      parent[i] : parent index, -1 for roots
      depth[i]  : nesting depth
      ext[i]    : pre-order index one past i's subtree (i+1 for leaves)
      value[i]  : verbatim text (text nodes) or None
      attrs[i]  : ordered dict {key: str|True} for elements, None for text
    """

    __slots__ = ("name", "parent", "depth", "ext", "value", "attrs")

    def __init__(self, name, parent, depth, ext, value, attrs):
        self.name = name
        self.parent = parent
        self.depth = depth
        self.ext = ext
        self.value = value
        self.attrs = attrs

    def __len__(self):
        return len(self.name)


def _tag_name(s: str, start: int, end_excl: int, name_stop: int) -> str:
    """coordinates->tag-name semantics: over the END-EXCLUSIVE slice
    s[start:end_excl], take chars up to the first space/'>' (precomputed
    as name_stop), then remove ALL '<' and '/' chars.

    Fast path: the leading char is always '<' (callers only pass tag
    tokens); a closer's second char is '/'. Interior '<'/'/' are rare, so
    slice past the prefix and only fall back to translate when needed."""
    stop = name_stop if name_stop < end_excl else end_excl
    skip = start + 1
    if skip < stop and s[skip] == "/":
        skip += 1
    piece = s[skip:stop]
    if "/" in piece or "<" in piece:
        return piece.translate(_NAME_STRIP)
    return piece


# Fast-path shape: well-formed `key` / `key="value"` tokens separated by
# single spaces, where keys contain no whitespace/quote/'=' and values do
# not END with '=' (a value ending in '=' changes the slow FSM's
# closing-quote clause — see the prev-char guard in the reference FSM at
# coordinates.cljc:254-258). Anything else falls back to the exact FSM.
import re as _re

_ATTR_TOKEN = r'[^\s"=]+(?:="(?:[^"]*[^"=])?")?'
_ATTR_FAST = _re.compile(rf"{_ATTR_TOKEN}(?: {_ATTR_TOKEN})*\Z")
_ATTR_FIND = _re.compile(_ATTR_TOKEN)


def _parse_attrs(s: str, start: int, gt_pos: int) -> dict:
    """Attribute map for the element whose outer HTML starts at `start`;
    gt_pos = position of the first '>' at/after start (or len(s)).

    Reproduces html->attrs-html + the quote-aware splitting FSM +
    normalize/parse (coordinates.cljc:200-314), including Q4-Q6 and Q15.
    """
    seg = s[start + 1 : gt_pos]
    if seg:
        first_is_space = seg[0] == " "
        i = 0
        m = len(seg)
        while i < m and (seg[i] == " ") == first_is_space:
            i += 1
        seg = seg[i:]
    seg = seg.strip()
    if seg.endswith("/"):
        seg = seg[:-1]
    attrs: dict = {}
    m = len(seg)
    if m == 0:
        return attrs
    if _ATTR_FAST.match(seg):
        for raw in _ATTR_FIND.findall(seg):
            k, sep, v = raw.partition("=")
            attrs[k] = True if sep == "" else v[1:-1]
        return attrs
    pos = 0
    has = False
    last = m - 1
    raw_parts = []
    idx = 0
    while idx < m:
        c = seg[idx]
        if idx == last:
            raw_parts.append(seg[pos : idx + 1])
        elif c == " " and not has:
            raw_parts.append(seg[pos:idx])
            pos = idx + 1
        elif c == "=" and seg[idx + 1] == '"':
            has = True
        elif (
            c == '"'
            and has
            and (idx == 0 or seg[idx - 1] != "=")
            and (idx + 1 >= m or seg[idx + 1] == " ")
        ):
            raw_parts.append(seg[pos : idx + 1])
            pos = idx + 1
            has = False
        idx += 1
    for raw in raw_parts:
        if raw.strip() == "":
            continue
        k, sep, v = raw.partition("=")
        if sep == "":
            attrs[k] = True
        elif v.startswith('"'):
            q = v.find('"', 1)
            attrs[k] = v[1:] if q < 0 else v[1:q]
        else:
            attrs[k] = v
    return attrs


def parse_flat(s: str) -> FlatDoc:
    """compose ∘ unify ∘ tree-build in one combined pass -> FlatDoc."""
    if s:
        cp = _codepoints(s)
        # one scan of the buffer for all three marker classes; the
        # tokenizer ('<'/'>'), name-stop (' '/'>') and attr-segment ('>')
        # position arrays are derived from the combined hit list — a
        # third of the memory traffic of three separate flatnonzero scans
        marks = np.flatnonzero((cp == _LT) | (cp == _GT) | (cp == _SP))
        mvals = cp[marks]
        bnd = marks[mvals != _SP]
    else:
        cp = None
        bnd = None
    coords = compose_coords(s, cp, bnd)
    if not coords:
        return FlatDoc([], np.empty(0, np.int32), np.empty(0, np.int32),
                       np.empty(0, np.int32), [], [])
    n = len(s)
    starts = np.fromiter((c[0] for c in coords), np.int64, len(coords))
    # stop position for names: first ' ' or '>' at/after each start
    stops_sp = marks[mvals != _LT]
    name_stop = np.full(len(coords), n, np.int64)
    j = np.searchsorted(stops_sp, starts)
    valid = j < len(stops_sp)
    name_stop[valid] = stops_sp[j[valid]]
    # first '>' at/after each start (for attr segment extraction)
    gts = marks[mvals == _GT]
    gt_pos = np.full(len(coords), n, np.int64)
    j = np.searchsorted(gts, starts)
    valid = j < len(gts)
    gt_pos[valid] = gts[j[valid]]

    first = cp[starts]
    has2 = starts + 1 < len(cp)
    second = np.zeros(len(coords), np.uint32)
    second[has2] = cp[starts[has2] + 1]

    # --- unify: stack matcher over classified tokens -----------------------
    # unified entries: (start, end, name_or_None, name_stop, gt)
    stack: list[tuple[str, int, int, int]] = []  # (name, start, stop, gt)
    unified: list[tuple[int, int, str | None, int, int]] = []
    name_stop_l = name_stop.tolist()
    gt_pos_l = gt_pos.tolist()
    first_l = (first == _LT).tolist()
    second_slash = (second == _SLASH).tolist()
    for i, (cs, ce) in enumerate(coords):
        if first_l[i]:
            is_closing = ce > cs and second_slash[i]
            name = _tag_name(s, cs, ce, name_stop_l[i])
            if is_closing:
                if stack and stack[-1][0] == name:
                    oname, ostart, ostop, ogt = stack.pop()
                    unified.append((ostart, ce, oname, ostop, ogt))
            elif name in PARSER_VOID:
                unified.append((cs, ce, name, name_stop_l[i], gt_pos_l[i]))
            else:
                stack.append((name, cs, name_stop_l[i], gt_pos_l[i]))
        else:
            unified.append((cs, ce, None, -1, -1))
    if not unified:
        return FlatDoc([], np.empty(0, np.int32), np.empty(0, np.int32),
                       np.empty(0, np.int32), [], [])
    unified.sort(key=lambda u: u[0])

    # --- tree build: linear parent-assignment stack ------------------------
    m = len(unified)
    names: list[str] = []
    values: list[str | None] = []
    attrs_out: list[dict | None] = []
    parent = np.empty(m, np.int32)
    depth = np.empty(m, np.int32)
    ext = np.empty(m, np.int32)
    open_stack: list[tuple[int, int]] = []  # (end, node_idx)
    for i, (us, ue, uname, ustop, ugt) in enumerate(unified):
        while open_stack and us > open_stack[-1][0]:
            ext[open_stack.pop()[1]] = i
        parent[i] = open_stack[-1][1] if open_stack else -1
        depth[i] = len(open_stack)
        if uname is None:
            # text node — but ->nodes re-derives the name from the outer
            # html (html-str->node-name): a text token starting with '<'
            # cannot exist (tokens starting '<' are tags), so TEXT always
            names.append(TEXT_NAME)
            values.append(s[us : ue + 1])
            attrs_out.append(None)
        else:
            # element: name per html-str->node-name — chars after '<' up
            # to first space/'>' WITHOUT removing '/' (it differs from the
            # unify-side tag name only for pathological inputs)
            stop = min(ustop, ue + 1)
            names.append(s[us + 1 : stop])
            values.append(None)
            # no chars between the name stop and '>' -> no attr segment
            # (identical to _parse_attrs stripping the name to ""):
            # skips the call for the common attribute-less element
            gt = min(ugt, ue + 1)
            attrs_out.append(
                {} if ustop >= gt else _parse_attrs(s, us, gt)
            )
            open_stack.append((ue, i))
    while open_stack:
        ext[open_stack.pop()[1]] = m
    return FlatDoc(names, parent, depth, ext, values, attrs_out)


# ---------------------------------------------------------------------------
# Serializer (nodes.cljc:15-41,69-93 semantics over the flat encoding)
# ---------------------------------------------------------------------------

def serialize_flat(doc: FlatDoc, void_nodes=SERIALIZER_VOID) -> str:
    """Flat pre-order -> HTML string. Iterative stack emit, list-join.

    Mirrors oracle.to_html for parser-produced trees (no fragments/None
    nodes can appear in a FlatDoc; those are authoring-DSL concerns).
    """
    parts: list[str] = []
    close_stack: list[tuple[int, str]] = []  # (ext, "</name>")
    n = len(doc)
    for i in range(n):
        while close_stack and close_stack[-1][0] == i:
            parts.append(close_stack.pop()[1])
        name = doc.name[i]
        if name == TEXT_NAME:
            parts.append(doc.value[i])
            continue
        a = doc.attrs[i]
        if a:
            abuf = []
            for k, v in a.items():
                if v is True:
                    abuf.append(f" {k}")
                else:
                    abuf.append(f' {k}="{v}"')
            astr = "".join(abuf)
        else:
            astr = ""
        if name in void_nodes:
            parts.append(f"<{name}{astr}>")
        elif doc.ext[i] == i + 1:
            parts.append(f"<{name}{astr}></{name}>")
        else:
            parts.append(f"<{name}{astr}>")
            close_stack.append((doc.ext[i], f"</{name}>"))
    while close_stack:
        parts.append(close_stack.pop()[1])
    return "".join(parts)


# ---------------------------------------------------------------------------
# Extraction (constants.py frozen spec) over the flat encoding
# ---------------------------------------------------------------------------

def extract_flat(doc: FlatDoc) -> list[tuple[str, str | None, str | None]]:
    """Whitelist -> bottom-up text-density -> bottom-up link-density ->
    span emission. Returns (kind, text, media_ref) tuples in doc order."""
    n = len(doc)
    if n == 0:
        return []
    names = doc.name
    values = doc.value
    is_text = [nm == TEXT_NAME for nm in names]
    is_img = [nm == MEDIA_TAG for nm in names]
    ext = doc.ext.tolist()
    parent = doc.parent.tolist()

    # Pass 1 (whitelist drop, [j, ext[j]) per match) and in_a (any STRICT
    # 'a' ancestor: an 'a' at j covers (j, ext[j])) as one scalar sweep —
    # running prefix-max; in pre-order any j < i is either an ancestor
    # (ext[j] > i) or a completed earlier subtree (ext[j] <= i).
    alive = [True] * n
    in_a = [False] * n
    drop_until = 0
    a_until = 0
    for i in range(n):
        if a_until > i:
            in_a[i] = True
        if not is_text[i]:
            nm = names[i]
            if nm in DROP_TAGS or nm.startswith("!--"):
                e = ext[i]
                if e > drop_until:
                    drop_until = e
            elif nm == ANCHOR_TAG:
                e = ext[i]
                if e > a_until:
                    a_until = e
        if drop_until > i:
            alive[i] = False

    own_text = [len(values[i]) if is_text[i] else 0 for i in range(n)]

    def bottom_up(decide_td: bool) -> None:
        """Reverse pre-order sweep with per-node accumulators; decisions
        for deeper nodes land before ancestors are scored (constants.py).
        Plain-list arithmetic: numpy scalar indexing is ~10x slower here."""
        text_c = [0] * n
        elem_c = [0] * n
        anchor_c = [0] * n
        has_img = [False] * n
        for i in range(n - 1, -1, -1):
            if not alive[i]:
                continue
            t_i = is_text[i]
            if not t_i:
                img_i = is_img[i] or has_img[i]
                if decide_td:
                    if text_c[i] < TEXT_DENSITY_MIN * (elem_c[i] + 1) and not img_i:
                        alive[i] = False
                        continue
                else:
                    tc = text_c[i]
                    if (
                        anchor_c[i] > LINK_DENSITY_MAX * (tc if tc > 0 else 1)
                        and tc < LINK_DENSITY_TEXT_EXEMPT
                    ):
                        alive[i] = False
                        continue
            p = parent[i]
            if p >= 0:
                ot = own_text[i]
                text_c[p] += text_c[i] + ot
                if in_a[i]:
                    anchor_c[p] += anchor_c[i] + ot
                else:
                    anchor_c[p] += anchor_c[i]
                if t_i:
                    elem_c[p] += elem_c[i]
                else:
                    elem_c[p] += elem_c[i] + 1
                    if is_img[i] or has_img[i]:
                        has_img[p] = True
        # propagate ancestor drops top-down
        for i in range(n):
            p = parent[i]
            if p >= 0 and not alive[p]:
                alive[i] = False

    bottom_up(True)   # pass 2: text density
    bottom_up(False)  # pass 3: link density

    out: list[tuple[str, str | None, str | None]] = []
    for i in range(n):
        if not alive[i]:
            continue
        if is_text[i]:
            v = values[i]
            if v.strip() == "":
                continue
            out.append((TEXT_KIND, v, None))
        elif is_img[i]:
            src = doc.attrs[i].get(MEDIA_SRC_ATTR)
            out.append((MEDIA_KIND, None, src if isinstance(src, str) else None))
    return out


# ---------------------------------------------------------------------------
# Nested-tree view + traverse (the reference's rewrite surface,
# nodes.cljc:43-55) — the engine's "user-defined rewrite" path. Slower than
# the flat kernels by design: the caller supplies arbitrary per-node Python.
# ---------------------------------------------------------------------------

def flat_to_nested(doc: FlatDoc) -> list[dict]:
    """FlatDoc -> oracle-style nested dicts (presence semantics preserved:
    text nodes have 'value' and no 'attrs'; elements always have 'attrs';
    'children' present only when non-empty)."""
    n = len(doc)
    nodes: list[dict] = []
    for i in range(n):
        if doc.name[i] == TEXT_NAME:
            nodes.append({"name": TEXT_NAME, "value": doc.value[i]})
        else:
            nodes.append({"name": doc.name[i], "attrs": doc.attrs[i]})
    roots: list[dict] = []
    parent = doc.parent
    for i in range(n):
        p = parent[i]
        if p < 0:
            roots.append(nodes[i])
        else:
            nodes[p].setdefault("children", []).append(nodes[i])
    return roots


def traverse(nodes, fn):
    """Pre-order rewrite over nested nodes; returning None deletes the
    subtree. Mirrors nodes.cljc:43-55 including Q9 (every surviving node,
    text leaves included, gains a 'children' key)."""
    updated = []
    for node in nodes or []:
        new_node = fn(node)
        if new_node is None:
            continue
        new_node = dict(new_node)
        new_node["children"] = traverse(new_node.get("children"), fn)
        updated.append(new_node)
    return updated


def serialize_nodes(nodes, void_nodes=SERIALIZER_VOID) -> str:
    """Serialize nested nodes (nodes.cljc:15-41,69-93): None resets the
    accumulator (Q8); fragments splice; custom void set applies only at
    this depth (Q10); no escaping anywhere (Q7)."""
    parts: list[str] = []
    for node in nodes or []:
        if node is None:
            parts = []
            continue
        name = node["name"]
        if name == ":<>":
            parts.append(serialize_nodes(node.get("children")))
            continue
        if name == TEXT_NAME:
            parts.append(node.get("value", ""))
            continue
        a = node.get("attrs")
        if a:
            astr = "".join(
                f" {k}" if v is True else f' {k}="{v}"' for k, v in a.items()
            )
        else:
            astr = ""
        if name in void_nodes:
            parts.append(f"<{name}{astr}>")
        else:
            inner = serialize_nodes(node.get("children"))
            parts.append(f"<{name}{astr}>{inner}</{name}>")
    return "".join(parts)


def extract_document_cols(kinds, texts, media_refs, offsets):
    """Columnar per-document kernel: parallel lists in, (kinds, texts,
    media_refs) lists out (output offsets are dense 0..k-1 by position).
    This is the Arrow-boundary shape — no per-span dicts anywhere."""
    order = sorted(range(len(kinds)), key=lambda i: (offsets[i], i))
    ok: list[str] = []
    ot: list[str | None] = []
    om: list[str | None] = []
    for i in order:
        kind = kinds[i]
        if kind == HTML_KIND:
            for k, t, m in extract_flat(parse_flat(texts[i] or "")):
                ok.append(k)
                ot.append(t)
                om.append(m)
        elif kind == TEXT_KIND:
            ok.append(TEXT_KIND)
            ot.append(texts[i])
            om.append(None)
        else:
            ok.append(MEDIA_KIND)
            ot.append(None)
            om.append(media_refs[i])
    return ok, ot, om


def extract_document(spans_in) -> list[dict]:
    """Per-document kernel: same contract as oracle.extract_document.

    spans_in: iterable of {kind, text, media_ref, offset} dicts.
    """
    spans_in = list(spans_in)
    ok, ot, om = extract_document_cols(
        [s["kind"] for s in spans_in],
        [s["text"] for s in spans_in],
        [s["media_ref"] for s in spans_in],
        [s["offset"] for s in spans_in],
    )
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(zip(ok, ot, om))
    ]


# ---------------------------------------------------------------------------
# Markdown rendering (constants.py "Markdown rendering" spec)
# ---------------------------------------------------------------------------

def _md_attr(node: dict, key: str) -> str:
    """Attribute as markdown target text: string value verbatim,
    boolean/missing -> '' (never the ATTR_TRUE sentinel)."""
    v = (node.get("attrs") or {}).get(key)
    return v if isinstance(v, str) else ""


def _md_inline(nodes) -> str:
    """Inline rendering: emphasis/code/link/image/br per the spec;
    unknown elements are transparent; DROP_TAGS subtrees vanish; empty
    emphasis wraps to '' (never bare markers); no escaping (Q7)."""
    parts: list[str] = []
    for n in nodes or []:
        name = n["name"]
        if name == TEXT_NAME:
            parts.append(n.get("value") or "")
            continue
        if name in DROP_TAGS or name.startswith("!--"):
            continue
        if name in ("b", "strong"):
            s = _md_inline(n.get("children"))
            parts.append(f"**{s}**" if s else "")
        elif name in ("i", "em"):
            s = _md_inline(n.get("children"))
            parts.append(f"*{s}*" if s else "")
        elif name == "code":
            s = _md_inline(n.get("children"))
            parts.append(f"`{s}`" if s else "")
        elif name == ANCHOR_TAG:
            parts.append(
                f"[{_md_inline(n.get('children'))}]({_md_attr(n, 'href')})"
            )
        elif name == MEDIA_TAG:
            parts.append(
                f"![{_md_attr(n, 'alt')}]({_md_attr(n, MEDIA_SRC_ATTR)})"
            )
        elif name == "br":
            parts.append("\n")
        else:
            parts.append(_md_inline(n.get("children")))
    return "".join(parts)


def _md_rawtext(nodes) -> str:
    """ALL descendant text nodes, unstripped, concatenated (the <pre>
    body contract — markup inside a code block contributes only its
    text)."""
    parts: list[str] = []
    for n in nodes or []:
        if n["name"] == TEXT_NAME:
            parts.append(n.get("value") or "")
        elif n["name"] in DROP_TAGS or n["name"].startswith("!--"):
            continue
        else:
            parts.append(_md_rawtext(n.get("children")))
    return "".join(parts)


def _md_flush(blocks: list[str], pend: list[str]) -> None:
    s = "".join(pend).strip()
    pend.clear()
    if s:
        blocks.append(s)


def _md_table_rows(table: dict):
    """DIRECT <tr> children of the table or of its DIRECT
    thead/tbody/tfoot children (the td/th -> tr -> table parent-chain
    discipline of extract_tables_df)."""
    rows = []
    for c in table.get("children") or []:
        if c["name"] == "tr":
            rows.append(c)
        elif c["name"] in ("thead", "tbody", "tfoot"):
            rows.extend(
                cc for cc in c.get("children") or [] if cc["name"] == "tr"
            )
    return rows


def _md_walk(nodes, blocks: list[str], pend: list[str]) -> None:
    for n in nodes or []:
        name = n["name"]
        if name == TEXT_NAME:
            pend.append(n.get("value") or "")
            continue
        if name in DROP_TAGS or name.startswith("!--"):
            continue
        if name in MD_HEADINGS:
            _md_flush(blocks, pend)
            txt = _md_inline(n.get("children")).strip()
            blocks.append((("#" * int(name[1])) + " " + txt).rstrip())
        elif name == "p":
            _md_flush(blocks, pend)
            txt = _md_inline(n.get("children")).strip()
            if txt:
                blocks.append(txt)
        elif name == "blockquote":
            _md_flush(blocks, pend)
            txt = _md_inline(n.get("children")).strip()
            if txt:
                blocks.append("> " + txt)
        elif name in ("ul", "ol"):
            _md_flush(blocks, pend)
            lines = []
            for i, li in enumerate(
                c for c in n.get("children") or [] if c["name"] == "li"
            ):
                marker = f"{i + 1}. " if name == "ol" else "- "
                lines.append(marker + _md_inline(li.get("children")).strip())
            if lines:
                blocks.append("\n".join(lines))
        elif name == "pre":
            _md_flush(blocks, pend)
            blocks.append("```\n" + _md_rawtext(n.get("children")) + "\n```")
        elif name == "hr":
            _md_flush(blocks, pend)
            blocks.append("---")
        elif name == "table":
            _md_flush(blocks, pend)
            lines = []
            for tr in _md_table_rows(n):
                cells = [
                    c for c in tr.get("children") or []
                    if c["name"] in ("td", "th")
                ]
                if not cells:
                    continue
                lines.append(
                    "| "
                    + " | ".join(
                        _md_inline(c.get("children")).strip() for c in cells
                    )
                    + " |"
                )
                if len(lines) == 1:
                    lines.append("|" + " --- |" * len(cells))
            if lines:
                blocks.append("\n".join(lines))
        elif name in MD_CONTAINERS:
            _md_flush(blocks, pend)
            _md_walk(n.get("children"), blocks, pend)
            _md_flush(blocks, pend)
        else:
            pend.append(_md_inline([n]))


def markdown_blocks(html: str) -> list[str]:
    """Parse `html` with the real parser and render the spec's markdown
    block list (constants.py "Markdown rendering")."""
    blocks: list[str] = []
    pend: list[str] = []
    _md_walk(flat_to_nested(parse_flat(html or "")), blocks, pend)
    _md_flush(blocks, pend)
    return blocks


def markdown_document_cols(kinds, texts, media_refs, offsets) -> list[str]:
    """Columnar per-document markdown kernel: parallel span lists in
    (the extract_document_cols Arrow-boundary shape), block list out.
    html spans render via markdown_blocks; text spans become one
    stripped paragraph block; media spans become '![](media_ref)'."""
    order = sorted(range(len(kinds)), key=lambda i: (offsets[i], i))
    blocks: list[str] = []
    for i in order:
        kind = kinds[i]
        if kind == HTML_KIND:
            blocks.extend(markdown_blocks(texts[i]))
        elif kind == TEXT_KIND:
            s = (texts[i] or "").strip()
            if s:
                blocks.append(s)
        else:
            blocks.append(f"![]({media_refs[i] or ''})")
    return blocks
