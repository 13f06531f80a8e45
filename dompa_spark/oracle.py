"""Char-exact pure-Python oracle for the reference parser semantics.

This module is the test-side ground truth: a deliberately slow, obviously
correct, character-at-a-time transcription of the reference's semantics
(askonomm/dompa, read at /root/reference — Clojure; re-expressed from its
behavior, not copied). Every function cites the reference file:line whose
behavior it reproduces. The vectorized kernel (dompa_spark.kernel) is
differentially tested against this module; Spark never imports it on the
hot path.

Node representation (mirrors the reference's maps, with presence/absence
of keys preserved):
    text node    : {"name": TEXT_NAME, "value": <verbatim substring>}
    element node : {"name": <tag>, "attrs": {k: v|True, ...} (ordered)}
                   plus "children": [node...] ONLY when non-empty
    fragment     : {"name": FRAGMENT_NAME, "children": [...]}

Quirks Q1-Q14 (SURVEY.md §2.7) are reproduced on purpose, with one
documented divergence: attribute maps preserve insertion order at ANY size
(the reference scrambles order above 8 attrs via Clojure hash-maps; Q13).
"""

from __future__ import annotations

from .constants import (
    ANCHOR_TAG,
    DROP_TAGS,
    FRAGMENT_NAME,
    HTML_KIND,
    LINK_DENSITY_MAX,
    LINK_DENSITY_TEXT_EXEMPT,
    MEDIA_KIND,
    MEDIA_SRC_ATTR,
    MEDIA_TAG,
    PARSER_VOID,
    SERIALIZER_VOID,
    TEXT_DENSITY_MIN,
    TEXT_KIND,
    TEXT_NAME,
)

Coord = tuple[int, int]


# ---------------------------------------------------------------------------
# Tokenizer — reference compose FSM (coordinates.cljc:16-85)
# ---------------------------------------------------------------------------

def compose(html: str) -> list[Coord]:
    """Single-pass char FSM -> inclusive [start, end] coordinates.

    Clause order reproduces coordinates.cljc:20-63 exactly (earlier clauses
    win); see SURVEY.md §2.2.1 for the transition table.
    """
    n = len(html)
    char_type: str | None = None  # None | "text" | "tag"
    start = 0
    coords: list[Coord] = []
    for idx, c in enumerate(html):
        if char_type is None:
            # clause 1: undecided -> classify; never emits (drops 1-char tails, Q2)
            char_type = "tag" if c in "<>" else "text"
            start = idx
        elif char_type == "text" and c == "<":
            # clause 2: text ended, tag begins
            coords.append((start, idx - 1))
            char_type = "tag"
            start = idx
        elif char_type == "text" and idx == n - 1:
            # clause 3: text ended by end of input (inclusive of last char)
            coords.append((start, idx))
            char_type = None
            start = idx
        elif char_type == "tag" and c == "<":
            # clause 4: new tag while in tag -> emit truncated coordinate
            coords.append((start, idx - 1))
            char_type = "tag"
            start = idx
        # clause 5 (tag-starts?) is unreachable (Q1) — omitted
        elif c == ">":
            # clause 6: fires in ANY remaining state, including text (Q3)
            coords.append((start, idx))
            char_type = None
            start = idx
        # clause 7: else no-op
    return coords


# ---------------------------------------------------------------------------
# Classification + stack unification (coordinates.cljc:87-167)
# ---------------------------------------------------------------------------

def tag_name(html: str, coord: Coord) -> str:
    """coordinates->tag-name (coordinates.cljc:87-103).

    NOTE: uses the END-EXCLUSIVE slice html[start:end] — the final char of
    the coordinate is deliberately dropped. Then take-while not in
    {space, '>'} over that prefix, then remove ALL '<' and '/' chars.
    Only a literal space terminates the name (Q4).
    """
    start, end = coord
    value = html[start:end]
    if not value.startswith("<"):
        return value
    taken = []
    for ch in value:
        if ch == " " or ch == ">":
            break
        if ch == "<" or ch == "/":
            continue
        taken.append(ch)
    return "".join(taken)


def coordinate_info(html: str, coord: Coord) -> tuple[str, str]:
    """coordinate-info (coordinates.cljc:105-117) -> (type, name)."""
    start, end = coord
    value = html[start : end + 1]
    if value.startswith("</"):
        return ("closing", tag_name(html, coord))
    if value.startswith("<"):
        return ("opening", tag_name(html, coord))
    return ("text", TEXT_NAME)


def unify(html: str, coords: list[Coord]) -> list[Coord]:
    """Stack matcher (coordinates.cljc:123-167).

    Opening tag: void -> passes through as-is; else pushed. Closing tag:
    pops ONLY if it matches the stack top, else it is dropped (no recovery
    scan, Q11). Leftover unmatched openers are discarded wholesale.
    Result sorted (stably) by start index.
    """
    stack: list[tuple[str, int]] = []
    unified: list[Coord] = []
    for start, end in coords:
        ctype, cname = coordinate_info(html, (start, end))
        if ctype == "opening":
            if cname in PARSER_VOID:
                unified.append((start, end))
            else:
                stack.append((cname, start))
        elif ctype == "closing":
            if stack and stack[-1][0] == cname:
                _, open_start = stack.pop()
                unified.append((open_start, end))
        else:
            unified.append((start, end))
    return sorted(unified, key=lambda c: c[0])


# ---------------------------------------------------------------------------
# Attribute parsing (coordinates.cljc:200-314)
# ---------------------------------------------------------------------------

def attrs_html_of(html: str) -> str:
    """html->attrs-html (coordinates.cljc:265-288).

    From the node's outer HTML: chars after '<' up to (not incl.) first '>',
    drop the first space-run-delimited token (the tag name), trim, then
    strip exactly one trailing '/'.
    """
    inner = html[1:]
    gt = inner.find(">")
    s = inner if gt < 0 else inner[:gt]
    if s:
        # partition-by (= char space), drop the FIRST run (only literal
        # space delimits, Q4)
        first_is_space = s[0] == " "
        i = 0
        while i < len(s) and (s[i] == " ") == first_is_space:
            i += 1
        s = s[i:]
    s = s.strip()
    if s.endswith("/"):
        s = s[:-1]
    return s


def split_attrs(attrs_html: str) -> list[str]:
    """html->str->node-attrs-reducer-fn (coordinates.cljc:225-263).

    Char FSM splitting on spaces outside double-quoted values. Clause order
    matters: end-of-string collection wins over everything.
    """
    n = len(attrs_html)
    start = 0
    has_attrs = False
    attrs: list[str] = []
    for idx, c in enumerate(attrs_html):
        if idx + 1 == n:
            # end of attrs-html: collect whatever is left
            attrs.append(attrs_html[start : idx + 1])
            start = 0
        elif c == " " and not has_attrs:
            attrs.append(attrs_html[start:idx])
            start = idx + 1
        elif c == "=" and attrs_html[idx + 1] == '"':
            has_attrs = True
        elif (
            c == '"'
            and (idx == 0 or attrs_html[idx - 1] != "=")
            and (idx + 1 >= n or attrs_html[idx + 1] == " ")
            and has_attrs
        ):
            attrs.append(attrs_html[start : idx + 1])
            start = idx + 1
            has_attrs = False
        # else: no-op
    return attrs


def normalize_attr_value(v: str) -> str:
    """normalize-html-attr-str (coordinates.cljc:206-214).

    Only values STARTING with a double quote are unquoted (up to the next
    double quote); single-quoted values keep their quotes (Q5).
    """
    if v.startswith('"'):
        inner = v[1:]
        q = inner.find('"')
        return inner if q < 0 else inner[:q]
    return v


def parse_attrs(html: str):
    """html-str->node-attrs (coordinates.cljc:290-314).

    Returns None for text (non-'<') nodes; an ordered dict otherwise.
    Boolean attrs map to True. Duplicate keys: last value wins but the key
    keeps its first position (Clojure array-map assoc semantics, Q6/Q13).
    """
    if not html.startswith("<"):
        return None
    attrs: dict[str, object] = {}
    for raw in split_attrs(attrs_html_of(html)):
        if raw.strip() == "":  # (remove str/blank?)
            continue
        k, sep, v = raw.partition("=")
        attrs[k] = True if sep == "" else normalize_attr_value(v)
    return attrs


# ---------------------------------------------------------------------------
# Tree construction (coordinates.cljc:169-350)
# ---------------------------------------------------------------------------

def node_name_of(html: str) -> str:
    """html-str->node-name (coordinates.cljc:189-198).

    NOTE: unlike tag_name, does NOT remove '/' — a closing-tag outer HTML
    would yield a name starting with '/'. Only space/'>' terminate (Q4).
    """
    if not html.startswith("<"):
        return TEXT_NAME
    inner = html[1:]
    taken = []
    for ch in inner:
        if ch == " " or ch == ">":
            break
        taken.append(ch)
    return "".join(taken)


def construct_node(node_html: str, node_children):
    """construct-node (coordinates.cljc:316-325)."""
    name = node_name_of(node_html)
    attrs = parse_attrs(node_html)
    node: dict = {"name": name}
    if name == TEXT_NAME:
        node["value"] = node_html
    if attrs is not None:
        node["attrs"] = attrs
    if node_children is not None:
        node["children"] = node_children
    return node


def to_nodes(html: str, coords: list[Coord]):
    """->nodes (coordinates.cljc:327-350): recursive interval containment.

    Returns None for empty coords (reference `when`), else a list of nodes.
    children = strictly contained coords; remaining = all except the parent
    itself (from == parent-from) and the strictly contained ones.
    """
    if not coords:
        return None
    coords = sorted(coords, key=lambda c: c[0])
    # The reference recurses for the sibling tail too
    # (coordinates.cljc:349); that makes Python recursion depth O(#siblings)
    # and overflows on wide documents, so the tail recursion is unrolled
    # into a loop — output is element-wise identical.
    out = []
    while coords:
        pf, pt = coords[0]
        kids = sorted(
            [c for c in coords if pf < c[0] and pt > c[1]], key=lambda c: c[0]
        )
        remaining = [
            c for c in coords if not (c[0] == pf or (c[0] > pf and c[1] < pt))
        ]
        node_html = html[pf : pt + 1]
        out.append(construct_node(node_html, to_nodes(html, kids)))
        coords = remaining
    return out


def parse(html: str):
    """html/->nodes (html.cljc:13-19): compose ∘ unify ∘ ->nodes.

    Returns a list of nodes ([] when the document parses to nothing —
    the reference returns nil; callers treat both as empty).
    """
    nodes = to_nodes(html, unify(html, compose(html)))
    return nodes if nodes is not None else []


# ---------------------------------------------------------------------------
# Serialization (nodes.cljc:5-93) and traversal (nodes.cljc:43-55)
# ---------------------------------------------------------------------------

def _render_attrs(attrs) -> str:
    """node-attrs-reducer (nodes.cljc:9-13): no escaping anywhere (Q7)."""
    out = []
    for k, v in (attrs or {}).items():
        if v is True:
            out.append(f" {k}")
        else:
            out.append(f' {k}="{v}"')
    return "".join(out)


def to_html(nodes, void_nodes=SERIALIZER_VOID) -> str:
    """->html (nodes.cljc:15-41,69-93).

    A None node mid-vector RESETS the accumulator to "" (Q8). A custom
    void_nodes set applies only at this call's depth; recursion into
    children always uses the default set (Q10).
    """
    html = ""
    for node in nodes or []:
        if node is None:
            html = ""
            continue
        name = node["name"]
        if name == FRAGMENT_NAME:
            html += to_html(node.get("children"))
            continue
        if name == TEXT_NAME:
            html += node.get("value", "")
            continue
        attrs = _render_attrs(node.get("attrs"))
        if name in void_nodes:
            html += f"<{name}{attrs}>"
        else:
            inner = to_html(node.get("children"))
            html += f"<{name}{attrs}>{inner}</{name}>"
    return html


def traverse(nodes, fn):
    """traverse (nodes.cljc:43-55): pre-order rewrite, delete on None.

    Always re-attaches a 'children' key (possibly []) to surviving nodes,
    including text leaves (Q9).
    """
    updated = []
    for node in nodes or []:
        new_node = fn(node)
        if new_node is None:
            continue
        new_node = dict(new_node)
        new_node["children"] = traverse(new_node.get("children"), fn)
        updated.append(new_node)
    return updated


# ---------------------------------------------------------------------------
# Extraction heuristics — this repo's frozen spec (SURVEY.md §2.6,
# constants.py). Oracle implementation: slow recursive walks.
# ---------------------------------------------------------------------------

def _is_text(node) -> bool:
    return node["name"] == TEXT_NAME


def _flatten(nodes, parent=-1, depth=0, out=None, parents=None, depths=None):
    """Pre-order flatten -> (nodes list, parent idx list, depth list)."""
    if out is None:
        out, parents, depths = [], [], []
    for node in nodes or []:
        idx = len(out)
        out.append(node)
        parents.append(parent)
        depths.append(depth)
        _flatten(node.get("children"), idx, depth + 1, out, parents, depths)
    return out, parents, depths


def extract_tree(nodes):
    """Apply whitelist -> text-density -> link-density; return alive flags
    keyed by pre-order index plus the flat node list (used by span emit).

    Passes 2 and 3 evaluate elements BOTTOM-UP (reverse pre-order): every
    descendant's decision is made before its ancestor is scored, and a
    dropped node contributes nothing to any ancestor's sums (constants.py).
    """
    flat, parents, _depths = _flatten(nodes)
    n = len(flat)
    alive = [True] * n

    def propagate_drops():
        """Final aliveness = own decision AND all ancestors kept."""
        for i in range(n):
            p = parents[i]
            if p >= 0 and not alive[p]:
                alive[i] = False

    # Pass 1: tag whitelist (decision is purely name-based, order-free)
    for i in range(n):
        node = flat[i]
        if not _is_text(node) and (
            node["name"] in DROP_TAGS or node["name"].startswith("!--")
        ):
            alive[i] = False
    propagate_drops()

    # in_a: node with any `a` element among its ancestors (structural;
    # independent of aliveness — drops always kill whole subtrees anyway).
    in_a = [False] * n
    for i in range(n):
        p = parents[i]
        if p >= 0 and (in_a[p] or flat[p]["name"] == ANCHOR_TAG):
            in_a[i] = True

    def bottom_up_pass(decide):
        """Reverse pre-order sweep. Accumulates per-node subtree stats over
        currently-surviving nodes; `decide(i, stats)` returns False to drop
        element i, in which case its subtree contributes nothing upward.
        stats = (text_chars, elem_count, has_img, anchor_text), strict
        descendants only (has_img includes self)."""
        text_chars = [0] * n
        elem_count = [0] * n
        has_img = [False] * n
        anchor_text = [0] * n
        for i in range(n - 1, -1, -1):
            if not alive[i]:
                continue
            node = flat[i]
            is_text = _is_text(node)
            own_text = len(node.get("value", "")) if is_text else 0
            if not is_text:
                if node["name"] == MEDIA_TAG:
                    has_img[i] = True
                if not decide(
                    i, (text_chars[i], elem_count[i], has_img[i], anchor_text[i])
                ):
                    alive[i] = False
                    continue  # contributes nothing to ancestors
            p = parents[i]
            if p >= 0:
                text_chars[p] += text_chars[i] + own_text
                anchor_text[p] += anchor_text[i] + (own_text if in_a[i] else 0)
                elem_count[p] += elem_count[i] + (0 if is_text else 1)
                has_img[p] = has_img[p] or has_img[i]
        propagate_drops()

    # Pass 2: text density
    def td_decide(_i, stats):
        text, elems, img, _anchor = stats
        td = text / max(1, elems + 1)
        return td >= TEXT_DENSITY_MIN or img

    bottom_up_pass(td_decide)

    # Pass 3: link density
    def ld_decide(_i, stats):
        text, _elems, _img, anchor = stats
        ld = anchor / max(1, text)
        return not (ld > LINK_DENSITY_MAX and text < LINK_DENSITY_TEXT_EXEMPT)

    bottom_up_pass(ld_decide)

    return flat, alive


def extract_spans_from_html(html: str):
    """Parse one HTML payload and emit (kind, text, media_ref) tuples in
    document order per the frozen spec (offsets are assigned by the caller
    across the whole document's span sequence)."""
    flat, alive = extract_tree(parse(html))
    out = []
    for i, node in enumerate(flat):
        if not alive[i]:
            continue
        if _is_text(node):
            value = node.get("value", "")
            if value.strip() == "":  # indentation/whitespace is not content
                continue
            out.append((TEXT_KIND, value, None))
        elif node["name"] == MEDIA_TAG:
            src = (node.get("attrs") or {}).get(MEDIA_SRC_ATTR)
            out.append((MEDIA_KIND, None, src if isinstance(src, str) else None))
    return out


def extract_document(spans_in):
    """Full per-document oracle: list of input span dicts
    {kind, text, media_ref, offset} -> ordered output span dicts.

    Input spans are processed in ascending `offset` order (ties by array
    position); output offsets are dense 0..k-1.
    """
    ordered = sorted(
        enumerate(spans_in), key=lambda t: (t[1]["offset"], t[0])
    )
    out = []
    for _, span in ordered:
        kind = span["kind"]
        if kind == HTML_KIND:
            out.extend(extract_spans_from_html(span["text"] or ""))
        elif kind == TEXT_KIND:
            out.append((TEXT_KIND, span["text"], None))
        else:
            out.append((MEDIA_KIND, None, span["media_ref"]))
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(out)
    ]
