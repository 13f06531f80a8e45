"""Frozen semantic constants shared by the oracle (tests) and the kernel (engine).

Parser semantics derive from the reference (askonomm/dompa); each constant
cites the reference file:line it pins. Extraction heuristics (§2.6 of
SURVEY.md) are NOT in the reference — they are this project's own frozen
spec, recorded here so the oracle and the vectorized kernel agree bit-for-bit.
"""

from __future__ import annotations

# --- Parser-side void elements (reference: src/dompa/coordinates.cljc:119-121).
# Case-sensitive; note `param` IS in this set.
PARSER_VOID: frozenset[str] = frozenset(
    {
        "!DOCTYPE",
        "!doctype",
        "area",
        "base",
        "br",
        "col",
        "embed",
        "hr",
        "img",
        "input",
        "link",
        "meta",
        "param",
        "source",
        "track",
        "wbr",
    }
)

# --- Serializer-side void elements (reference: src/dompa/nodes.cljc:5-7).
# Same as PARSER_VOID minus `param` (reference quirk Q12, SURVEY §2.7).
SERIALIZER_VOID: frozenset[str] = frozenset(PARSER_VOID - {"param"})

# Sentinel node name for text nodes (reference `:dompa/text`,
# src/dompa/coordinates.cljc:117,191-198).
TEXT_NAME = ":dompa/text"

# Fragment node name (reference `:<>`, src/dompa/nodes.cljc:21-24).
FRAGMENT_NAME = ":<>"

# Sentinel for boolean-true attribute values inside the flat/Arrow encoding
# (attrs are array<struct<key:string,val:string>>; a bare attribute like
# `checked` stores this sentinel, FIXTURES.md §3).
ATTR_TRUE = "\x01TRUE"

# ---------------------------------------------------------------------------
# Extraction heuristics — this project's frozen spec (SURVEY.md §2.6).
# Thresholds follow Kohlschütter et al. (WSDM 2010) / Sun et al. (SIGIR 2011)
# in spirit; the exact rule set below is authoritative for this repo.
# ---------------------------------------------------------------------------

# Pass 1 (tag whitelist): drop the whole subtree rooted at any element whose
# name is in DROP_TAGS, or starts with "!--" (comment-ish), in document order.
DROP_TAGS: frozenset[str] = frozenset(
    {
        "script",
        "style",
        "noscript",
        "template",
        "iframe",
        "svg",
        "form",
        "button",
        "select",
        "option",
        "nav",
        "aside",
        "footer",
        "header",
        "head",
        "meta",
        "link",
        "title",
        "!DOCTYPE",
        "!doctype",
    }
)

# Pass 2 (text density): elements are evaluated BOTTOM-UP, in reverse
# pre-order (every descendant's keep/drop decision lands before its
# ancestor is scored — so pruned boilerplate children no longer dilute the
# parent's density). For element e:
#   td(e) = text_chars(e) / max(1, tag_count(e))
# where text_chars(e) sums len(value) over SURVIVING text-node strict
# descendants and tag_count(e) = surviving element strict descendants + 1;
# a dropped node contributes nothing to any ancestor's sums.
# Drop e (and its subtree) iff td(e) < TEXT_DENSITY_MIN and e's subtree
# (including e itself) contains no surviving `img` element.
TEXT_DENSITY_MIN = 10.0

# Pass 3 (link density): same bottom-up discipline over pass-2 survivors.
#   ld(e) = anchor_text_chars(e) / max(1, text_chars(e))
# where anchor_text_chars(e) sums len(value) over surviving text-node
# strict descendants of e that have ANY `a` element among their ancestors
# (the `a` need not be inside e). Drop e iff ld(e) > LINK_DENSITY_MAX and
# text_chars(e) < LINK_DENSITY_TEXT_EXEMPT.
LINK_DENSITY_MAX = 0.5
LINK_DENSITY_TEXT_EXEMPT = 200

# Span emission (pass 4): depth-first document order over surviving nodes.
#   text node          -> (kind='text',  text=value, media_ref=NULL)
#                         EXCEPT whitespace-only values (value.strip()==''),
#                         which are skipped (indentation is not content).
#                         Density sums in passes 2-3 still count them.
#   img element        -> (kind='media', text=NULL,  media_ref=src attr if it
#                          is a string value, else NULL)
# Input spans of kind 'text' pass through verbatim as (kind='text').
# Input spans with any other non-'html' kind pass through as
# (kind='media', text=NULL, media_ref preserved).
# Output offsets are dense 0..k-1 per document, in input-span offset order
# (ties broken by array position).
MEDIA_TAG = "img"
MEDIA_SRC_ATTR = "src"
ANCHOR_TAG = "a"

HTML_KIND = "html"
TEXT_KIND = "text"
MEDIA_KIND = "media"

# ---------------------------------------------------------------------------
# Markdown rendering (extraction-tier output format) — this repo's frozen
# spec. The reference has no markdown surface; this is the LLM-corpus
# product form (trafilatura/markdownify territory), re-specified here so
# the kernel, the template fixture, and the DuckDB oracle agree exactly.
#
# Block walk (document order, DROP_TAGS subtrees removed first):
#   h1-h6        -> '#'*level + ' ' + inline(children).strip(), rstripped
#   p            -> inline(children).strip()        (dropped when empty)
#   blockquote   -> '> ' + inline(children).strip() (dropped when empty)
#   ul / ol      -> one line per DIRECT <li> child: '- ' or f'{i+1}. '
#                   + inline(li children).strip(); lines joined '\n'
#   pre          -> '```\n' + raw text (ALL descendant text nodes,
#                   unstripped, concatenated) + '\n```'
#   hr           -> '---'
#   table        -> one line per row: '| ' + ' | '.join(cell inline,
#                   stripped) + ' |' over DIRECT td/th children; rows are
#                   DIRECT <tr> children of the table or of its DIRECT
#                   thead/tbody/tfoot children; a '| --- |'*ncols
#                   separator follows the first row
#   MD_CONTAINERS-> recurse (transparent block containers)
#   anything else (a, img, b/strong, i/em, code, br, span, text, ...)
#                -> accumulates into the current implicit paragraph,
#                   flushed (stripped, dropped when empty) at the next
#                   block boundary
# Inline rules: text -> value; b/strong -> '**'+s+'**'; i/em -> '*'+s+'*';
#   code -> '`'+s+'`'; a -> '[s](href)'; img -> '![alt](src)'; br -> '\n';
#   empty emphasis/code wrap to '' (never bare markers); boolean/missing
#   attrs render ''; unknown elements are transparent. No escaping
#   anywhere (the Q7 serializer contract).
# Document form: blocks from every span in (offset, position) order —
#   html spans via the walk above, text spans as one paragraph block
#   (stripped), media spans as '![](media_ref)' — joined '\n\n'.
# ---------------------------------------------------------------------------
MD_CONTAINERS: frozenset[str] = frozenset(
    {
        "div", "article", "section", "main", "body", "html", "figure",
        "li", "dd", "dt", "dl", "details", "summary",
    }
)
MD_HEADINGS: frozenset[str] = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
