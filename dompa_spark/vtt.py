"""WebVTT subtitle layer — parse caption tracks and align them with
sampled video frames, the pairing step that turns an interleaved
video+text corpus into (frame, caption) training pairs (the CLIP /
video-text shape). A crawl that archives video pages almost always
archives their subtitle tracks too (WebVTT is the W3C format HTML5
`<track>` ships); the text in those tracks is time-coded, so joining
it to `media.sample_frames` output by timestamp is the canonical way
to mine weakly-supervised vision-language pairs at corpus scale.

Everything here is pure Catalyst expressions — both the deterministic
fixture writer AND the parser. There is no Python on the hot path at
all (not even an Arrow batch): a WebVTT file is line-structured text,
which Spark's regex/split/higher-order-function machinery handles
JVM-side inside whole-stage codegen.

Parser contract (the WebVTT subset real subtitle corpora exercise):
  * header line `WEBVTT`, optionally with trailing text after a space
    or tab (`WEBVTT - some comment`), CR/CRLF/LF all accepted;
  * cue blocks separated by blank lines: an OPTIONAL single-line cue
    identifier, the timing line `start --> end` (timestamps
    `HH:MM:SS.mmm` or the short `MM:SS.mmm` form, both per spec), and
    one or more payload lines (joined back with `\n` in `text`);
  * NOTE / STYLE / REGION blocks and the header block are skipped by
    the same rule the spec uses: a block with no `-->` is not a cue
    (spec: cue text itself can never contain `-->`);
  * files not starting with `WEBVTT` yield zero cues (malformed input
    degrades to empty, never to wrong rows).

Scale shape: `parse_vtt` is map-side only (split + filter + one
posexplode of the per-file cue array — cue counts per document are
bounded by the file, so no skew lever). `align_caption_frames` is an
equi-join on doc_id with the time-range predicate applied post-join:
both sides are already doc-keyed, the per-doc cue and frame counts
are small constants, so the join is a plain co-partitioned shuffle
join with no blow-up — the range condition never becomes a cross
product because doc_id is the leading equi-key.

Reference parity note: the reference (askonomm/dompa, HTML-only) has
no subtitle layer; this is part of the mandated multimodal extension
surface (interleaved text+media documents, BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["docs_to_vtt", "parse_vtt", "align_caption_frames"]

# Fixture formula (closed-form in doc_id; moduli/multipliers distinct
# from every media fixture so a silently-swapped table mismatches its
# oracle):
#   n_cues     = 1 + doc_id % 3
#   cue i:       start_ms = i*400,  end_ms = i*400 + 350
#   identifier   present when i % 2 == 1:  "c<doc_id>-<i>"
#   timestamps   HH:MM:SS.mmm when i % 2 == 0, MM:SS.mmm otherwise
#   payload      "Cue <i> for doc <doc_id>: <md5(doc_id:':':i)[0:8]>"
#                plus a second line "(line two <doc_id>)" when i%3==2
#   NOTE block   when doc_id % 3 == 0 (must be skipped by the parser)
#   STYLE block  when doc_id % 5 == 0 (must be skipped by the parser)
#   header       "WEBVTT - fixture" when doc_id % 2 == 1 else "WEBVTT"
CUE_MS = 400
CUE_LEN_MS = 350


def _ts(ms: Column, long_form: Column) -> Column:
    """Format a millisecond offset as a WebVTT timestamp — the
    HH:MM:SS.mmm form when long_form, else the short MM:SS.mmm form."""
    h = (ms / 3600000).cast("int")
    m = ((ms / 60000) % 60).cast("int")
    s = ((ms / 1000) % 60).cast("int")
    frac = (ms % 1000).cast("int")
    return F.when(
        long_form,
        F.format_string("%02d:%02d:%02d.%03d", h, m, s, frac),
    ).otherwise(
        F.format_string("%02d:%02d.%03d", (h * 60 + m), s, frac)
    )


def docs_to_vtt(docs: DataFrame) -> DataFrame:
    """Render each document row as a deterministic WebVTT file —
    (doc_id, vtt) — entirely as Catalyst expressions (transform over a
    sequence + array_join; zero shuffles, zero Python). The fixture
    deliberately cycles every parser branch: optional cue identifiers,
    both timestamp forms, multi-line payloads, NOTE and STYLE comment
    blocks, and the annotated-header variant."""
    doc_id = F.col("doc_id").cast("long")
    ds = doc_id.cast("string")
    n_cues = (doc_id % 3 + 1).cast("int")

    def _cue(i: Column) -> Column:
        ist = i.cast("string")
        start = (i.cast("long") * CUE_MS)
        end = start + CUE_LEN_MS
        ident = F.when(
            i % 2 == 1,
            F.concat(F.lit("c"), ds, F.lit("-"), ist, F.lit("\n")),
        ).otherwise(F.lit(""))
        timing = F.concat(
            _ts(start, i % 2 == 0), F.lit(" --> "), _ts(end, i % 2 == 0)
        )
        body = F.concat(
            F.lit("Cue "), ist, F.lit(" for doc "), ds, F.lit(": "),
            F.substring(F.md5(F.concat(ds, F.lit(":"), ist)), 1, 8),
            F.when(
                i % 3 == 2,
                F.concat(F.lit("\n(line two "), ds, F.lit(")")),
            ).otherwise(F.lit("")),
        )
        return F.concat(ident, timing, F.lit("\n"), body)

    header = F.when(
        doc_id % 2 == 1, F.lit("WEBVTT - fixture")
    ).otherwise(F.lit("WEBVTT"))
    note = F.when(
        doc_id % 3 == 0,
        F.concat(
            F.lit("\n\nNOTE synthetic fixture doc "), ds,
            F.lit("\nsecond comment line"),
        ),
    ).otherwise(F.lit(""))
    style = F.when(
        doc_id % 5 == 0, F.lit("\n\nSTYLE\n::cue { color: gray }")
    ).otherwise(F.lit(""))
    cues = F.array_join(
        F.transform(F.sequence(F.lit(0), n_cues - 1), _cue), "\n\n"
    )
    return docs.select(
        doc_id.alias("doc_id"),
        F.concat(
            header, note, style, F.lit("\n\n"), cues, F.lit("\n")
        ).alias("vtt"),
    )


def _ts_ms(ts: Column) -> Column:
    """Milliseconds from a WebVTT timestamp string; accepts both the
    HH:MM:SS.mmm and the short MM:SS.mmm form (the split yields 4 or 3
    parts respectively). Empty/invalid extracts yield NULL."""
    parts = F.split(ts, "[:.]")
    four = F.size(parts) == 4
    h = F.when(four, F.element_at(parts, 1).cast("long")).otherwise(
        F.lit(0)
    )
    m = F.when(four, F.element_at(parts, 2)).otherwise(
        F.element_at(parts, 1)
    ).cast("long")
    s = F.when(four, F.element_at(parts, 3)).otherwise(
        F.element_at(parts, 2)
    ).cast("long")
    ms = F.when(four, F.element_at(parts, 4)).otherwise(
        F.element_at(parts, 3)
    ).cast("long")
    return F.when(
        ts == "", F.lit(None).cast("long")
    ).otherwise(((h * 60 + m) * 60 + s) * 1000 + ms)


_TS_RE = r"(?:\d+:)?\d{2}:\d{2}\.\d{3}"


def parse_vtt(
    df: DataFrame, doc_col: str = "doc_id", vtt_col: str = "vtt"
) -> DataFrame:
    """Parse WebVTT files into one row per cue:
    (doc_id, cue_idx, cue_id, start_ms, end_ms, n_lines, text).

    cue_idx is the cue's 0-based position among the file's cue blocks
    (document order — the order the track plays). cue_id is the
    optional identifier line (NULL when absent). text joins the
    payload lines back with '\\n'.

    Pure Catalyst: normalize newlines, split on blank lines, keep the
    blocks containing '-->' (the spec's own discriminator — cue text
    can never contain it), posexplode the per-file cue array so the
    position IS cue_idx, then slice each block into identifier /
    timing / payload lines. Files without the WEBVTT header yield no
    rows."""
    norm = F.regexp_replace(
        F.regexp_replace(F.col(vtt_col), "^\ufeff", ""), "\r\n?", "\n"
    )
    blocks = F.split(norm, "\n{2,}")
    cue_blocks = F.filter(blocks, lambda b: F.instr(b, "-->") > 0)
    base = df.select(
        F.col(doc_col).alias("doc_id"),
        F.when(norm.startswith("WEBVTT"), cue_blocks)
        .otherwise(F.array().cast("array<string>"))
        .alias("_cues"),
    )
    ex = base.select(
        "doc_id", F.posexplode("_cues").alias("cue_idx", "_block")
    )
    # a file's trailing newline (or leading blank lines) otherwise
    # lands inside the first/last block as a phantom empty line
    lines = F.split(
        F.regexp_replace(F.col("_block"), r"^\n+|\n+$", ""), "\n"
    )
    first_is_timing = F.instr(F.element_at(lines, 1), "-->") > 0
    timing = F.when(
        first_is_timing, F.element_at(lines, 1)
    ).otherwise(F.element_at(lines, 2))
    payload_from = F.when(first_is_timing, F.lit(2)).otherwise(F.lit(3))
    payload = F.slice(
        lines, payload_from, F.greatest(
            F.size(lines) - payload_from + 1, F.lit(0)
        )
    )
    return ex.select(
        "doc_id",
        F.col("cue_idx").cast("int").alias("cue_idx"),
        F.when(~first_is_timing, F.element_at(lines, 1))
        .alias("cue_id"),
        _ts_ms(
            F.regexp_extract(timing, r"^\s*(" + _TS_RE + r")\s*-->", 1)
        ).alias("start_ms"),
        _ts_ms(
            F.regexp_extract(timing, r"-->\s*(" + _TS_RE + ")", 1)
        ).alias("end_ms"),
        F.size(payload).cast("int").alias("n_lines"),
        F.array_join(payload, "\n").alias("text"),
    )


def align_caption_frames(
    cues: DataFrame, frames: DataFrame
) -> DataFrame:
    """Join sampled video frames to the caption cue active at each
    frame's timestamp — the (frame, caption) pairing step for
    vision-language training data. `cues` is parse_vtt output keyed by
    doc_id; `frames` is media.sample_frames output carrying (doc_id,
    frame_idx, ts_ms). A frame pairs with cue c iff
    start_ms <= ts_ms < end_ms; frames outside every cue drop (inner
    join — unpaired frames are not training pairs).

    Scale shape: equi-join on doc_id (both sides co-partition on it),
    the range predicate evaluated as a join residual — per-doc cue and
    frame counts are file-bounded constants, so no cross-product risk
    and no interval-index machinery needed."""
    c = cues.select(
        F.col("doc_id").alias("_cdoc"), "cue_idx", "start_ms",
        "end_ms", F.col("text").alias("caption"),
    )
    return (
        frames.join(
            c,
            (frames["doc_id"] == c["_cdoc"])
            & (frames["ts_ms"] >= c["start_ms"])
            & (frames["ts_ms"] < c["end_ms"]),
        )
        .drop("_cdoc")
    )
