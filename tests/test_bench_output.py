"""The driver captures only the LAST 2,000 bytes of bench stdout; a
final line longer than that is truncated mid-line and json.load fails
("parsed": null — it happened in r02 and r03). Pin the byte budget of
the line bench.py emits, with headroom for query-count growth."""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402

# realistic query names (the live set is 122; headroom for growth —
# the degrade path drops fastest queries first when over budget),
# at the live set's name-length distribution.
_QUERY_NAMES = [
    "extract_main_text", "parse_roundtrip", "traverse_rewrite",
    "parse_node_stats", "extract_interleaved", "extract_link_density",
    "dedup_exact", "dedup_minhash_lsh", "dedup_clusters",
    "dedup_clusters_lsh", "simhash", "simhash_dedup",
    "minhash_bucket_stats", "simhash_bucket_stats", "ngram_jaccard",
    "quality_score", "repetition_score", "lang_id", "fingerprint",
    "token_stats", "corpus_stats", "curate_corpus", "vocab_topk",
    "tfidf_top_terms", "sample_stratified", "contamination",
    "domain_cap", "events_sessionize", "events_window_stats",
    "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
    "dedup_embedding_cosine", "media_dedup", "media_frames",
    "png_decode", "png_resize", "wav_decode", "pdf_layout",
    "pdf_interleaved", "ann_recall_at_k", "minhash_lsh_fused_stats",
    "simhash_fused_stats", "extract_markdown", "c4_line_filter",
    "shuffle_shards", "pq_codes", "ann_pq_topk", "ann_ivfpq_topk",
    "ann_pq_rerank",
    "segment_dedup", "pii_scrub", "extract_outlinks", "corpus_mixture",
    "token_histogram", "lm_surprisal", "pack_sequences",
    "dedup_incremental", "url_normalize", "media_dhash", "span_dedup",
    "wav_near_dup", "link_graph_rank", "domain_stats", "html_metadata",
    "anchor_text_agg", "normalize_text", "url_filter", "dedup_recall",
    "host_boilerplate", "extra_query_name_f", "extra_query_name_g",
    "extract_tables", "sitemap_urls", "robots_parse", "robots_filter",
    "chunk_docs", "dsir_weights", "dedup_exact_normalized",
    "split_holdout", "extra_query_name_h", "extra_query_name_i",
    "semdedup", "warc_roundtrip", "quality_classifier",
    "extract_structured", "tokenize_bpe", "bpe_train",
    "bloom_dedup", "corpus_diff", "extract_code", "cluster_topics",
    "distinct_sketch", "heavy_hitters",
    "bm25_topk", "pmi_topk", "length_quantiles", "char_entropy",
    "winnow_fingerprints", "winnow_contamination", "lm2_surprisal",
    "retention_cohorts", "funnel_steps", "props_stats",
    "tokenizer_fertility", "script_profile", "dom_templates",
    "cms_counts", "feed_entries", "sitemap_index", "graph_degrees",
    "bitext_mine",
    "robots_sitemaps", "recrawl_priority", "extract_coverage",
    "quality_calibration", "user_paths", "dedup_cluster_stats",
    "graph_components", "script_mixture", "embedding_stats",
    "jpeg_decode", "gif_decode",
    "extra_query_name_j", "extra_query_name_k",
]

# Worst-case scaling cache: 4 pairs (2->8 / 8->32, extract + noop),
# every numeric field at max realistic width.
_SCALING = {
    "local[2]->local[8]:extract": {
        "value": 0.853, "docs_per_sec_2": 12345.6,
        "docs_per_sec_8": 98765.4, "walls_2": [99.99] * 3,
        "task_metrics_2": {"executor_run_ms": 10**9},
    },
    "local[2]->local[8]:noop": {
        "value": 0.975, "docs_per_sec_2": 12345.6,
        "docs_per_sec_8": 98765.4,
    },
    "local[8]->local[32]:extract": {
        "value": 0.503, "docs_per_sec_8": 98765.4,
        "docs_per_sec_32": 198765.4,
    },
    "local[8]->local[32]:noop": {
        "value": 0.434, "docs_per_sec_8": 98765.4,
        "docs_per_sec_32": 198765.4,
    },
}


def test_bench_line_under_driver_tail_buffer():
    qtimes = {name: 99.999 for name in _QUERY_NAMES}
    out = bench.build_output(
        wall=99.999, qtimes=qtimes, sf=0.1, docs=600000, cpus=32,
        scaling_cache=_SCALING,
    )
    line = json.dumps(out)
    assert len(line) < 1900, (
        f"bench final line is {len(line)} bytes; driver tail buffer is "
        "2000 — trim fields (see build_output docstring)"
    )
    # and it survives the driver's parse
    assert json.loads(line)["metric"] == "e2e_extract_wall"


def test_bench_line_strips_scaling_detail():
    out = bench.build_output(
        wall=1.0, qtimes={}, sf=0.1, docs=1, cpus=32,
        scaling_cache=_SCALING,
    )
    # one efficiency number per pair under a shortened key; walls,
    # docs/sec, and task metrics stay in SCALING.json
    assert out["scaling"]["2-8:e"] == _SCALING[
        "local[2]->local[8]:extract"]["value"]
    assert set(out["scaling"]) == {"2-8:e", "2-8:n", "8-32:e", "8-32:n"}


def test_bench_line_degrades_instead_of_overflowing():
    """Pathological session: every wall at 3 digits. The line must
    still parse under the budget — coarser rounding first, then the
    FASTEST queries dropped (slow ones carry the signal), with the
    cut count recorded."""
    qtimes = {name: 100.0 + i for i, name in enumerate(_QUERY_NAMES)}
    out = bench.build_output(
        wall=999.9, qtimes=qtimes, sf=0.1, docs=600000, cpus=32,
        scaling_cache=_SCALING,
    )
    line = json.dumps(out)
    assert len(line) < 1900
    kept = out["queries"]
    if "q_omitted" in out:
        assert out["q_omitted"] == len(_QUERY_NAMES) - len(kept)
        # the slowest survive
        slowest = max(qtimes, key=qtimes.get)
        assert slowest in kept
