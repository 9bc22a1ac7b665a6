"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual query definitions live in ``flockdb_spark.queries`` (the declared
FlockDB query set, SURVEY.md §2.e) and ``flockdb_spark.functions`` (the
LLM-data-pipeline extensions).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from flockdb_spark import queries as _q  # noqa: E402
from flockdb_spark import queries_ext as _qx  # noqa: E402,F401  (registers x-series)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the Q10 supplier-pair
    intersection — load → filter → semi-join → project (SURVEY.md §7.1)."""
    return _q.QUERIES["q10_intersection"](spark, "/root/testdata/sf0.001")


# The driver gates only the FIRST 50 registry entries each round, so we order
# the registry by gate priority.  Re-rotated late in r11 (registry 148;
# x122/x123 are NEW this round — ungated entries sort before this list
# automatically, taking the first 2 window slots): the optimization round's
# continuation sessions touched far more queries than the original rotation
# anticipated (the BM25 memo, the hybrid-RRF literal fold, the whole ANN
# rerank/gather family, triangles, pack_sequences, media decode), so the
# window now leads with the FULL changed-in-round union (_CHANGED_IN_ROUND,
# 39 entries — the deferral guard outranks stale-rotation), then the
# 9-entry r5-green stale block (driver rows 6 rounds old) fills to 50.
# The r7-green block — promised for this window by VERDICT r10 item 6 —
# is DEFERRED to lead r12: it lost its slots to the changed set, and
# gating changed code wins over re-gating unchanged code.  All 148 entries
# are green in this round's local sf0.01 gate (tools/check.py, layout v2).
_GATED_GREEN = [
    # changed in r11 (see _CHANGED_IN_ROUND)
    "q07_by_destination", "q17_oplog_replay", "q18_mass_action",
    "q19_metadata_merge", "q20_reconcile", "x91_kneser_ney",
    "x94_kn_perplexity", "x84_heavy_hitters", "x103_heavy_hitters_sketch",
    "x109_lsh_auto_neardup", "x18_lsh_neardup", "x06_lsh_ann",
    "x35_multiprobe_ann", "x52_lsh_ann_multitable", "x53_lsh_neardup_multitable",
    "x38_embedding_dedup", "x110_hybrid_rrf_ann", "x98_semantic_dedup",
    "x121_dsir_selection",
    # changed in r11 continuation sessions (items 11-15 of OPTIMIZATION_r11)
    "x03_minhash_lsh", "x05_ann_topk", "x14_pagerank",
    "x15_ivf_ann", "x25_bm25", "x27_triangles",
    "x33_seq_packing", "x58_tfidf_top_terms", "x59_inverted_index",
    "x99_bm25_topk", "x101_hybrid_rrf", "x111_media_decode",
    "x112_pq_ann", "x113_pq_trained", "x114_pq_rerank",
    "x115_ivfpq_ann", "x116_mmr_rerank", "x117_top_pc_projection",
    "x118_ivfpq_trained", "x120_binary_ann",
    # r5-green block — stalest driver rows (6 rounds old) — fills to 50
    "x49_quality_canonical", "x54_temperature_sample", "x70_bpe_pair_counts",
    "x72_span_dedup_rewrite", "x73_incremental_dedup", "x74_stream_dedup_index",
    "x75_training_shards", "x76_vocab_spectrum", "x78_lang_confusion",
    # ---- below the 50-entry window ----
    # r7-green block (deferred to lead r12 — see header comment)
    "q24_select_edges_batch", "x07_embedding_neardup", "x08_quality",
    "x09_token_count", "x10_lang_id", "x11_fingerprint",
    "x12_multimodal", "x13_degree_dist",
    "x19_pipeline", "x20_sessionization", "x21_asof_join",
    "x22_range_join", "x23_rollup", "x24_event_rollup",
    "x26_topk_per_group",
    # r8-green block
    "q05_wildcard", "q22_select_all",
    "x119_stream_ivf_cells",
    "x31_event_features", "x36_json_rollup", "x37_boilerplate",
    "x39_funnel", "x40_mixture_upsample", "x41_bigram_vocab",
    "x42_khop", "x43_mutual_edges", "x44_components",
    "x45_chunking", "x46_token_ids", "x48_curation_dag",
    "x65_leakage_free_splits", "x66_stream_sessionization", "x67_duplicated_spans",
    "x68_stream_event_rates", "x79_k_core", "x97_negative_samples",
    # r9-green block
    "q06_keyset_pages", "q08_backward", "q09_where_in",
    "q10_intersection", "q11_union", "q12_difference",
    "q13_nested", "q15_incl_archived", "q16_state_filters",
    "q21_count_estimates", "x01_dedup_exact", "x02_ngram_jaccard",
    "x04_simhash",
    "x16_simhash_neardup", "x17_dedup_resolve",
    "x47_bigram_surprisal", "x56_int8_ann", "x69_kmeans_fit",
    "x71_source_overlap", "x77_embedding_outliers", "x80_count_min_sketch",
    "x81_stream_sketch", "x82_bloom_decontaminate", "x83_hll_registers",
    "x85_fixed_size_sample", "x86_stream_interval_join", "x89_zorder_key",
    "x90_token_budget", "x92_last_touch", "x93_personalized_pagerank",
    "x95_collocations",
    # r10-green block (freshest driver rows)
    "q01_point_lookup", "q02_contains", "q03_metadata",
    "q04_degree_counts", "q14_select_edges", "q23_select2_batch",
    "q25_ordered_uuid", "x100_quality_classifier",
    "x102_phrase_match", "x104_orc_roundtrip", "x105_vocab_drift",
    "x106_probe_fit", "x107_multi_phrase", "x108_neighborhood_jaccard",
    "x28_train_split", "x29_stratified_sample",
    "x30_length_quantiles", "x32_repetition",
    "x34_decontaminate", "x50_pii_redaction", "x51_training_order",
    "x55_select_top_quality", "x57_fuzzy_decontaminate",
    "x60_normalize_text", "x61_pair_integrity",
    "x62_oov_rate", "x63_corpus_diff", "x64_label_centroids",
    "x87_jsonl_roundtrip", "x88_csv_roundtrip", "x96_salted_join",
]

#: every query whose CODE or ORACLE was touched this round (kept current per
#: round; tests/test_entry.py asserts each sits inside the driver's 50-entry
#: gate window so a change never ships ungated — the r6 deferral can't
#: silently recur).  Ungated entries sort first automatically and need no
#: listing here unless also changed.
_CHANGED_IN_ROUND = [
    # r11: q07 serves dest-order pages from the new UNIQUE-index twin
    # (layout v2) with an inline IN; q17-q20 ride sequenced_merge's auto
    # strategy; x91/x94 the window-fold KN marginals; x84/x103 the
    # 1x1024 sketch + doc-grain token-array cache; the LSH family
    # (x06/x18/x35/x38/x52/x53/x109/x110) the multi-pass recovery
    # restructure of lsh_neardup_pairs/lsh_ann_topk; x98 the
    # semantic_assign factor-out + auto-K default; x121 the xxhash64
    # Gumbel scramble (gated tau=0 path unaffected, included anyway).
    # x122/x123 are NEW gates (ungated -> sort first automatically).
    "q07_by_destination", "q17_oplog_replay", "q18_mass_action",
    "q19_metadata_merge", "q20_reconcile", "x91_kneser_ney",
    "x94_kn_perplexity", "x84_heavy_hitters", "x103_heavy_hitters_sketch",
    "x109_lsh_auto_neardup", "x18_lsh_neardup", "x06_lsh_ann",
    "x35_multiprobe_ann", "x52_lsh_ann_multitable", "x53_lsh_neardup_multitable",
    "x38_embedding_dedup", "x110_hybrid_rrf_ann", "x98_semantic_dedup",
    "x121_dsir_selection",
    # r11 continuation sessions (OPTIMIZATION_r11 items 11-15e): the BM25
    # doc-grain memo + df-table memo (x25/x99, and x58/x59 route through
    # the reworked doc_terms); the hybrid-RRF literal fold + one-job
    # construction collect (x101, x110 above); the ANN family rework —
    # driver-side IVF probe cells (x15), fused prefilter+rerank
    # (x114/x120), one-pass mmr via emit_vectors (x05/x116),
    # single-union construction collects (x112/x113/x115/x118), pruned
    # mapInArrow input (x117); fused synth+decode (x111); uncached
    # pack_sequences (x33); triangles' one-pass degree attach (x27);
    # cache-release handles on pagerank (x14) and minhash signatures (x03).
    "x03_minhash_lsh", "x05_ann_topk", "x14_pagerank",
    "x15_ivf_ann", "x25_bm25", "x27_triangles",
    "x33_seq_packing", "x58_tfidf_top_terms", "x59_inverted_index",
    "x99_bm25_topk", "x101_hybrid_rrf", "x111_media_decode",
    "x112_pq_ann", "x113_pq_trained", "x114_pq_rerank",
    "x115_ivfpq_ann", "x116_mmr_rerank", "x117_top_pc_projection",
    "x118_ivfpq_trained", "x120_binary_ann",
]

#: the driver's per-round gate depth (first N of the ordered registry)
GATE_WINDOW = 50


def _gate_ordered(full: dict) -> dict:
    green = [n for n in _GATED_GREEN if n in full]
    ungated = [n for n in full if n not in _GATED_GREEN]
    return {n: full[n] for n in [*ungated, *green]}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _gate_ordered(dict(_q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _gate_ordered(dict(_q.ORACLES))
