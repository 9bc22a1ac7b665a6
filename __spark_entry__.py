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
# the registry by gate priority.  Rotated for r10 (registry 145, all with
# driver rows): the window leads with the NOW-STALEST block exactly as
# VERDICT r9 item 1 prescribes — the 27-entry r7-green set (last driver
# rows 3 rounds old).  Next the entries whose CODE, ORACLE, or decisive
# session conf changed in r10 (see _CHANGED_IN_ROUND).  The oldest
# r8-green rows fill the remaining slots.  The r8 remainder and the
# r9-gated sets (freshest rows) sort after the window — all 145 are green
# in this round's local sf0.01 gate.
_GATED_GREEN = [
    # r7-green block — stalest rows, promised to lead r10 (VERDICT r9 item 1)
    "q01_point_lookup", "q02_contains", "q03_metadata", "q04_degree_counts",
    "q14_select_edges", "q23_select2_batch", "q25_ordered_uuid",
    "x98_semantic_dedup", "x100_quality_classifier",
    "x102_phrase_match", "x103_heavy_hitters_sketch", "x104_orc_roundtrip",
    "x105_vocab_drift", "x106_probe_fit", "x107_multi_phrase",
    "x108_neighborhood_jaccard",
    "x33_seq_packing", "x87_jsonl_roundtrip", "x88_csv_roundtrip",
    "x52_lsh_ann_multitable", "x96_salted_join", "x64_label_centroids",
    "x94_kn_perplexity",
    "x84_heavy_hitters", "x18_lsh_neardup", "x06_lsh_ann", "x15_ivf_ann",
    # changed in r10 (code, oracle, or decisive conf — see _CHANGED_IN_ROUND)
    "x25_bm25", "x99_bm25_topk", "x101_hybrid_rrf", "x110_hybrid_rrf_ann",
    "x111_media_decode", "x120_binary_ann", "x91_kneser_ney",
    # oldest r8-green rows fill the window to 50
    "x28_train_split", "x29_stratified_sample",
    "x30_length_quantiles", "x32_repetition", "x34_decontaminate",
    "x50_pii_redaction", "x51_training_order", "x55_select_top_quality",
    "x57_fuzzy_decontaminate", "x58_tfidf_top_terms",
    "x59_inverted_index", "x60_normalize_text", "x61_pair_integrity",
    "x62_oov_rate", "x63_corpus_diff", "x65_leakage_free_splits",
    # ---- below the 50-entry window ----
    # r8-green remainder
    "x66_stream_sessionization",
    "x67_duplicated_spans", "x68_stream_event_rates",
    "x38_embedding_dedup", "x79_k_core", "x97_negative_samples",
    "x109_lsh_auto_neardup",
    "q22_select_all",
    "q05_wildcard", "x31_event_features",
    "x36_json_rollup", "x37_boilerplate", "x39_funnel", "x40_mixture_upsample",
    "x41_bigram_vocab", "x42_khop", "x43_mutual_edges", "x44_components",
    "x45_chunking", "x46_token_ids",
    "x48_curation_dag", "x49_quality_canonical", "x54_temperature_sample",
    "x70_bpe_pair_counts", "x72_span_dedup_rewrite",
    "x73_incremental_dedup", "x74_stream_dedup_index", "x75_training_shards",
    "x76_vocab_spectrum", "x78_lang_confusion",
    "x112_pq_ann", "x113_pq_trained", "x114_pq_rerank", "x119_stream_ivf_cells",
    # r7-green remainder (stub-path multimodal + driver-tiny lookups)
    "x07_embedding_neardup", "x19_pipeline", "x08_quality", "x09_token_count",
    "x10_lang_id", "x11_fingerprint", "x12_multimodal", "x20_sessionization",
    "x21_asof_join", "x22_range_join", "x23_rollup", "x24_event_rollup",
    "x13_degree_dist", "x14_pagerank", "x26_topk_per_group",
    "x27_triangles",
    # r9-gated (freshest driver rows): the r5 remainder, the r6-green core
    # block, and the r9 changes
    "x80_count_min_sketch", "x81_stream_sketch",
    "x82_bloom_decontaminate", "x83_hll_registers", "x85_fixed_size_sample",
    "x86_stream_interval_join", "x89_zorder_key", "x90_token_budget",
    "x92_last_touch",
    "q06_keyset_pages", "q07_by_destination", "q08_backward", "q09_where_in",
    "q10_intersection", "q11_union", "q12_difference", "q13_nested",
    "q15_incl_archived", "q16_state_filters",
    "q17_oplog_replay", "q18_mass_action", "q19_metadata_merge",
    "q20_reconcile", "q21_count_estimates", "x01_dedup_exact",
    "x02_ngram_jaccard", "x17_dedup_resolve", "x03_minhash_lsh", "x04_simhash",
    "x16_simhash_neardup", "x05_ann_topk",
    "x35_multiprobe_ann",
    "x53_lsh_neardup_multitable", "x56_int8_ann",
    "x69_kmeans_fit", "x77_embedding_outliers",
    "x47_bigram_surprisal", "x93_personalized_pagerank",
    "x95_collocations",
    "x115_ivfpq_ann", "x116_mmr_rerank", "x117_top_pc_projection",
    "x118_ivfpq_trained", "x71_source_overlap",
    "q24_select_edges_batch",
]

#: every query whose CODE or ORACLE was touched this round (kept current per
#: round; tests/test_entry.py asserts each sits inside the driver's 50-entry
#: gate window so a change never ships ungated — the r6 deferral can't
#: silently recur).  Ungated entries sort first automatically and need no
#: listing here unless also changed.
_CHANGED_IN_ROUND = [
    # r10: x25/x99/x101/x110 carry the strengthened memo identity
    # (relevance._plan_key — semanticHash + canonicalized plan string,
    # ADVICE r9); x101/x110 additionally the 4-exchange shuffle fold;
    # x111 the JVM header-audit fast path; x120 the slice-to-dims sign
    # pack (ADVICE r9) + the array-of-sketches rotation refactor (gated
    # shape rotations=0 unchanged); x91 is conf-level — its wall rides the
    # new canChangeCachedPlanOutputPartitioning session default
    "x25_bm25", "x99_bm25_topk", "x101_hybrid_rrf", "x110_hybrid_rrf_ann",
    "x111_media_decode", "x120_binary_ann", "x91_kneser_ney",
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
