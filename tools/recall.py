"""Recall report for the ANN / embedding-near-dup family at PRODUCTION hash
settings (hash_mode="xxhash64" — the gates use "portable" mode so DuckDB can
re-derive buckets; production uses xxhash64 hyperplanes, whose recall is what
a user tuning planes/probes actually gets).

Usage: python tools/recall.py [sf_dir] [> report]   (writes RECALL.md rows)

Ground truths are the exact operators (x05 brute-force top-k, x07 exact
near-dup pairs); recall is measured for the bucketed scale twins at the
gate parameters and a sweep around them.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = 10
QUERY_IDS = [0, 1, 2, 3, 4]  # queries_ext.ANN_QUERY_IDS


def topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall_at_k(truth: dict[int, set[int]], got: dict[int, set[int]]) -> tuple[float, float]:
    per_q = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    return sum(per_q) / len(per_q), min(per_q)


def main() -> None:
    from flockdb_spark.session import get_spark
    from flockdb_spark.functions import similarity
    from flockdb_spark.sources.edges import _read

    spark = get_spark(app_name="flockdb-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = _read(spark, SF_DIR, "embeddings").cache()
    n = emb.count()
    print(f"corpus: {n} vectors @ {SF_DIR}")

    truth = topk_sets(similarity.brute_force_topk(emb, QUERY_IDS, k=K))

    rows = []
    for planes, n_probe, n_tables in [
        (6, 1, 1), (6, 4, 1), (4, 1, 1), (4, 4, 1),          # single table (gate shape)
        (6, 4, 4), (6, 4, 8), (4, 4, 4), (4, 4, 8), (4, 2, 16),  # OR-amplified
    ]:
        got = topk_sets(
            similarity.lsh_ann_topk(
                emb, QUERY_IDS, k=K, planes=planes, n_probe=n_probe,
                n_tables=n_tables, hash_mode="xxhash64",
            )
        )
        mean_r, min_r = recall_at_k(truth, got)
        rows.append(
            ("lsh_ann_topk", f"planes={planes} n_probe={n_probe} L={n_tables}", mean_r, min_r)
        )

    for n_cent, n_probe in [(16, 4), (16, 8), (32, 8)]:
        got = topk_sets(
            similarity.ivf_ann_topk(emb, QUERY_IDS, k=K, n_centroids=n_cent, n_probe=n_probe)
        )
        mean_r, min_r = recall_at_k(truth, got)
        rows.append(("ivf_ann_topk", f"centroids={n_cent} n_probe={n_probe}", mean_r, min_r))

    # pair recall: exact near-dup pairs vs the LSH-bucketed twin
    exact_pairs = {
        (r["a"], r["b"]) for r in similarity.neardup_pairs(emb, threshold=0.45).collect()
    }
    auto = similarity.lsh_auto_shape(n, min_planes=4, max_tables=32)
    pair_shapes = [(2, 1), (4, 1), (6, 1), (4, 8), (4, 16), (6, 16), (2, 8)]
    if (auto["planes"], auto["n_tables"]) not in pair_shapes:
        pair_shapes.append((auto["planes"], auto["n_tables"]))  # the r7 auto row
    for planes, n_tables in pair_shapes:
        got_df = similarity.lsh_neardup_pairs(
            emb, threshold=0.45, planes=planes, n_tables=n_tables, hash_mode="xxhash64"
        )
        got_pairs = {(r["a"], r["b"]) for r in got_df.collect()}
        assert got_pairs <= exact_pairs, "bucketed pairs must be a subset of exact"
        rec = len(got_pairs) / len(exact_pairs) if exact_pairs else 1.0
        rows.append(
            ("lsh_neardup_pairs", f"planes={planes} L={n_tables} thr=0.45", rec, rec)
        )
    print(f"exact near-dup pairs at thr=0.45: {len(exact_pairs)}")

    print("| operator | params | mean recall@10 / pair recall | min per-query |")
    print("|---|---|---|---|")
    for op, params, mean_r, min_r in rows:
        print(f"| {op} | {params} | {mean_r:.3f} | {min_r:.3f} |")
    spark.stop()


if __name__ == "__main__":
    main()
