"""Structured-Streaming ingestion: the journal → foreachBatch → W2 merge path
(parity with the reference's async queue, doc/blog.md:110-119)."""

import json

from flockdb_spark.streaming.ingest import EdgeStreamIngestor, stream_writes


def write_batch(ops_dir, name, ops):
    ops_dir.mkdir(parents=True, exist_ok=True)
    with open(ops_dir / name, "w") as f:
        for op in ops:
            f.write(json.dumps(op) + "\n")


def op(op_state, src, dst, ts, pos=0):
    return {
        "op_state": op_state,
        "graph_id": 1,
        "source_id": src,
        "destination_id": dst,
        "position": pos,
        "updated_at": ts,
    }


def test_stream_ingest_merges(spark, tmp_path):
    ops_dir = tmp_path / "journal"
    write_batch(ops_dir, "b1.json", [op(0, 1, 10, 1000, 5), op(0, 1, 11, 1000, 6)])

    ing = EdgeStreamIngestor(spark, str(tmp_path / "table"), str(tmp_path / "ckpt"))
    ing.run_available(stream_writes(spark, str(ops_dir)))
    assert ing.edges().count() == 2

    # second journal batch: remove one edge, replay the other (idempotent),
    # and deliver an out-of-order stale op that must lose
    write_batch(
        ops_dir,
        "b2.json",
        [op(1, 1, 10, 2000), op(0, 1, 11, 1000, 6), op(2, 1, 11, 500)],
    )
    ing.run_available(stream_writes(spark, str(ops_dir)))
    rows = {r["destination_id"]: r for r in ing.edges().collect()}
    assert rows[10]["state"] == 1 and rows[10]["updated_at"] == 2000
    assert rows[11]["state"] == 0 and rows[11]["updated_at"] == 1000  # stale archive lost
    md = {r["source_id"]: r for r in ing.metadata().collect()}
    assert md[1]["count"] == 1  # one Normal edge left


def test_stateful_lww_operator(spark, tmp_path):
    """applyInPandasWithState W2: winners update across micro-batches; stale
    and duplicate ops emit nothing; equal-ts conflict resolves by priority."""
    from flockdb_spark.streaming.stateful import stateful_edge_lww
    from flockdb_spark.streaming.ingest import stream_writes

    ops_dir = tmp_path / "journal"
    # batch 1: two adds; batch 2: remove@2000 for d=10, equal-ts archive-vs-
    # negate for d=11 (archive prio 2 > negate prio 1), stale dup for d=12
    write_batch(ops_dir, "b1.json", [op(0, 1, 10, 1000, 5), op(0, 1, 11, 1500, 6), op(0, 1, 12, 1000, 7)])
    write_batch(ops_dir, "b2.json", [op(1, 1, 10, 2000), op(3, 1, 11, 1500), op(2, 1, 11, 1500), op(0, 1, 12, 1000, 7)])

    out = stateful_edge_lww(stream_writes(spark, str(ops_dir), max_files_per_trigger=1))
    q = (
        out.writeStream.format("memory")
        .queryName("lww_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    updates = spark.sql("SELECT * FROM lww_updates").collect()
    # final winner per key = last update emitted for it
    final = {}
    for r in updates:
        final[(r["graph_id"], r["source_id"], r["destination_id"])] = (r["updated_at"], r["state"], r["position"])
    # remove wins by time but PRESERVES the edge's position (updateEdge rule)
    assert final[(1, 1, 10)] == (2000, 1, 5)
    # equal-ts: archive outranks negate; position stays from the add
    assert final[(1, 1, 11)] == (1500, 2, 6)
    assert final[(1, 1, 12)] == (1000, 0, 7)     # duplicate delivery: unchanged
    # the duplicate op must NOT have produced a second update for d=12
    assert sum(1 for r in updates if r["destination_id"] == 12) == 1


def test_windowed_write_rates_watermark(spark, tmp_path):
    """Append-mode watermark contract: a window emits exactly once, when the
    watermark passes its end; stragglers beyond the watermark are dropped
    (while the merge path would still apply them — the documented division of
    labor).  Update mode would be weaker: late rows may still hit state that
    hasn't been evicted yet."""
    from flockdb_spark.streaming.ingest import stream_writes
    from flockdb_spark.streaming.windows import windowed_write_rates

    t0 = 1_700_000_000 - 1_700_000_000 % 600  # aligned to a 10-min window
    ops_dir = tmp_path / "journal"
    # batch 1: two ops in window W0, then one far ahead (advances the
    # watermark to t0+2h-30m, far past W0's end)
    write_batch(
        ops_dir,
        "b1.json",
        [op(0, 1, 10, t0 + 10), op(0, 1, 11, t0 + 20), op(0, 1, 12, t0 + 7200)],
    )
    # batch 2: a straggler that still lands — the watermark advances at
    # batch boundaries, so W0's state is evicted at the END of this batch
    write_batch(ops_dir, "b2.json", [op(0, 1, 13, t0 + 30)])
    # batch 3: past eviction — MUST be dropped, and W0 must not re-emit
    write_batch(ops_dir, "b3.json", [op(0, 1, 14, t0 + 40)])
    # the file source orders batches by modification time — make it explicit
    # so the watermark-advancing batch really processes first
    import os

    for i, name in enumerate(["b1.json", "b2.json", "b3.json"]):
        os.utime(ops_dir / name, (1_000_000_000 + 100 * i,) * 2)

    out = windowed_write_rates(stream_writes(spark, str(ops_dir), max_files_per_trigger=1))
    q = (
        out.writeStream.format("memory")
        .queryName("write_rates")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT window_start, n_ops FROM write_rates").collect()
    emitted = {(int(r["window_start"].timestamp()), r["n_ops"]) for r in rows}
    # W0 emitted exactly ONCE, at eviction (batch 2's straggler beat the
    # eviction and counts; batch 3's arrived after and must not re-open W0)
    assert emitted == {(t0, 3)}
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1  # the post-eviction straggler was watermark-dropped


def test_dedup_ops_within_watermark(spark, tmp_path):
    """Redelivered ops within the watermark horizon are dropped (state still
    live); distinct ops all pass.  The merge downstream stays the correctness
    backstop for late duplicates — this only has to never drop a NON-duplicate."""
    from flockdb_spark.streaming.dedup import dedup_ops_within_watermark

    t0 = 1_700_000_000
    ops_dir = tmp_path / "journal"
    # b1: op A twice (same-batch redelivery) + op B
    write_batch(
        ops_dir, "b1.json", [op(0, 1, 10, t0, 5), op(0, 1, 10, t0, 5), op(0, 1, 11, t0, 6)]
    )
    # b2: op A again (cross-batch redelivery, well within the 1h horizon) +
    # a genuinely new op on the same edge (different position → not a dup)
    write_batch(ops_dir, "b2.json", [op(0, 1, 10, t0, 5), op(0, 1, 10, t0 + 60, 7)])
    import os

    for i, name in enumerate(["b1.json", "b2.json"]):
        os.utime(ops_dir / name, (1_000_000_000 + 100 * i,) * 2)

    out = dedup_ops_within_watermark(stream_writes(spark, str(ops_dir), max_files_per_trigger=1))
    q = (
        out.writeStream.format("memory")
        .queryName("deduped_ops")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT source_id, destination_id, position, updated_at FROM deduped_ops"
    ).collect()
    got = sorted((r["destination_id"], r["position"], r["updated_at"]) for r in rows)
    assert got == [(10, 5, t0), (10, 7, t0 + 60), (11, 6, t0)]


def test_incremental_commit_leaves_untouched_buckets_alone(spark, tmp_path):
    """The O(batch) commit contract: a micro-batch rewrites ONLY the hash
    buckets its ops touch — every parquet file in an untouched bucket
    directory survives byte-identical (VERDICT r1 item 6)."""
    import hashlib
    from pathlib import Path

    ops_dir = tmp_path / "journal"
    # batch 1: 40 sources spread over the bucket space
    write_batch(
        ops_dir, "b1.json", [op(0, s, 100 + s, 1000, s) for s in range(1, 41)]
    )
    ing = EdgeStreamIngestor(
        spark, str(tmp_path / "table"), str(tmp_path / "ckpt"), n_buckets=8
    )
    ing.run_available(stream_writes(spark, str(ops_dir)))

    def snapshot(name):
        # committed files per bucket, resolved through the manifest
        out = {}
        for b, d in ing.bucket_paths(name).items():
            for p in sorted(Path(d).glob("*.parquet")):
                out[(b, str(p))] = hashlib.sha256(p.read_bytes()).hexdigest()
        return out

    before_e, before_m = snapshot("edges"), snapshot("metadata")
    assert len({b for b, _ in before_e}) > 1  # really multi-bucket

    # batch 2: touch source 1 only
    write_batch(ops_dir, "b2.json", [op(2, 1, 101, 2000)])
    ing.run_available(stream_writes(spark, str(ops_dir)))
    after_e, after_m = snapshot("edges"), snapshot("metadata")

    from pyspark.sql import functions as F

    touched = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(1).cast("long")), F.lit(8)).cast("int").alias("b")
    ).collect()[0]["b"]
    for before, after in ((before_e, after_e), (before_m, after_m)):
        untouched_before = {k: v for k, v in before.items() if k[0] != touched}
        untouched_after = {k: v for k, v in after.items() if k[0] != touched}
        assert untouched_before == untouched_after  # same committed files, same bytes
    # and the touched bucket did change (new version dir)
    assert {k for k in before_e if k[0] == touched} != {k for k in after_e if k[0] == touched}

    # correctness of the merged state is unchanged by the bucketed layout
    rows = {r["destination_id"]: r for r in ing.edges().collect()}
    assert rows[101]["state"] == 2 and rows[101]["updated_at"] == 2000
    assert rows[101]["position"] == 1  # archive preserves position
    assert rows[140]["state"] == 0
    assert len(rows) == 40


def test_streaming_curation_gates_match_batch(spark, tmp_path):
    """The gate stages must produce identical results under readStream and
    plain read — they are stateless projections, the contract the module
    documents."""
    import json

    from flockdb_spark.sources import corpus
    from flockdb_spark.streaming.curation import curation_gates, stream_curated_corpus

    src = tmp_path / "landing"
    src.mkdir()
    docs = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog",
         "lang": "en", "source": "s", "n_chars": 43},
        {"doc_id": 2, "text": "no marker words here at all frankly",
         "lang": "xx", "source": "s", "n_chars": 35},      # fails lang gate
        {"doc_id": 3, "text": "the the the the the the the the",
         "lang": "en", "source": "s", "n_chars": 31},       # fails distinct ratio
        {"doc_id": 4, "text": "the cat", "lang": "en", "source": "s",
         "n_chars": 7},                                       # too short (< 5 tokens)
    ]
    (src / "batch0.json").write_text("\n".join(json.dumps(d) for d in docs))

    sink = str(tmp_path / "curated")
    q = stream_curated_corpus(
        spark, str(src), sink, str(tmp_path / "ckpt"), trigger_available_now=True
    )
    q.awaitTermination(120)

    streamed = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    batch = {
        r["doc_id"]
        for r in curation_gates(
            corpus.read_documents_jsonl(spark, str(src), keep_corrupt=False)
        ).collect()
    }
    assert streamed == batch == {1}


def test_error_queue_quarantine_and_retry(spark, tmp_path):
    """ErrorHandlingJobQueue parity: malformed ops divert to the error
    journal instead of sinking the micro-batch; a repair hook re-injects
    them through the normal merge; unfixable ops stay journaled."""
    import json

    from flockdb_spark.streaming.ingest import EdgeStreamIngestor, stream_writes

    ops_dir = tmp_path / "journal"
    ops_dir.mkdir()
    ops = [
        {"op_state": 0, "graph_id": 1, "source_id": 10, "destination_id": 20,
         "position": 1, "updated_at": 1000},                     # good
        {"op_state": 9, "graph_id": 1, "source_id": 11, "destination_id": 21,
         "position": 2, "updated_at": 1000},                     # bad_state
        {"op_state": 0, "graph_id": None, "source_id": None,
         "destination_id": 22, "position": 3, "updated_at": 1000},  # null_vertex
    ]
    (ops_dir / "b0.json").write_text("\n".join(json.dumps(o) for o in ops))

    ing = EdgeStreamIngestor(
        spark,
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        n_buckets=4,
        error_dir=str(tmp_path / "errors"),
    )
    ing.run_available(stream_writes(spark, str(ops_dir)))

    assert {r["source_id"] for r in ing.edges().collect()} == {10}  # only the good op
    errs = {r["source_id"]: r["error_reason"] for r in ing.errors().collect()}
    assert errs == {11: "bad_state", None: "null_vertex"}

    # repair: clamp bad states to Normal; the null-vertex op stays broken
    from pyspark.sql import functions as F

    n = ing.retry_errors(
        fix=lambda df: df.withColumn(
            "op_state",
            F.when(F.col("op_state").isin(0, 1, 2, 3), F.col("op_state")).otherwise(0),
        )
    )
    assert n == 1
    assert {r["source_id"] for r in ing.edges().collect()} == {10, 11}
    left = {r["error_reason"] for r in ing.errors().collect()}
    assert left == {"null_vertex"}


def test_compaction_one_file_per_bucket_data_identical(spark, tmp_path):
    """Per-batch commits accumulate one file per touched bucket; compact()
    must coalesce fat buckets to a single sorted file, leave thin buckets'
    files untouched on disk, and preserve the table contents exactly."""
    import glob
    import json

    from flockdb_spark.streaming.ingest import EdgeStreamIngestor, stream_writes

    ops_dir = tmp_path / "journal"
    ops_dir.mkdir()
    # 3 journal files -> 3 micro-batches, all touching source 10 (same
    # bucket); source 99 touched once (thin bucket stays as-is)
    for i in range(3):
        batch = [{"op_state": 0, "graph_id": 1, "source_id": 10,
                  "destination_id": 20 + i, "position": i, "updated_at": 1000 + i}]
        if i == 0:
            batch.append({"op_state": 0, "graph_id": 1, "source_id": 99,
                          "destination_id": 1, "position": 0, "updated_at": 1000})
        (ops_dir / f"b{i}.json").write_text("\n".join(json.dumps(o) for o in batch))

    ing = EdgeStreamIngestor(
        spark, str(tmp_path / "table"), str(tmp_path / "ckpt"), n_buckets=4
    )
    ing.run_available(stream_writes(spark, str(ops_dir), max_files_per_trigger=1))

    # fragment the hot bucket the way a task-parallel bulk commit would:
    # extra files landing in the bucket's COMMITTED version dir (files inside
    # a committed dir are visible; uncommitted version dirs are not)
    from flockdb_spark.schema import EDGE_SCHEMA
    from pyspark.sql import functions as F

    hot = ing.bucket_paths("edges")
    hot_bucket = next(
        b for b, d in hot.items()
        if any(r["source_id"] == 10 for r in spark.read.parquet(d).collect())
    )
    extra = spark.createDataFrame(
        [(1, 10, 50, 50, 2000, 0, 0), (1, 10, 51, 51, 2000, 0, 0)],
        EDGE_SCHEMA,
    )
    extra.coalesce(1).drop("bucket").write.mode("append").parquet(hot[hot_bucket])

    files_before = {b: sorted(glob.glob(f"{d}/*.parquet")) for b, d in ing.bucket_paths("edges").items()}
    assert any(len(f) > 1 for f in files_before.values())  # fat bucket exists
    before = sorted(map(tuple, ing.edges().collect()))

    n = ing.compact()
    assert n >= 1
    files_after = {b: sorted(glob.glob(f"{d}/*.parquet")) for b, d in ing.bucket_paths("edges").items()}
    assert all(len(f) == 1 for f in files_after.values())
    # thin buckets were not rewritten (same committed file paths survive)
    for b, fs in files_before.items():
        if len(fs) == 1:
            assert files_after[b] == fs, b
    after = sorted(map(tuple, ing.edges().collect()))
    assert after == before
    # vacuum drops the versions compaction superseded; contents unchanged
    assert ing.vacuum() >= 1
    assert sorted(map(tuple, ing.edges().collect())) == before


def test_atomic_commit_no_cross_table_skew(spark, tmp_path):
    """The reference's journaled queue never half-applies a write — edges and
    counts move together (doc/blog.md:110-119).  Kill the ingestor between
    the data writes and the manifest rename: readers must see ALL-OLD for
    both tables; the retried batch then lands ALL-NEW."""
    import json

    from flockdb_spark.streaming.ingest import EdgeStreamIngestor, stream_writes

    ops_dir = tmp_path / "journal"
    write_batch(ops_dir, "b1.json", [op(0, 1, 10, 1000, 5)])
    ing = EdgeStreamIngestor(
        spark, str(tmp_path / "table"), str(tmp_path / "ckpt"), n_buckets=4
    )
    ing.run_available(stream_writes(spark, str(ops_dir)))
    v1, _ = ing.latest_commit()
    e_before = sorted(map(tuple, ing.edges().collect()))
    m_before = sorted(map(tuple, ing.metadata().collect()))
    assert len(e_before) == 1 and m_before[0][2] == 1  # count = 1

    # batch 2 archives the edge; crash AFTER both data writes, BEFORE commit
    write_batch(ops_dir, "b2.json", [op(2, 1, 10, 2000)])
    real_commit = ing._commit

    def crash(*a, **kw):
        raise RuntimeError("killed before manifest rename")

    import pytest

    ing._commit = crash
    with pytest.raises(Exception, match="killed before manifest rename"):
        ing.run_available(stream_writes(spark, str(ops_dir)))

    # all-old: BOTH tables still read the previous commit
    assert ing.latest_commit()[0] == v1
    assert sorted(map(tuple, ing.edges().collect())) == e_before
    assert sorted(map(tuple, ing.metadata().collect())) == m_before

    # restore the commit path; the unacknowledged batch replays and lands
    ing._commit = real_commit
    ing.run_available(stream_writes(spark, str(ops_dir)))
    assert ing.latest_commit()[0] > v1
    rows = {r["destination_id"]: r for r in ing.edges().collect()}
    assert rows[10]["state"] == 2 and rows[10]["updated_at"] == 2000
    md = {r["source_id"]: r for r in ing.metadata().collect()}
    # the maintained count moved WITH the edge archive — one commit, no skew
    assert md[1]["count"] == 0


def test_streaming_sessions_match_batch_x20_shape(spark, tmp_path):
    """session_window under readStream must produce the same sessions the
    batch operator computes on the same events once the watermark closes
    them (availableNow drains everything, so all sessions emit)."""
    import json

    from pyspark.sql import functions as F

    from flockdb_spark.streaming.windows import streaming_sessions

    src = tmp_path / "events"
    src.mkdir()
    rows = [
        {"user_id": 1, "ts_s": 1000}, {"user_id": 1, "ts_s": 1400},  # one session
        {"user_id": 1, "ts_s": 1000 + 7200},                          # gap -> new
        {"user_id": 2, "ts_s": 5000},
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    # append mode only emits a session once the watermark passes its end; a
    # second batch far in the future closes all of batch 1's sessions (its
    # own never emits — the stream drains first)
    (src / "b.json").write_text(json.dumps({"user_id": 9, "ts_s": 1_000_000}))
    import os

    os.utime(src / "a.json", (1_000_000_000,) * 2)
    os.utime(src / "b.json", (1_000_000_100,) * 2)

    stream = (
        spark.readStream.schema("user_id long, ts_s long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select("user_id", F.timestamp_seconds("ts_s").alias("event_time"))
    )
    q = (
        streaming_sessions(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    batch = (
        spark.read.json(str(src / "a.json"))
        .select("user_id", F.timestamp_seconds("ts_s").alias("event_time"))
        .groupBy(F.session_window("event_time", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.unix_seconds(F.col("session_window.start")).alias("session_start"),
            F.unix_seconds(F.col("session_window.end")).alias("session_end"),
            "n_events",
        )
    )
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    assert got == want and len(got) == 3


def test_streaming_decontamination_matches_batch(spark, tmp_path):
    """Ingest-time fuzzy decontamination drops exactly the docs the batch
    operator flags — per-batch verdicts depend only on the doc + the pinned
    eval set, so stream == batch by construction."""
    import json

    from pyspark.sql import functions as F

    from flockdb_spark.functions import dedup
    from flockdb_spark.sources import corpus
    from flockdb_spark.streaming.curation import stream_decontaminated_corpus

    src = tmp_path / "landing"
    src.mkdir()
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = [
        {"doc_id": 1, "text": base, "lang": "en", "source": "s", "n_chars": len(base)},
        {"doc_id": 2, "text": "entirely different material nothing shared with benchmarks today",
         "lang": "en", "source": "s", "n_chars": 64},
        {"doc_id": 3, "text": "kilo lima mike november oscar papa quebec romeo sierra tango",
         "lang": "en", "source": "s", "n_chars": 60},
    ]
    # two micro-batch files to exercise the per-batch path
    (src / "b0.json").write_text("\n".join(json.dumps(d) for d in docs[:2]))
    (src / "b1.json").write_text(json.dumps(docs[2]))

    eval_docs = spark.createDataFrame(
        [(100, "alpha bravo charlie delta echo foxtrot golf hotel")],
        "doc_id long, text string",
    )
    sink = str(tmp_path / "clean")
    q = stream_decontaminated_corpus(
        spark, str(src), sink, str(tmp_path / "ckpt"), eval_docs,
        fuzzy=True, num_hashes=16, bands=8, min_est_jaccard_micro=400_000,
    )
    q.awaitTermination(120)

    streamed = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    batch_docs = corpus.read_documents_jsonl(spark, str(src), keep_corrupt=False)
    batch_clean = {
        r["doc_id"]
        for r in dedup.fuzzy_decontaminate(
            batch_docs, eval_docs, num_hashes=16, bands=8,
            min_est_jaccard_micro=400_000,
        ).where(F.col("is_contaminated") == 0).collect()
    }
    assert streamed == batch_clean == {2, 3}


def test_sessions_available_now_matches_batch(spark):
    """The streaming sessionization bridge (file source → session_window →
    availableNow → memory sink) returns exactly the batch x20 sessions."""
    from conftest import SF_DIR
    from flockdb_spark.streaming.windows import sessions_available_now
    from flockdb_spark.queries_ext import x20

    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessions_available_now(spark, SF_DIR).collect()
    }
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in x20(spark, SF_DIR).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_event_rates_available_now_matches_batch(spark):
    from conftest import SF_DIR
    from flockdb_spark.streaming.windows import event_rates_available_now
    from flockdb_spark import tsutil
    from pyspark.sql import functions as F2

    streamed = {
        (r["window_start_s"], r["event_type"], r["n_events"])
        for r in event_rates_available_now(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ts_s = tsutil.epoch_col(ev, "ts", "s")
    batch = {
        (r["w"], r["event_type"], r["n"])
        for r in ev.select((F2.floor(ts_s / 3600) * 3600).cast("long").alias("w"), "event_type")
        .groupBy("w", "event_type")
        .agg(F2.count(F2.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_dedup_index_available_now_matches_batch(spark):
    """The streaming dedup-index bridge (file source → stateful hash-agg →
    availableNow → memory sink) returns exactly the batch x01 index."""
    from conftest import SF_DIR
    from flockdb_spark.streaming.windows import dedup_index_available_now
    from flockdb_spark.functions import dedup

    streamed = {
        (r["kept_doc_id"], r["dup_count"])
        for r in dedup_index_available_now(spark, SF_DIR).collect()
    }
    batch = {
        (r["kept_doc_id"], r["dup_count"])
        for r in dedup.exact_dedup(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_time_travel_snapshots(spark, tmp_path):
    """edges(version=N) reads the store exactly as of commit N; vacuum with
    retention keeps that snapshot alive, vacuum without kills it cleanly."""
    ops_dir = tmp_path / "journal"
    write_batch(ops_dir, "b1.json", [op(0, 1, 10, 1000, 5), op(0, 1, 11, 1000, 6)])
    ing = EdgeStreamIngestor(spark, str(tmp_path / "table"), str(tmp_path / "ckpt"))
    ing.run_available(stream_writes(spark, str(ops_dir)))
    v1 = ing.versions()[-1]

    write_batch(ops_dir, "b2.json", [op(1, 1, 10, 2000), op(0, 1, 12, 1500, 7)])
    ing.run_available(stream_writes(spark, str(ops_dir)))
    v2 = ing.versions()[-1]
    assert v2 > v1

    # the pinned snapshot sees only batch-1 state: edge 12 absent, 10 Normal
    old = {r["destination_id"]: r for r in ing.edges(version=v1).collect()}
    assert set(old) == {10, 11} and old[10]["state"] == 0
    new = {r["destination_id"]: r for r in ing.edges().collect()}
    assert set(new) == {10, 11, 12} and new[10]["state"] == 1
    # metadata travels with the same manifest — all-old, never mixed
    md_old = {r["source_id"]: r for r in ing.metadata(version=v1).collect()}
    assert md_old[1]["count"] == 2

    # retention keeps v1 readable; dropping retention removes it cleanly
    ing.vacuum(keep_versions=1)
    assert {r["destination_id"] for r in ing.edges(version=v1).collect()} == {10, 11}
    ing.vacuum(keep_versions=0)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in the commit log"):
        ing.edges(version=v1)
    assert {r["destination_id"] for r in ing.edges().collect()} == {10, 11, 12}


def test_sketch_available_now_matches_batch(spark):
    """The streaming sketch bridge returns exactly the batch x80 cell
    table — cell addition is associative over any input grouping."""
    from conftest import SF_DIR
    from flockdb_spark.streaming.windows import sketch_available_now
    from flockdb_spark.functions import text as textf

    streamed = {
        (r["row"], r["bucket"], r["cnt"])
        for r in sketch_available_now(spark, SF_DIR).collect()
    }
    batch = {
        (r["row"], r["bucket"], r["cnt"])
        for r in textf.count_min_sketch(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_interval_join_available_now_matches_batch(spark):
    """The stream-stream interval join emits exactly the batch self-join's
    pair set (inner joins emit on match; the availableNow drain sees the
    whole backlog)."""
    from conftest import SF_DIR
    from flockdb_spark.streaming.windows import interval_join_available_now
    from flockdb_spark import tsutil
    from pyspark.sql import functions as F

    streamed = {
        (r["click_event_id"], r["purchase_event_id"], r["user_id"], r["delay_s"])
        for r in interval_join_available_now(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ts = tsutil.epoch_col(ev, "ts", "s")
    sides = ev.select("event_id", "user_id", "event_type", ts.alias("t"))
    a = sides.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("ca"), F.col("user_id").alias("ua"), F.col("t").alias("ta"))
    b = sides.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("cb"), F.col("user_id").alias("ub"), F.col("t").alias("tb"))
    batch = {
        (r["ca"], r["cb"], r["ua"], r["tb"] - r["ta"])
        for r in a.join(
            b,
            (F.col("ua") == F.col("ub"))
            & (F.col("tb") >= F.col("ta"))
            & (F.col("tb") <= F.col("ta") + 3600),
        ).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_priority_ordered_drain(spark, tmp_path):
    """W12 priority classes (Priority.scala:19-23): one journal holding
    High, Medium (default), and Low ops drains class-by-class — every High
    op is committed in an EARLIER manifest version than any Medium op,
    which is earlier than any Low op; final merged state is unaffected."""
    from flockdb_spark.streaming.ingest import (
        PRIORITY_HIGH,
        PRIORITY_LOW,
    )

    ops_dir = tmp_path / "journal"
    lo = dict(op(0, 1, 30, 1000, 3), priority=PRIORITY_LOW)
    hi = dict(op(0, 1, 10, 1000, 1), priority=PRIORITY_HIGH)
    med = op(0, 2, 20, 1000, 2)  # no priority field -> Medium default
    # one file mixing all classes + one more low-priority file
    write_batch(ops_dir, "b1.json", [lo, hi, med])
    write_batch(ops_dir, "b2.json", [dict(op(0, 1, 31, 1000, 4), priority=PRIORITY_LOW)])

    ing = EdgeStreamIngestor(spark, str(tmp_path / "table"), str(tmp_path / "ckpt"))
    ing.drain_prioritized(str(ops_dir))

    def first_version_with(dst):
        for v in ing.versions():
            if ing.edges(version=v).where(f"destination_id = {dst}").count():
                return v
        raise AssertionError(f"edge {dst} never committed")

    v_hi, v_med = first_version_with(10), first_version_with(20)
    v_lo, v_lo2 = first_version_with(30), first_version_with(31)
    assert v_hi < v_med < min(v_lo, v_lo2)
    # the merged end state is the same regardless of drain order
    assert {r["destination_id"] for r in ing.edges().collect()} == {10, 20, 30, 31}
    md = {(r["graph_id"], r["source_id"]): r["count"] for r in ing.metadata().collect()}
    assert md[(1, 1)] == 3 and md[(1, 2)] == 1  # counts span all classes


def test_ivf_cells_available_now_matches_batch_assignment(spark):
    """x119: the streaming IVF cell index (file source → JVM argmax-dot
    assignment → stateful per-cell count/min → availableNow → memory sink)
    returns exactly the batch IVF assignment's per-cell populations — the
    same deterministic quantizer ivf_ann_topk uses (16 smallest-id
    centroids, ties to the lower cid)."""
    import numpy as np

    from conftest import SF_DIR
    from flockdb_spark.streaming.windows import ivf_cells_available_now

    streamed = {
        (r["cell"], r["n_vectors"], r["min_vec_id"])
        for r in ivf_cells_available_now(spark, SF_DIR).collect()
    }

    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    m = np.array([r["embedding"] for r in rows], dtype=np.float64) * 1e6
    x = (np.trunc(np.abs(m) + 0.5) * np.sign(m)).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, x = ids[order], x[order]
    cents = x[:16]
    cell = np.argsort(-(x.astype(np.float64) @ cents.T.astype(np.float64)).astype(np.int64),
                      axis=1, kind="stable")[:, 0]
    expect = {
        (int(c), int((cell == c).sum()), int(ids[cell == c].min()))
        for c in np.unique(cell)
    }
    assert streamed == expect and len(streamed) > 0


def test_ivf_cells_update_mode_upsert_matches_batch(spark, tmp_path):
    """x119 UPDATE-mode path (VERDICT r8 item 5): the production deployment
    runs the streaming IVF cell index in update mode with an upserting sink.
    Replay two OUT-OF-ORDER micro-batches (the globally smallest vec_id
    arrives in the SECOND batch, so the upsert must overwrite both the count
    and the min of an already-emitted cell) and assert the upserted store
    equals the batch aggregate over the full data — the same stream==batch
    parity the other four streaming bridges pin."""
    import os
    import time

    from flockdb_spark.streaming.windows import streaming_ivf_cell_index

    # 4 obvious cells on a 4-dim grid: centroid c points along axis c
    centroids = [(c, [1_000_000 if i == c else 0 for i in range(4)]) for c in range(4)]

    def vec(axis, vid):
        # vectors near axis `axis` (dot with centroid `axis` dominates)
        return (vid, [1.0 if i == axis else 0.01 for i in range(4)])

    # batch 1: the HIGH ids of cells 0/1/2; batch 2: the low ids (including
    # each cell's global min) plus cell 3's only members — out-of-order by id
    b1 = [vec(a, 100 + a * 10 + j) for a in (0, 1, 2) for j in range(3)]
    b2 = [vec(a, a + 1) for a in (0, 1, 2)] + [vec(3, 50), vec(3, 51)]
    schema = "vec_id long, embedding array<double>"
    d1, d2 = str(tmp_path / "in"), str(tmp_path / "in")
    os.makedirs(d1, exist_ok=True)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(d1)
    time.sleep(1.1)  # distinct mtimes: the file source orders batches by them
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(d2)

    emb = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d1)
    )
    store: dict[int, tuple[int, int]] = {}
    epochs: list[int] = []

    def upsert(df, epoch_id):
        rows = df.collect()
        if rows:
            epochs.append(int(epoch_id))
        for r in rows:  # last-write-wins per cell: the update-mode contract
            store[int(r["cell"])] = (int(r["n_vectors"]), int(r["min_vec_id"]))

    q = (
        streaming_ivf_cell_index(emb, centroids)
        .writeStream.outputMode("update")
        .foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "availableNow drain did not finish"
    q.stop()

    # the replay really was incremental: >1 micro-batch emitted rows
    assert len(epochs) >= 2, epochs

    batch_df = spark.createDataFrame(b1 + b2, schema)
    expect = {
        int(r["cell"]): (int(r["n_vectors"]), int(r["min_vec_id"]))
        for r in streaming_ivf_cell_index(batch_df, centroids).collect()
    }
    assert store == expect and len(expect) == 4
    # and the out-of-order arrival exercised a genuine UPSERT: cells 0-2
    # finish with a smaller min (and larger count) than batch 1 alone gave
    first_only = {
        int(r["cell"]): (int(r["n_vectors"]), int(r["min_vec_id"]))
        for r in streaming_ivf_cell_index(
            spark.createDataFrame(b1, schema), centroids
        ).collect()
    }
    for c in (0, 1, 2):
        assert store[c][0] > first_only[c][0] and store[c][1] < first_only[c][1]
