"""Corpus source/sink coverage: JSONL in/out roundtrip, corrupt-line
quarantine, and the curated parquet layout's pruning guarantees."""

from pyspark.sql import functions as F

from conftest import SF_DIR
from flockdb_spark.sources import corpus
from test_plans import plan_str


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_jsonl_roundtrip(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "corpus_jsonl")
    corpus.write_documents_jsonl(docs, path, n_files=2)
    back = corpus.read_documents_jsonl(spark, path, keep_corrupt=False)
    assert back.schema == corpus.DOCUMENT_SCHEMA
    assert back.count() == docs.count()
    # value-faithful: same ids and same text hashes both ways
    a = docs.select(F.expr("bit_xor(xxhash64(doc_id, text))")).first()[0]
    b = back.select(F.expr("bit_xor(xxhash64(doc_id, text))")).first()[0]
    assert a == b


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good", "lang": "en", "source": "s", "n_chars": 4}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also good", "lang": "en", "source": "s", "n_chars": 9}\n'
    )
    df = corpus.read_documents_jsonl(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["doc_id"] is None
    good = sorted(r["doc_id"] for r in rows if r["_corrupt_record"] is None)
    assert good == [1, 2]


def test_curated_layout_prunes_partition_and_pushes_id_filter(spark, tmp_path):
    path = str(tmp_path / "curated")
    corpus.write_curated(_docs(spark), path, partition_by="lang")
    back = corpus.read_curated(spark, path)
    q = back.where((F.col("lang") == "en") & (F.col("doc_id") < 50)).select(
        "doc_id", "text"
    )
    plan = plan_str(q)
    # directory-level pruning on the partition column, parquet pushdown on id
    assert "PartitionFilters" in plan and "lang" in plan
    assert "PushedFilters" in plan and "doc_id" in plan.split("PushedFilters", 1)[1][:200]
    # the partition column never reaches the parquet scan schema
    assert q.count() == _docs(spark).where("lang = 'en' AND doc_id < 50").count()


def test_curated_writer_one_file_per_partition_value(spark, tmp_path):
    import glob

    path = str(tmp_path / "curated2")
    corpus.write_curated(_docs(spark), path, partition_by="lang")
    for d in glob.glob(f"{path}/lang=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, d


def test_csv_roundtrip_hostile_text(spark, tmp_path):
    """Free text with commas, RFC 4180 doubled quotes, newlines, and
    non-ASCII must survive the CSV round trip bit-exactly."""
    rows = [
        (0, 'plain words', "en", "s", 11),
        (1, 'comma, separated, values', "en", "s", 24),
        (2, 'she said "hello" twice: ""', "en", "s", 26),
        (3, 'line one\nline two\r\nline three', "en", "s", 29),
        (4, 'unicode: café — 中文', "fr", "s", 14),
        (5, '', "en", "s", 0),           # empty string stays empty string
        (6, None, "en", "s", 0),         # NULL stays NULL (distinct from 5)
        (7, '\\N', "en", "s", 2),        # the classic null SENTINEL is text
        (8, '  padded  ', "en", "s", 10),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "csv_rt")
    corpus.write_documents_csv(df, path)
    back = {
        r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
        for r in corpus.read_documents_csv(spark, path).collect()
    }
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in rows}
    assert back == want  # byte-exact, INCLUDING empty-vs-NULL


def test_csv_roundtrip_matches_jsonl_on_corpus(spark, tmp_path):
    docs = _docs(spark).select("doc_id", "text", "lang", "source", "n_chars")
    cpath, jpath = str(tmp_path / "c"), str(tmp_path / "j")
    corpus.write_documents_csv(docs, cpath)
    corpus.write_documents_jsonl(docs, jpath)
    c = {tuple(r) for r in corpus.read_documents_csv(spark, cpath).collect()}
    j = {
        tuple(r)
        for r in corpus.read_documents_jsonl(spark, jpath, keep_corrupt=False).collect()
    }
    assert c == j and len(c) == docs.count()
