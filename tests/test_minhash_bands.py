"""MinHash banding — Arrow kernel vs expression path bit-parity.

The Arrow kernel (datapipe.minhash_band_rows) replaces 12 interpreted
array_min(transform(md5)) folds with one hashlib pass; the expression path
is what the DuckDB oracles replay, so the two must agree byte-for-byte on
(doc_id, band_idx, bucket, sig) — including the Java-vs-Python whitespace
and trim edge cases the kernel reimplements by hand.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lightrag_spark.operators import datapipe as dp

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _rows(df, with_sig):
    if with_sig:
        return {(r.doc_id, r.band_idx, r.bucket, tuple(r.sig)) for r in df.collect()}
    return {(r.doc_id, r.band_idx, r.bucket) for r in df.collect()}


def test_arrow_matches_expression_on_testdata(docs):
    assert _rows(dp.minhash_band_rows(docs), False) == _rows(
        dp.minhash_band_rows(docs, use_arrow=False), False
    )
    assert _rows(dp.minhash_band_rows(docs, with_sig=True), True) == _rows(
        dp.minhash_band_rows(docs, with_sig=True, use_arrow=False), True
    )


def test_shingle_rows_arrow_matches_expression(docs, spark):
    """shingle_rows kernel == explode(shingles_col) on the real corpus
    plus the whitespace/short-doc edge cases (same tokenization contract
    as the minhash kernel)."""
    edge = spark.createDataFrame(
        [(1, "  a b c d  "), (2, "x y"), (3, ""), (4, None),
         (5, "w1\tw2\nw3 w4 w1\tw2\nw3")],
        "doc_id long, text string",
    )
    for frame in (docs, edge):
        a = {(r.doc_id, r.shingle) for r in dp.shingle_rows(frame).collect()}
        b = {
            (r.doc_id, r.shingle)
            for r in dp.shingle_rows(frame, use_arrow=False).collect()
        }
        assert a == b


def test_fingerprints_arrow_matches_expression(docs, spark):
    edge = spark.createDataFrame(
        [(1, "aa bb cc dd aa bb cc"), (2, "too short"), (3, "")],
        "doc_id long, text string",
    )
    for frame in (docs, edge):
        a = {tuple(r) for r in dp.fingerprints(frame).collect()}
        b = {tuple(r) for r in dp.fingerprints(frame, use_arrow=False).collect()}
        assert a == b


def test_arrow_matches_expression_on_whitespace_edges(spark):
    """Tokenization must agree where Java and Python whitespace semantics
    diverge: Unicode spaces (NOT split by Java \\s), control chars <= U+0020
    (stripped by Java trim), tab/newline runs, and too-short docs."""
    cases = [
        (1, "alpha beta gamma delta"),
        (2, "  \t alpha\nbeta\x0bgamma\fdelta \r "),
        (3, "alpha beta gamma delta epsilon"),  # NBSP is NOT Java \s
        (4, "\x01alpha beta gamma\x02"),  # controls stripped by trim only at ends
        (5, "one two"),  # < SHINGLE_N tokens -> no rows
        (6, ""),
        (7, "x " * 40),
    ]
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    arrow = _rows(dp.minhash_band_rows(docs, with_sig=True), True)
    expr = _rows(dp.minhash_band_rows(docs, with_sig=True, use_arrow=False), True)
    assert arrow == expr
    assert not any(t[0] in (5, 6) for t in arrow)


def test_near_duplicate_pairs_finds_planted_pair(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra tail"),  # near-dup of 1 (J=0.857, shares 2 bands)
            (3, "completely different content about spark shuffles and joins ok"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b) for r in dp.near_duplicate_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_incremental_near_pairs_against_persisted_index(spark, tmp_path):
    """Crawl-epoch dedup: index a corpus once, probe a new batch against
    it — planted near-dup found with the exact Jaccard, unrelated and
    new-vs-new pairs absent."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    corpus = spark.createDataFrame(
        [
            (1, base),
            (3, "completely different content about spark shuffles and joins ok"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "mhidx")
    dp.save_minhash_index(corpus, path)

    new = spark.createDataFrame(
        [
            (100, base + " extra tail"),       # near-dup of indexed doc 1
            (101, base + " extra tail bis"),   # near-dup of 1 AND of 100
            (102, "totally unrelated words about gardening tomatoes in spring"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.new_doc_id, r.indexed_doc_id): r.jaccard
        for r in dp.incremental_near_pairs(spark, new, path).collect()
    }
    assert (100, 1) in got and got[(100, 1)] >= 0.8
    assert (101, 1) in got
    # new-vs-new (100 vs 101) is NOT this operator's scope
    assert all(b in (1, 3) for _, b in got)
    assert all(a != 102 for a, _ in got)


def test_stream_near_dup_probe(spark, tmp_path):
    """Streaming face of the epoch probe: docs land in a directory, the
    availableNow stream probes them against the persisted index via
    foreachBatch, matches append to the sink exactly once."""
    import time

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    corpus = spark.createDataFrame(
        [(1, base), (3, "different content about spark shuffles and joins here")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mhidx")
    dp.save_minhash_index(corpus, idx)

    docs_dir = str(tmp_path / "incoming")
    spark.createDataFrame(
        [(100, base + " extra tail"), (102, "gardening tomatoes in the spring sun")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(docs_dir)

    out = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")
    from lightrag_spark.streaming.incremental import stream_near_dup_probe

    q = stream_near_dup_probe(spark, docs_dir, idx, out, ckpt)
    q.awaitTermination(120)
    got = {
        (r.new_doc_id, r.indexed_doc_id)
        for r in spark.read.parquet(out).collect()
    }
    assert (100, 1) in got
    assert all(a != 102 for a, _ in got)

    # re-running the same stream over the same checkpoint reprocesses
    # nothing (exactly-once over the already-seen files)
    q2 = stream_near_dup_probe(spark, docs_dir, idx, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(got)

    # retry semantics: losing the checkpoint REPLAYS batch 0 — the
    # batch_id-partitioned overwrite sink must absorb the replay without
    # duplicating rows (idempotent, not blind-append)
    import shutil

    shutil.rmtree(ckpt)
    q3 = stream_near_dup_probe(spark, docs_dir, idx, out, str(tmp_path / "ckpt2"))
    q3.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(got)
