"""ngram_repetition (Gopher repetition ladder) and ccnet_buckets
(head/middle/tail split) — pure-Python mini-oracles, tie-break and
short-doc contracts, and the two-phase-scan vs single-window-ntile
differential the gate's DuckDB twin also enforces."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lightrag_spark.operators.datapipe import (
    CCNET_BUCKETS,
    NGRAM_DUP_NS,
    NGRAM_TOP_NS,
    ccnet_buckets,
    ngram_repetition,
    unigram_logprob,
)


def _py_ngram_row(text: str) -> dict:
    """Reference implementation in plain Python (the same overlap-unaware
    coverage definition the operator documents)."""
    t = text.strip().split()
    n_chars = max(len(text.strip()), 1)
    out = {}
    for n in NGRAM_TOP_NS:
        grams = Counter(
            " ".join(t[i : i + n]) for i in range(len(t) - n + 1)
        )
        if grams:
            # tie-break: max count, lexicographically FIRST gram
            c = max(grams.values())
            best = min(g for g, c2 in grams.items() if c2 == c)
            out[f"top{n}_frac"] = round(c * len(best) / n_chars, 4)
        else:
            out[f"top{n}_frac"] = 0.0
    for n in NGRAM_DUP_NS:
        grams = Counter(
            " ".join(t[i : i + n]) for i in range(len(t) - n + 1)
        )
        cov = sum(c * len(g) for g, c in grams.items() if c > 1)
        out[f"dup{n}_frac"] = round(cov / n_chars, 4)
    return out


_DOCS = [
    (1, "spam ham spam ham spam ham spam ham spam ham spam ham"),
    (2, "x y"),  # fewer than 3 words: every frac 0
    (3, "b a b a b"),  # top3 tie between 'b a b'(2) and nothing else
    (4, "one two three four five six seven eight nine ten eleven twelve"),
    (5, "z z z z z z z z z z z z z z z z z z z z"),
]


def test_ngram_repetition_matches_python_oracle(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in ngram_repetition(df).collect()}
    assert set(got) == {d for d, _ in _DOCS}
    for doc_id, text in _DOCS:
        exp = _py_ngram_row(text)
        for k, v in exp.items():
            assert got[doc_id][k] == v, (doc_id, k, got[doc_id][k], v)


def test_ngram_repetition_short_doc_zero(spark):
    df = spark.createDataFrame([(2, "x y")], "doc_id long, text string")
    row = ngram_repetition(df).collect()[0]
    assert (
        row.top3_frac == row.top4_frac == row.dup5_frac == row.dup10_frac == 0.0
    )
    assert row.n_chars == 3


def test_ngram_repetition_all_same_token(spark):
    """'z' * 20: the single distinct n-gram repeats at every offset, so
    dup coverage exceeds 1.0 — the documented overlap-unaware semantics,
    asserted so nobody 'fixes' it into a silent cap."""
    df = spark.createDataFrame([(5, _DOCS[4][1])], "doc_id long, text string")
    row = ngram_repetition(df).collect()[0]
    assert row.dup5_frac > 1.0
    exp = _py_ngram_row(_DOCS[4][1])
    assert row.dup5_frac == exp["dup5_frac"]


_CORPUS = [
    # three docs of corpus-common words (high unigram logprob)...
    (1, "the the the and and"),
    (2, "the and the and the"),
    (3, "and the and the and"),
    # ...two mixed, two of unique words (low logprob)
    (4, "the and quark boson"),
    (5, "and the gluon hadron"),
    (6, "zyxxy fnord grue wumpus"),
    (7, "qwerty asdf zxcv uiop"),
]


def test_ccnet_buckets_sizes_and_order(spark):
    df = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    got = {r.doc_id: r for r in ccnet_buckets(df).collect()}
    assert len(got) == 7
    sizes = Counter(r.bucket for r in got.values())
    # ntile convention: 7 rows -> 3/2/2
    assert sizes == {"head": 3, "middle": 2, "tail": 2}
    assert set(sizes) <= set(CCNET_BUCKETS)
    # the common-word docs outrank the unique-word docs
    assert {got[1].bucket, got[2].bucket, got[3].bucket} == {"head"}
    assert {got[6].bucket, got[7].bucket} == {"tail"}


def test_ccnet_two_phase_scan_equals_single_window_ntile(spark):
    """The distributed-rank cut must equal a literal ntile(3) over the
    same ordering — the same differential the DuckDB gate runs, here at
    a partition count that forces multiple ranges."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 13} w{i % 7} w{i % 3} filler") for i in range(1, 101)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.bucket for r in ccnet_buckets(docs, partitions=8).collect()}
    scored = unigram_logprob(docs)
    w = Window.orderBy(F.col("avg_logprob").desc(), F.col("doc_id"))
    exp = {
        r.doc_id: ("head", "middle", "tail")[r.tile - 1]
        for r in scored.withColumn("tile", F.ntile(3).over(w)).collect()
    }
    assert got == exp
