"""simhash_near_pairs: pure-python brute-force differential (the banded
candidate generation must find EVERY pair within max_distance — pigeonhole
over nibbles guarantees it), plus the Spark operator vs the same oracle."""

from __future__ import annotations

from hashlib import md5

import duckdb

from lightrag_spark.operators.datapipe import (
    SIMHASH_BAND_BITS,
    SIMHASH_BAND_MASK,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_HEX_CHARS,
    SIMHASH_NEAR_BITS,
)

SF = "/root/testdata/sf0.001"


def _py_simhash(text: str) -> int:
    """Shingle-featured simhash (3-gram word shingles — the minhash
    feature set); returns 0 for documents too short to shingle, which the
    operator excludes entirely (callers below mirror that)."""
    from lightrag_spark.operators.datapipe import SHINGLE_N

    toks = text.strip().split()
    if len(toks) < SHINGLE_N:
        return -1  # sentinel: no features, doc excluded
    sums = [0] * SIMHASH_BITS
    for tok in dict.fromkeys(
        " ".join(toks[i : i + SHINGLE_N]) for i in range(len(toks) - SHINGLE_N + 1)
    ):
        hv = int(md5(tok.encode("utf-8", "replace")).hexdigest()[:SIMHASH_HEX_CHARS], 16)
        for b in range(SIMHASH_BITS):
            sums[b] += 1 if (hv >> b) & 1 else -1
    fp = 0
    for b in range(SIMHASH_BITS):
        if sums[b] > 0:
            fp |= 1 << b
    return fp


def _docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, trim(text) FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def test_pigeonhole_banding_is_lossless():
    """Every pair within SIMHASH_NEAR_BITS hamming bits shares >=1 band
    (3 differing bits cannot touch all 4 bands), so banded candidates
    are a superset of true near-pairs — verified on the real corpus."""
    docs = _docs()
    fps = {d: _py_simhash(t) for d, t in docs}
    fps = {d: f for d, f in fps.items() if f >= 0}
    ids = sorted(fps)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(fps[a] ^ fps[b]).count("1") <= SIMHASH_NEAR_BITS:
                brute.add((a, b))
    banded = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            for nib in range(SIMHASH_BANDS):
                sh = nib * SIMHASH_BAND_BITS
                if (fps[a] >> sh) & SIMHASH_BAND_MASK == (fps[b] >> sh) & SIMHASH_BAND_MASK:
                    banded.add((a, b))
                    break
    missed = brute - banded
    assert not missed, f"banding lost near-pairs: {sorted(missed)[:5]}"


def test_spark_operator_matches_brute_force(spark):
    from lightrag_spark.operators.datapipe import simhash_near_pairs

    docs_df = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r.doc_a, r.doc_b): r.distance for r in simhash_near_pairs(docs_df).collect()
    }
    docs = _docs()
    fps = {d: _py_simhash(t) for d, t in docs}
    fps = {d: f for d, f in fps.items() if f >= 0}
    ids = sorted(fps)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(fps[a] ^ fps[b]).count("1")
            if d <= SIMHASH_NEAR_BITS:
                want[(a, b)] = d
    assert got == want
