"""Product quantization — training quality, recall, and the code contract.

PQ is iteratively trained (not DuckDB-replayable), so like IVF it is gated
by measurement: reconstruction error must fall as codebooks grow, the
ADC+exact-rerank pipeline must recover the true L2 top-k on the real
testdata embeddings, and encoding must be deterministic.
"""

from __future__ import annotations

import numpy as np
import pytest

from lightrag_spark.operators import pq

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def corpus(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    return ids, V


@pytest.fixture(scope="module")
def codebooks(emb):
    return pq.train_pq(emb)


def test_reconstruction_mse_falls_with_codebook_size(emb):
    """More centroids per subspace => strictly better quantization (the
    measured curve on this corpus: 0.54 @ ksub=16, 0.13 @ 64, 0.03 @ 256)."""
    mse16 = pq.pq_reconstruction_mse(emb, pq.train_pq(emb, ksub=16))
    mse64 = pq.pq_reconstruction_mse(emb, pq.train_pq(emb, ksub=64))
    assert mse64 < mse16 * 0.5
    assert mse64 < 0.2


def test_encode_deterministic_and_compact(emb, codebooks):
    a = {r.vec_id: tuple(r.codes) for r in pq.pq_encode(emb, codebooks).collect()}
    b = {r.vec_id: tuple(r.codes) for r in pq.pq_encode(emb, codebooks).collect()}
    assert a == b
    assert all(len(c) == pq.PQ_M for c in a.values())
    assert all(0 <= x < pq.PQ_KSUB for c in a.values() for x in c)


def test_adc_shortlist_contains_true_neighbors(emb, corpus, codebooks):
    """True L2 top-5 must sit inside the ADC top-50 shortlist for >=90%
    of slots (measured 0.975 at m=16/ksub=64 on this corpus)."""
    ids, V = corpus
    codes = pq.pq_encode(emb, codebooks)
    queries = [(int(ids[i]), V[i]) for i in range(8)]
    got = pq.pq_topk(codes, queries, codebooks, k=50)
    pools: dict = {}
    for r in got.collect():
        pools.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = tot = 0
    for qid, qv in queries:
        d = ((V - qv) ** 2).sum(1)
        d[ids == qid] = np.inf
        for t in ids[np.argsort(d)[:5]]:
            tot += 1
            hits += t in pools[qid]
    assert hits / tot >= 0.9, f"shortlist recall {hits/tot:.3f}"


def test_rerank_recovers_exact_topk(emb, corpus, codebooks):
    """ADC shortlist + exact re-rank == the true L2 top-5 wherever the
    shortlist contains it (>=90% of slots end-to-end)."""
    ids, V = corpus
    codes = pq.pq_encode(emb, codebooks)
    queries = [(int(ids[i]), V[i]) for i in range(8)]
    got = pq.pq_topk_rerank(codes, emb, queries, codebooks, k=5, shortlist=50)
    by_q: dict = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.dist))
    hits = tot = 0
    for qid, qv in queries:
        d = ((V - qv) ** 2).sum(1)
        d[ids == qid] = np.inf
        order = np.argsort(d)[:5]
        true5 = [(int(ids[i]), round(float(d[i]), 6)) for i in order]
        approx = sorted(by_q[qid])
        # re-ranked dists must be EXACT L2 for the returned rows
        for rank, nid, dist in approx:
            assert dist == pytest.approx(((V[ids == nid][0] - qv) ** 2).sum(), abs=1e-4)
        got5 = {nid for _, nid, _ in approx}
        for t, _ in true5:
            tot += 1
            hits += t in got5
    assert hits / tot >= 0.9, f"end-to-end recall {hits/tot:.3f}"


def test_self_excluded(emb, corpus, codebooks):
    ids, V = corpus
    codes = pq.pq_encode(emb, codebooks)
    queries = [(int(ids[0]), V[0])]
    got = pq.pq_topk(codes, queries, codebooks, k=10).collect()
    assert all(r.neighbor_id != r.query_id for r in got)
