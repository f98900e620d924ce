"""IVF-SQ: cell-probed integer-dot shortlist + exact re-rank.  Trained
coarse stage -> gated by recall measurement like ivf/pq/ivfpq, not DuckDB."""

from __future__ import annotations

import numpy as np
import pytest

from lightrag_spark.operators.ivf import build_ivf_index
from lightrag_spark.operators.sq import ivf_sq_topk

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ivf(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assigned, centroids = build_ivf_index(emb)
    assigned = assigned.localCheckpoint(eager=True)
    vecs = {
        int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    return assigned, centroids, vecs


def _exact_topk(vecs, qid, k):
    q = vecs[qid]
    qn = q / np.linalg.norm(q)

    def cos(v):
        return float(v @ qn / np.linalg.norm(v))

    scored = sorted(
        ((cos(v), i) for i, v in vecs.items() if i != qid), key=lambda t: (-t[0], t[1])
    )
    return [i for _, i in scored[:k]]


def test_ivfsq_recall_and_monotonicity(ivf, spark):
    assigned, centroids, vecs = ivf
    queries = [(i, vecs[i].tolist()) for i in range(6)]
    recalls = {}
    for nprobe in (4, len(centroids)):
        out = ivf_sq_topk(assigned, centroids, queries, k=5, nprobe=nprobe, shortlist=50)
        got = {}
        for r in out.collect():
            got.setdefault(r["query_id"], []).append(r["neighbor_id"])
        hits = total = 0
        for qid, _ in queries:
            exact = set(_exact_topk(vecs, qid, 5))
            hits += len(exact & set(got.get(qid, [])))
            total += 5
        recalls[nprobe] = hits / total
    # probing every cell with a wide shortlist should be near-exact
    assert recalls[len(centroids)] >= 0.9
    # recall must not decrease with more probes
    assert recalls[len(centroids)] >= recalls[4]
    assert recalls[4] >= 0.3  # partial probing still finds most neighbors


def test_ivfsq_empty_queries(ivf):
    assigned, centroids, _ = ivf
    assert ivf_sq_topk(assigned, centroids, [], k=5).count() == 0
