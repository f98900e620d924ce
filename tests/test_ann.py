"""ANN (random-hyperplane LSH) — recall vs brute force, plan shape, and
cross-engine signature parity.

The reference's vector retrieval is a brute-force cosine scan
(kg/nano_vector_db_impl.py); ann.py is the bucketed scale path.  The
VERDICT gate for it: recall >= 0.9 of the true cosine top-5 on the real
testdata embeddings, and no cartesian product anywhere in the plan.
"""

from __future__ import annotations

import numpy as np
import pytest

from lightrag_spark.operators import ann
from lightrag_spark.operators import datapipe as dp

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _numpy_top5(vectors: np.ndarray) -> np.ndarray:
    vn = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    sims = vn @ vn.T
    np.fill_diagonal(sims, -2.0)
    return np.argsort(-sims, axis=1)[:, :5]


def test_ann_candidate_recall_vs_brute_force(spark, emb):
    """Bucket-derived candidate pools must contain >=90% of each vector's
    true cosine top-5 (measured over ALL 500 vectors as queries)."""
    rows = emb.orderBy("vec_id").collect()
    ids = [r.vec_id for r in rows]
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    idx_of = {v: i for i, v in enumerate(ids)}
    true5 = _numpy_top5(vecs)

    bands = ann.ann_bands(emb).collect()
    buckets: dict = {}
    for r in bands:
        buckets.setdefault((r.band_idx, r.bucket), []).append(idx_of[r.vec_id])
    cand = [set() for _ in ids]
    for members in buckets.values():
        if len(members) > 1:
            for m in members:
                cand[m].update(members)

    hits = total = 0
    for i in range(len(ids)):
        pool = cand[i] - {i}
        for t in true5[i]:
            total += 1
            hits += t in pool
    recall = hits / total
    assert recall >= 0.9, f"ANN candidate recall {recall:.3f} < 0.9"


def test_ann_topk_matches_brute_force_within_candidates(spark, emb):
    """For every query, ann_topk's ranked neighbours must be the true
    nearest among its candidate pool: sims agree with the brute-force
    operator (dp.cosine_topk) wherever both rank the same neighbour."""
    brute = {
        (r.query_id, r.neighbor_id): r.sim for r in dp.cosine_topk(emb).collect()
    }
    approx = ann.ann_topk(emb).collect()
    assert len(approx) > 0
    for r in approx:
        key = (r.query_id, r.neighbor_id)
        if key in brute:
            assert abs(brute[key] - r.sim) < 1e-9


def test_ann_plans_have_no_cartesian_product(spark, emb):
    for df in (ann.ann_topk(emb), ann.knn_label_vote_lsh(emb)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # The ONLY nested-loop joins allowed are the megabucket guard's
        # scalar-threshold joins: build side is a grouping-free aggregate
        # (exactly one row — a scalar subquery shape, linear not quadratic),
        # recognizable by the `_n <= _thr` condition.
        for line in plan.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                assert "_thr" in line, line


def test_knn_lsh_vote_agrees_with_exact_knn_mostly(spark, emb):
    """LSH-kNN is approximate.  Candidate recall is 0.95 (test above), but
    a single missed neighbour can flip a 3-2 majority, so label agreement
    amplifies recall misses — measured 0.898 on this data; gate at 0.85."""
    exact = {r.vec_id: r.predicted_label for r in dp.knn_label_vote(emb).collect()}
    lsh = {r.vec_id: r.predicted_label for r in ann.knn_label_vote_lsh(emb).collect()}
    assert len(lsh) >= 0.99 * len(exact)  # nobody (or almost nobody) drops out
    agree = sum(1 for k, v in lsh.items() if exact.get(k) == v)
    assert agree / len(lsh) >= 0.85


def test_signature_parity_spark_vs_duckdb(spark, emb):
    """The md5-derived hyperplane signatures must be bit-identical between
    Spark's zip_with/aggregate fold and DuckDB's list_dot_product."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    oracle = con.execute(
        ann.duckdb_bands_cte(64)
        + "SELECT vec_id, band_idx, bucket FROM bands ORDER BY vec_id, band_idx"
    ).fetchall()
    got = [
        (r.vec_id, r.band_idx, r.bucket)
        for r in ann.ann_bands(emb).orderBy("vec_id", "band_idx").collect()
    ]
    assert got == [(a, b, c) for a, b, c in oracle]


def test_hyperplanes_are_deterministic():
    h1 = ann.hyperplanes(64)
    h2 = ann.hyperplanes(64)
    assert h1 == h2
    assert all(-1.0 <= x < 1.0 for row in h1 for x in row)
    # not degenerate: components vary
    assert len({round(x, 6) for x in h1[0]}) > 32


def test_persisted_index_probe_matches_inline(spark, emb, tmp_path):
    """build_ann_index + ann_topk_with_index == ann_topk (same buckets),
    and the probe plan prunes partitions by band_idx."""
    idx = str(tmp_path / "ann_index")
    ann.build_ann_index(emb, idx)
    inline = {(r.query_id, r.rank): r.neighbor_id for r in ann.ann_topk(emb).collect()}
    probed = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ann.ann_topk_with_index(spark, idx, emb).collect()
    }
    assert probed == inline


def test_megabucket_prune_caps_candidate_blowup(spark):
    """A flood of identical vectors forms one degenerate bucket per band;
    the guard drops those buckets so candidates stay bounded while normal
    neighbourhoods survive."""
    import pyspark.sql.functions as F

    base = spark.range(0, 40).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(64)),
                    lambda i: (i * (F.col("id") % 7 + 1)).cast("float") / 100.0
                    ).alias("embedding"),
        (F.col("id") % 3).cast("int").alias("label"),
    )
    # 200 clones of one vector = a megabucket in every band
    flood = spark.range(1000, 1200).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(64)),
                    lambda i: F.lit(0.125).cast("float")).alias("embedding"),
        F.lit(0).cast("int").alias("label"),
    )
    emb2 = base.unionByName(flood)
    unpruned = ann.embedding_near_pairs(emb2, threshold=0.99)
    pruned = ann.embedding_near_pairs(emb2, threshold=0.99, max_bucket=50)
    n_unpruned = unpruned.count()
    assert n_unpruned >= 200 * 199 // 2  # the flood is quadratic
    # guard removed the degenerate 200-member buckets: no flood-flood pair
    # survives (all base vectors here are collinear by construction, so the
    # base's own pairs remain — they live in 40-member buckets <= the cap)
    flood_pairs = pruned.filter("vec_a >= 1000 AND vec_b >= 1000").count()
    assert flood_pairs == 0
    assert pruned.count() == 40 * 39 // 2


def test_multiprobe_improves_candidate_recall(spark, emb):
    """Query-side multi-probe (lowest-margin bit flip) must strictly widen
    candidate pools and raise top-5 recall over single-probe on the real
    embeddings; home buckets are always a subset of the probed set."""
    rows = emb.orderBy("vec_id").collect()
    ids = [r.vec_id for r in rows]
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    idx_of = {v: i for i, v in enumerate(ids)}
    true5 = _numpy_top5(vecs)

    corpus = {}
    for r in ann.ann_bands(emb).collect():
        corpus.setdefault((r.band_idx, r.bucket), []).append(idx_of[r.vec_id])

    def recall(query_rows):
        qb = {}
        for r in query_rows:
            qb.setdefault(idx_of[r.vec_id], set()).add((r.band_idx, r.bucket))
        hits = total = 0
        for i in range(len(ids)):
            pool = set()
            for key in qb.get(i, ()):
                pool.update(corpus.get(key, ()))
            pool.discard(i)
            for t in true5[i]:
                total += 1
                hits += t in pool
        return hits / total

    single = recall(ann.ann_bands(emb).collect())
    multi = recall(ann.ann_query_bands_multiprobe(emb).collect())
    assert multi > single
    assert multi >= 0.97, (single, multi)

    # plumbing: ann_topk(multiprobe=True) returns supersets of candidates,
    # so every returned sim is still an exact cosine and ranks are 1..k
    res = ann.ann_topk(emb, multiprobe=True).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_arrow_bands_identical_to_expression_path(spark):
    """The vectorized (numpy matmul) signature path and the Catalyst
    expression path must emit IDENTICAL (id, band_idx, bucket) rows —
    same hyperplanes, same signs — on the full test corpus."""
    from lightrag_spark.operators.ann import ann_bands

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    arrow = set(map(tuple, ann_bands(emb, use_arrow=True).collect()))
    expr = set(map(tuple, ann_bands(emb, use_arrow=False).collect()))
    assert arrow == expr


def test_arrow_cosine_identical_to_expression_cosine(spark):
    from pyspark.sql import functions as F

    from lightrag_spark.operators.ann import _cosine, cosine_arrow

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ia") == (F.col("ib") + 7) % 500)
    both = pairs.select(
        "ia", "ib",
        _cosine(F.col("va"), F.col("vb")).alias("c_expr"),
        cosine_arrow(F.col("va"), F.col("vb")).alias("c_arrow"),
    )
    diff = both.filter(F.col("c_expr") != F.col("c_arrow")).count()
    assert diff == 0


def test_megabucket_guard_bounds_skew_floods(spark):
    """Inject a 50%-identical-vector flood: the auto guard must (a) prune
    the flooded buckets, (b) keep the job's candidate volume bounded by the
    honest corpus, (c) enumerate exactly what it dropped — while leaving a
    skew-free corpus untouched (threshold is a no-op there)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from lightrag_spark.operators.ann import (
        ann_bands,
        ann_topk,
        dropped_megabuckets,
        prune_megabuckets,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = emb.count()

    # skew-free corpus: auto threshold prunes NOTHING (oracle safety)
    clean_bands = ann_bands(emb)
    assert dropped_megabuckets(clean_bands).count() == 0

    # flood: clone one vector n times with fresh ids (50% of the corpus)
    one = emb.limit(1).collect()[0]
    flood = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [10_000 + i for i in range(n)],
                "embedding": [list(one["embedding"])] * n,
                "label": [one["label"]] * n,
            }
        )
    ).select("vec_id", F.col("embedding").cast("array<float>"), "label")
    skewed = emb.select("vec_id", "embedding", "label").unionByName(flood)

    bands = ann_bands(skewed)
    dropped = dropped_megabuckets(bands).collect()
    assert dropped, "flooded buckets must be detected"
    # every dropped bucket is a genuine flood (>= the clone cohort)
    assert all(r["_n"] >= n for r in dropped)

    pruned = prune_megabuckets(bands)
    sizes = (
        pruned.groupBy("band_idx", "bucket").count().agg(F.max("count")).collect()[0][0]
    )
    # surviving buckets are honest-corpus sized, so the self-join output is
    # bounded by sum(bucket^2) over NORMAL buckets — the flood's n^2 rows
    # never materialize
    assert sizes < n
    # and the guarded operator completes end-to-end on the skewed corpus
    got = ann_topk(skewed, n_queries=4, k=3)
    assert got.count() > 0


def test_auto_rows_per_band_rule():
    """Width floors at 3 through the oracle-checked scales (sf0.01/sf0.1)
    and grows ~log2(N) beyond, clamped at ANN_MAX_ROWS."""
    assert ann.auto_rows_per_band(0) == 3
    assert ann.auto_rows_per_band(200) == 3      # sf0.01
    assert ann.auto_rows_per_band(2_000) == 3    # sf0.1
    assert ann.auto_rows_per_band(20_000) == 7   # sf1 (10x)
    assert ann.auto_rows_per_band(1_000_000) == 12
    assert ann.auto_rows_per_band(10**12) == ann.ANN_MAX_ROWS


def test_wide_bands_keep_exact_duplicates(spark, emb):
    """The scale story of auto width: wider bands shrink buckets, but
    exact duplicates collide at ANY width — a 10x-replicated corpus must
    still yield every copy-pair from embedding_near_pairs, and the kernel
    path must complete without the pair-join vector shuffle."""
    from pyspark.sql import functions as F

    copies = 4
    base = emb.select("vec_id", "embedding", "label").limit(50)
    dup = base
    for i in range(1, copies):
        dup = dup.unionByName(
            base.select(
                (F.col("vec_id") + 10_000 * i).alias("vec_id"), "embedding", "label"
            )
        )
    # force a wide layout (as auto would pick for a big corpus)
    pairs = ann.embedding_near_pairs(dup, threshold=0.999, rows=6, max_bucket=None)
    got = {(r.vec_a, r.vec_b) for r in pairs.collect()}
    for r in base.collect():
        group = sorted(r.vec_id + 10_000 * i for i in range(copies))
        for i in range(copies):
            for j in range(i + 1, copies):
                assert (group[i], group[j]) in got, (
                    f"duplicate pair {(group[i], group[j])} lost at width 6"
                )


def test_bucket_kernel_matches_pairjoin_scoring(spark, emb):
    """bucket_scored_pairs (bucket-local matmul) must reproduce the exact
    (qid, nid, sim) set the old pair-join + cosine_arrow plan produced:
    same candidates (shared buckets), same 4dp cosine."""
    from pyspark.sql import functions as F

    sub = emb.limit(120)
    bands = ann.ann_bands(sub, with_vec=True)
    kernel = (
        ann.bucket_scored_pairs(bands, "vec_id", "embedding")
        .groupBy("qid", "nid")
        .agg(F.max("sim").alias("sim"))
        .collect()
    )
    b2 = ann.ann_bands(sub)
    a = b2.select(F.col("vec_id").alias("qid"), "band_idx", "bucket")
    b = b2.select(F.col("vec_id").alias("nid"), "band_idx", "bucket")
    cand = (
        a.join(b, ["band_idx", "bucket"])
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .distinct()
    )
    qv = sub.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    nv = sub.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("nv"))
    legacy = (
        cand.join(qv, "qid")
        .join(nv, "nid")
        .withColumn("sim", ann.cosine_arrow(F.col("qv"), F.col("nv")))
        .select("qid", "nid", "sim")
        .collect()
    )
    assert {(r.qid, r.nid, r.sim) for r in kernel} == {
        (r.qid, r.nid, r.sim) for r in legacy
    }


def test_index_probe_width_follows_build_width(spark, emb, tmp_path):
    """A persisted index built at a non-default width must be probed at
    that width (read back from the stored bucket strings)."""
    idx = str(tmp_path / "annidx_w5")
    ann.build_ann_index(emb, idx, rows=5)
    stored = spark.read.parquet(idx)
    assert ann.index_rows_per_band(stored) == 5
    inline = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ann.ann_topk(emb, rows=5).collect()
    }
    via_index = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ann.ann_topk_with_index(spark, idx, emb).collect()
    }
    assert inline == via_index
