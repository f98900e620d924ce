"""IVF-PQ: coarse cells + product-quantized residuals (FAISS IVFPQ shape).

The composition of the two trained families (ivf.py + pq.py) and the
standard industrial ANN index: the coarse quantizer prunes the corpus to
``nprobe`` cells, and within a cell vectors are m one-byte PQ codes of the
RESIDUAL (v - centroid[cell]) — residuals are much smaller than raw
vectors, so the same codebook budget quantizes them far more accurately
(measured below).  At 100 TB both properties are load-bearing: the cell is
a partition-prunable key (only probed cell directories are read) and the
scan inside a cell touches m-byte codes, never raw vectors.

Division of labour (same as the parents):
- coarse training + assignment: ivf.build_ivf_index (pyspark.ml KMeans);
- residual codebooks: driver-side numpy on a bounded deterministic sample;
- encoding: one Arrow pass (residual subtraction + per-subspace argmin);
- query: nprobe nearest centroids DRIVER-side, one exact ADC table per
  (query, probed cell) — tables are tiny and ride the kernel closure —
  then per-partition shortlists, a global shortlist merge, and an exact
  re-rank against original vectors.

Not DuckDB-replayable (two trained stages); gated like ivf/pq by recall
vs brute force and by probe-widening monotonicity in tests/test_ivfpq.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .ivf import _nearest_cells, build_ivf_index
from .pq import PQ_KSUB, PQ_M, _det_sample_indices


def train_residual_pq(
    assigned: DataFrame,
    centroids,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    sample: int = 2048,
    iters: int = 12,
    seed: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Codebooks over RESIDUALS (v - centroid[cell]); numpy (m, ksub, dsub)."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    rows = (
        assigned.select(id_col, vec_col, "cell")
        .orderBy(id_col)
        .limit(max(sample * 2, 4096))
        .collect()
    )
    V = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    cells = np.array([int(r[2]) for r in rows])
    R = V - C[cells]
    idx = _det_sample_indices(len(R), sample, seed)
    R = R[idx]
    d = R.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    codebooks = np.empty((m, ksub, dsub))
    for s in range(m):
        X = R[:, s * dsub : (s + 1) * dsub]
        init_idx = _det_sample_indices(len(X), ksub, seed * 1000 + s)
        Cb = X[init_idx].copy()
        for _ in range(iters):
            d2 = ((X[:, None, :] - Cb[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    Cb[c] = X[mask].mean(0)
        codebooks[s] = Cb
    return codebooks


def ivfpq_encode(
    assigned: DataFrame,
    centroids,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, codes array<int>) — residual PQ codes, scan-side."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    id_type = assigned.schema[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_type}, cell int, codes array<int>"
    n_part = int(assigned.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    src = assigned.select(id_col, vec_col, "cell").repartition(n_part)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            cells = pdf.iloc[:, 2].to_numpy().astype(np.int64)
            R = V - C[cells]
            n = len(V)
            codes = np.empty((n, m), dtype=np.int32)
            for s in range(m):
                X = R[:, s * dsub : (s + 1) * dsub]
                d2 = -2.0 * (X @ cb[s].T) + (cb[s] ** 2).sum(1)[None, :]
                codes[:, s] = d2.argmin(1)
            yield pd.DataFrame(
                {
                    pdf.columns[0]: pdf.iloc[:, 0].to_numpy(),
                    "cell": cells.astype(np.int32),
                    "codes": list(codes),
                }
            )

    return src.mapInPandas(kernel, out_schema)


def build_ivfpq_index(
    embeddings: DataFrame,
    n_cells: int | None = None,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Full build: returns (codes_df, centroids, codebooks)."""
    assigned, centroids = build_ivf_index(
        embeddings, n_cells=n_cells, id_col=id_col, vec_col=vec_col
    )
    codebooks = train_residual_pq(
        assigned, centroids, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
    )
    codes = ivfpq_encode(assigned, centroids, codebooks, id_col, vec_col)
    return codes, centroids, codebooks


def ivfpq_topk(
    codes_df: DataFrame,
    embeddings: DataFrame,
    queries,
    centroids,
    codebooks,
    k: int = 5,
    nprobe: int = 8,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC over probed cells + exact L2 re-rank of the shortlist.

    ``queries``: list of (query_id, vector).  Output (query_id,
    neighbor_id, dist, rank) — dist is the EXACT ||q - v||^2 of the
    re-ranked survivors, rank 1..k by (dist asc, neighbor_id asc).
    """
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    probes = []  # (query_id, cell, table)
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        for cell in _nearest_cells(list(map(float, q)), [list(c) for c in C], nprobe):
            r = q - C[cell]
            table = np.empty((m, ksub))
            for s in range(m):
                xs = r[s * dsub : (s + 1) * dsub]
                table[s] = ((cb[s] - xs[None, :]) ** 2).sum(1)
            probes.append((qid, int(cell), table))
    probed_cells = sorted({c for _, c, _ in probes})
    scan = codes_df.filter(F.col("cell").isin(probed_cells))

    id_type = codes_df.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {id_type}, neighbor_id {id_type}, adist double"

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            Cd = np.stack(pdf["codes"].to_numpy())
            outs = []
            for qid, cell, table in probes:
                mask = cells == cell
                if not mask.any():
                    continue
                sub_ids = ids[mask]
                sub_codes = Cd[mask]
                dist = table[np.arange(m)[None, :], sub_codes].sum(1)
                dist = np.where(sub_ids == qid, np.inf, dist)
                keep = min(shortlist, len(sub_ids))
                sel = np.lexsort((sub_ids, dist))[:keep]
                sel = sel[np.isfinite(dist[sel])]
                if sel.size == 0:
                    continue
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(sel.size, qid),
                            "neighbor_id": sub_ids[sel],
                            "adist": np.round(dist[sel], 6),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    local = scan.mapInPandas(kernel, out_schema)
    wshort = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    short = (
        local.withColumn("_r", F.row_number().over(wshort))
        .filter(F.col("_r") <= shortlist)
        .select("query_id", "neighbor_id")
    )

    qmap = {qid: np.asarray(v, dtype=np.float64) for qid, v in queries}
    vecs = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    joined = short.join(vecs, "neighbor_id")
    rerank_schema = f"query_id {id_type}, neighbor_id {id_type}, dist double"

    def rerank(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            qv = np.stack([qmap[q] for q in pdf["query_id"]])
            nv = np.stack(pdf["nv"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "dist": np.round(((qv - nv) ** 2).sum(1), 6),
                }
            )

    exact = joined.mapInPandas(rerank, rerank_schema)
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist", "rank")
    )


def save_ivfpq_index(codes_df: DataFrame, centroids, codebooks, path: str) -> None:
    """codes partitioned BY CELL (partition-prunable probes) + the tiny
    centroid/codebook tables alongside — build once, probe many."""
    spark = codes_df.sparkSession
    codes_df.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/codes")
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    import numpy as np

    cb = np.asarray(codebooks)
    m, ksub, dsub = cb.shape
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in cb[s, c]])
            for s in range(m)
            for c in range(ksub)
        ],
        "subspace int, code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def load_ivfpq_index(spark, path: str):
    """-> (codes_df, centroids, codebooks numpy)."""
    import numpy as np

    codes = spark.read.parquet(f"{path}/codes")
    crows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    centroids = [list(map(float, r["centroid"])) for r in crows]
    brows = spark.read.parquet(f"{path}/codebooks").orderBy("subspace", "code").collect()
    m = max(r["subspace"] for r in brows) + 1
    ksub = max(r["code"] for r in brows) + 1
    dsub = len(brows[0]["centroid"])
    cb = np.empty((m, ksub, dsub))
    for r in brows:
        cb[r["subspace"], r["code"]] = r["centroid"]
    return codes, centroids, cb
