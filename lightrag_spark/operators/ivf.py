"""IVF-style approximate nearest neighbour: coarse k-means quantizer +
probed-cell exact search — the second ANN family next to the LSH one
(operators/ann.py), matching how production vector systems split the
problem (FAISS IVF-Flat shape).

Plan shape at scale:
- **Train** once on a sample: pyspark.ml KMeans (k ~ sqrt(N) cells).
- **Assign** every vector to its nearest centroid — one model.transform
  pass; the cell id becomes the partition-prunable key of the stored
  index (write partitioned by cell, like ann.build_ann_index).
- **Probe**: a query computes its ``nprobe`` nearest centroids DRIVER-side
  (k centroids is tiny — that lookup is exactly what the coarse quantizer
  is for), then a broadcast (query, cell) probe table joins the index on
  cell: only probed cells are scanned, never the corpus.

Unlike the LSH family this needs a training pass and is not replayable in
the DuckDB oracle (KMeans is iterative) — correctness is gated by recall
vs the brute-force operator in tests/test_ivf.py, the same way the
reference's own VDB has no SQL twin.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def build_ivf_index(
    embeddings: DataFrame,
    n_cells: int | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train the coarse quantizer and assign every vector to a cell.

    Returns (assigned_df with a ``cell`` column, centroids: list[list
    [float]]).  ``n_cells`` defaults to ~sqrt(N) (the classic IVF rule).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    n = embeddings.count()
    k = n_cells or max(2, int(math.sqrt(n)))
    feat = embeddings.withColumn(
        "_v", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(k=k, seed=seed, featuresCol="_v", predictionCol="cell").fit(feat)
    assigned = model.transform(feat).select(
        F.col(id_col), F.col(vec_col), F.col("cell").cast("int").alias("cell")
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def _nearest_cells(qv, centroids, nprobe: int) -> list[int]:
    """Driver-side coarse lookup: nprobe nearest centroids by cosine."""

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na > 0 and nb > 0 else -1.0

    scored = sorted(
        ((cos(qv, c), i) for i, c in enumerate(centroids)),
        key=lambda t: (-t[0], t[1]),
    )
    return [i for _, i in scored[:nprobe]]


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    n_queries: int = 8,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k over probed cells only.

    The probe table is |queries| x nprobe rows — broadcast; the index join
    keys on cell, so only probed cells' vectors are scanned and scored.
    Output (query_id, neighbor_id, sim, rank), sims rounded to 4dp like
    every similarity operator here.
    """
    spark = assigned.sparkSession
    queries = assigned.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qrows = queries.collect()  # bounded: n_queries rows
    probe_rows = [
        (int(r["query_id"]), int(cell))
        for r in qrows
        for cell in _nearest_cells(list(r["qv"]), centroids, nprobe)
    ]
    if not probe_rows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, sim double, rank long"
        )
    probes = spark.createDataFrame(probe_rows, "query_id long, cell int")
    cand = (
        F.broadcast(probes)
        .join(
            assigned.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell"
            ),
            "cell",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .drop("cell")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    from .ann import _cosine

    scored = cand.join(
        F.broadcast(queries), "query_id"
    ).withColumn("sim", _cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


def save_ivf_index(
    assigned: DataFrame,
    centroids: list[list[float]],
    path: str,
) -> None:
    """Materialize the IVF index: vectors partitioned BY CELL (the
    partition-prunable key — a probe for one query touches only its
    ``nprobe`` cell directories, mirroring ann.build_ann_index's
    band-partitioned layout) plus the tiny centroid table alongside.
    Build once, probe many; the KMeans training pass is paid once."""
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/cells")
    spark = assigned.sparkSession
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def load_ivf_centroids(spark, path: str) -> list[list[float]]:
    rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    return [list(map(float, r["centroid"])) for r in rows]


def ivf_topk_with_index(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ivf_topk against a persisted index: centroids load driver-side
    (k ~ sqrt(N) rows — the coarse quantizer IS the small table), the probe
    list becomes a partition-pruning ``cell IN (...)`` filter on the
    cell-partitioned parquet, so only probed cell directories are read —
    verified via the scan's pushed partition filters in tests/test_ivf.py.
    ``queries`` is a (id, vector) DataFrame with a driver-bounded row count.
    """
    centroids = load_ivf_centroids(spark, index_path)
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()  # bounded: the query set
    probe_rows = [
        (int(r["query_id"]), int(cell))
        for r in qrows
        for cell in _nearest_cells([float(x) for x in r["qv"]], centroids, nprobe)
    ]
    if not probe_rows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, sim double, rank long"
        )
    probed_cells = sorted({c for _, c in probe_rows})
    # cell IN (...) on the partition column -> Spark prunes unprobed cell
    # directories at planning time; the scan never touches them.
    index = spark.read.parquet(f"{index_path}/cells").filter(
        F.col("cell").isin(probed_cells)
    )
    probes = spark.createDataFrame(probe_rows, "query_id long, cell int")
    cand = (
        F.broadcast(probes)
        .join(
            index.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell"
            ),
            "cell",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .drop("cell")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    from .ann import cosine_arrow

    qdf = spark.createDataFrame(
        [(int(r["query_id"]), [float(x) for x in r["qv"]]) for r in qrows],
        f"query_id long, qv array<float>",
    )
    scored = cand.join(F.broadcast(qdf), "query_id").withColumn(
        "sim", cosine_arrow(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


def assign_nearest_centroid(
    embeddings: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, centroid_id, dist_sq) — exact nearest-centroid assignment
    with DETERMINISTIC centroids: the first ``k`` vectors by id.  This is
    the Lloyd/IVF assign step isolated from training (fixed seeds are
    iteration 0 of k-means with deterministic init), which makes it the
    one member of the k-means family a SQL oracle can replay — the
    TRAINED quantizer stays :func:`build_ivf_index`, recall-gated by
    pytest like every learned component.

    Cross-engine float discipline: float32 -> double casts are exact;
    each distance folds (x_i - c_i)^2 in ascending-dimension order from a
    0.0 seed (zip_with + aggregate here, list_transform over
    generate_series + list_reduce in the DuckDB twin — identical IEEE
    sequences), argmin compares the UNROUNDED doubles as (dist, id)
    structs on both engines, and only the reported distance is rounded
    (4dp).

    Scale shape: the centroid table is k rows — broadcast; assignment is
    one narrow pass emitting N*k candidate rows pruned by a struct-min
    aggregate (the same N*k distance work any IVF assign does), no
    shuffle beyond the final per-vector min, no Python.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    emb = embeddings.select(F.col(id_col), F.col(vec_col).alias("_x"))
    cents = (
        embeddings.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).cast("long").alias("centroid_id"), F.col(vec_col).alias("_c"))
    )
    d2 = F.aggregate(
        F.zip_with(
            "_x",
            "_c",
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        id_col, "centroid_id", d2.alias("_d2")
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct(F.col("_d2"), F.col("centroid_id"))).alias("_b")
    )
    return best.select(
        id_col,
        F.col("_b.centroid_id").alias("centroid_id"),
        F.round(F.col("_b._d2"), 4).alias("dist_sq"),
    )
