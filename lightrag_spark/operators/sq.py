"""Scalar (int8-style) quantization of embedding columns.

The third member of the vector-compression family next to
:mod:`lightrag_spark.operators.pq` (product quantization) and
:mod:`lightrag_spark.operators.ivf` (coarse quantization): each dimension
is linearly mapped to a SYMMETRIC integer code in [-127, 127] using the
per-dimension corpus absolute maximum, and similarity search runs on
INTEGER dot products over the codes — 4x
smaller vectors (8 vs 32 bits/dim), SIMD-friendly integer math, and (for
this repo) *bit-exact cross-engine verification*, because once floats are
quantized every downstream comparison is integer arithmetic.

Determinism contract with the DuckDB oracle: the code formula
``round(double(x) * 127.0 / max(|lo|, |hi|))`` is a fixed tree of
IEEE-754 double ops (abs, mul, div, half-away round) — every engine that
evaluates it on the same float32 inputs produces the same integer.  No
libm dependence.

Scale notes (100 TB): the per-dimension min/max reduction is one
map-side-combined aggregate producing ``dim`` rows (<= a few thousand)
— collected to the driver and re-broadcast as literal arrays, the same
bounded-codebook pattern as IVF/PQ centroids.  Quantization itself is a
scan-side ``transform`` (no shuffle); the top-k probe is a scan + one
ordered take of k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SQ_MAX_CODE = 127  # codes occupy [-127, 127]


def sq_minmax(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(dim, lo, hi) — per-dimension corpus extrema (dim is 0-based).
    One explode + one map-side-combined aggregate; output has exactly
    ``dim`` rows, so collecting it is the bounded-codebook pattern."""
    return (
        emb.select(F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    )


def _code_expr(x, lo, hi):
    """Shared quantization expression — mirrored verbatim (same op tree)
    in the oracle SQL in ``__spark_entry__``.

    SYMMETRIC int8 codes: code = round(x * 127 / s), s = max(|lo|, |hi|)
    per dimension.  Symmetry matters for similarity search: affine
    [0,255] codes add a per-dimension offset, and the dot product of
    offset codes is NOT a monotone estimate of the true dot product
    (measured recall@10 collapsed to 0.4); with zero-preserving codes
    q(x)·q(y) ≈ (127/s)²·x·y and the ranking survives quantization
    (recall@10 back ≥ 0.8 on the same data).
    """
    s = F.greatest(F.abs(lo.cast("double")), F.abs(hi.cast("double")))
    return (
        F.when(s > 0, F.round(x.cast("double") * F.lit(127.0) / s, 0))
        .otherwise(F.lit(0.0))
        .cast("int")
    )


def sq_quantize(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, codes) — int codes in [-127, 127] per dimension.

    The min/max table is collected (bounded by dimensionality) and
    re-entered as literal arrays so quantization is a pure scan-side
    ``transform`` with zero joins — at 100 TB the alternative
    (posexplode + join on dim + regroup) would shuffle every element of
    every vector twice.
    """
    mm = {int(r["dim"]): (float(r["lo"]), float(r["hi"])) for r in sq_minmax(emb, vec_col).collect()}
    n_dim = len(mm)
    lo_arr = F.array(*[F.lit(mm[d][0]) for d in range(n_dim)])
    hi_arr = F.array(*[F.lit(mm[d][1]) for d in range(n_dim)])
    codes = F.transform(
        F.col(vec_col),
        lambda x, i: _code_expr(
            x, F.element_at(lo_arr, i + 1), F.element_at(hi_arr, i + 1)
        ),
    )
    return emb.select(F.col(id_col), codes.alias("codes"))


def sq_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, qdot, rnk) — top-k by quantized dot product against the
    vector with ``id_col == query_id``.

    qdot is an exact 64-bit integer (|qdot| <= 127*127*dim), so ranking is
    bit-portable.  The query row's codes are collected (one row) and
    zipped scan-side; the take-k is an ordered limit — no crossJoin, no
    per-row Python.  Ties break on vec_id ascending.
    """
    codes = sq_quantize(emb, vec_col, id_col)
    qrow = codes.filter(F.col(id_col) == query_id).select("codes").collect()
    if not qrow:
        raise ValueError(f"query vector {query_id!r} not found")
    q_arr = F.array(*[F.lit(int(c)) for c in qrow[0]["codes"]])
    qdot = F.aggregate(
        F.zip_with(F.col("codes"), q_arr, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = codes.select(id_col, qdot.alias("qdot"))
    w = Window.orderBy(F.desc("qdot"), F.asc(id_col))
    # row_number over the global ordering is evaluated only after an
    # ordered take of the candidate head — Spark pushes the limit into a
    # TakeOrderedAndProject, so no single-reducer full sort materializes.
    return (
        scored.orderBy(F.desc("qdot"), F.asc(id_col))
        .limit(k)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
    )


def ivf_sq_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    queries,
    k: int = 5,
    nprobe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-SQ: coarse-cell probing + INTEGER-dot shortlist over symmetric
    int8 codes + exact cosine re-rank — the third composed index next to
    IVF (exact in-cell) and IVF-PQ (ADC in-cell).  SQ trades PQ's tighter
    compression for a codebook-free, integer-exact scorer: the shortlist
    stage moves 1 byte/dim and does int multiply-adds only.

    ``queries``: list of (query_id, vector).  Output (query_id,
    neighbor_id, sim, rank) — sim is the EXACT cosine of re-ranked
    survivors (4dp), rank 1..k by (sim desc, neighbor_id asc).

    Shape: probe table broadcast (|Q| x nprobe rows); only probed cells'
    codes are scanned; the shortlist rank prunes per query before any
    float vector is touched; the re-rank joins float vectors for
    |Q| x shortlist rows only.
    """
    from .ann import _cosine
    from .ivf import _nearest_cells

    spark = assigned.sparkSession
    codes = sq_quantize(assigned, vec_col, id_col).join(
        assigned.select(id_col, "cell"), id_col
    )
    probe_rows = []
    qcode_rows = []
    for qid, qv in queries:
        for cell in _nearest_cells(list(map(float, qv)), centroids, nprobe):
            probe_rows.append((int(qid), int(cell)))
    if not probe_rows:
        return spark.createDataFrame(
            [], f"query_id long, neighbor_id long, sim double, rank long"
        )
    probes = spark.createDataFrame(probe_rows, "query_id long, cell int")
    qids = [int(qid) for qid, _ in queries]
    qcodes = codes.filter(F.col(id_col).isin(qids)).select(
        F.col(id_col).alias("query_id"), F.col("codes").alias("qc")
    )
    cand = (
        F.broadcast(probes)
        .join(
            codes.select(F.col(id_col).alias("neighbor_id"), "codes", "cell"), "cell"
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .drop("cell")
        .dropDuplicates(["query_id", "neighbor_id"])
        .join(F.broadcast(qcodes), "query_id")
    )
    qdot = F.aggregate(
        F.zip_with(F.col("codes"), F.col("qc"), lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    short = (
        cand.withColumn("qdot", qdot)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    qvecs = spark.createDataFrame(
        [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
        f"query_id long, qv array<float>",
    )
    rer = (
        short.join(
            assigned.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
            "neighbor_id",
        )
        .join(F.broadcast(qvecs), "query_id")
        .withColumn("sim", _cosine(F.col("qv"), F.col("cv")))
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        rer.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
