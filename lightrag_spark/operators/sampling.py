"""Deterministic corpus sampling and split assignment.

Training-data pipelines need reproducible subsetting: the same document
must land in the same sample/split on every run, on every cluster size,
regardless of partitioning — which rules out ``DataFrame.sample`` (seeded
per-partition RNG: repartition the input and membership changes).  The
standard fix is hash-based assignment: a document's fate is a pure
function of its key.

- ``deterministic_sample``: keep rows whose md5-derived uniform in [0,1)
  falls under ``fraction`` — exact reproducibility, no RNG state, scan-
  side filter (predicate-pushdown friendly), and SQL-expressible so the
  DuckDB oracle replays membership bit-for-bit.
- ``hash_split``: weighted train/validation/test labels from the same
  uniform — a doc's split never changes when the corpus around it grows,
  which is what keeps eval sets stable across crawl epochs.

The uniform is the first 12 hex chars of md5(salt ":" key) / 16^12 —
48 bits is plenty below the 6-sig-fig comparisons any sane fraction
uses, and both engines compute it with integer-exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HASH_HEX_CHARS = 12  # 48-bit uniform — integer-exact in a double


def hash_uniform(key: Column, salt: str = "sample") -> Column:
    """Deterministic uniform in [0,1) from a key column (md5-derived)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, HASH_HEX_CHARS),
        16,
        10,
    ).cast("double")
    return h / float(16**HASH_HEX_CHARS)


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Rows whose hash-uniform < fraction — stable under repartitioning,
    corpus growth, and re-runs (unlike DataFrame.sample)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    return df.filter(hash_uniform(F.col(key_col), salt) < fraction)


def stratified_exact_sample(
    df: DataFrame,
    n_per_stratum: int,
    strata_cols: list[str],
    key_col: str,
    salt: str = "evalslice",
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (fewer when the stratum
    is smaller), chosen deterministically: rows rank by hash-uniform
    within each stratum and the smallest-hash head wins.  The eval-slice
    sampler — a balanced per-(lang, source, ...) slice whose membership
    is stable across runs and cluster sizes, and ADDITIVE under corpus
    growth only in the sense that ranking is re-evaluated per epoch (a
    new lower-hash doc can displace the tail; pin an epoch's slice by
    writing it out).

    Scale note: the window shuffles one stratum per reducer.  Strata here
    are facet values (languages, sources) — thousands at most, each
    reduced to a top-``n`` head via the rank filter, and Spark's window
    rank short-circuits after the head when a limit-pushdown applies; for
    truly huge single strata prefer ``deterministic_sample`` with a
    fraction (no shuffle) and accept approximate counts.
    """
    from pyspark.sql.window import Window

    u = hash_uniform(F.col(key_col), salt)
    w = Window.partitionBy(*strata_cols).orderBy(u.asc(), F.col(key_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def domain_quota_sample(
    df: DataFrame,
    max_per_key: int,
    key_col: str,
    order_cols: list[Column],
    id_col: str,
    salts: int = 8,
    rank_col: str = "domain_rank",
) -> DataFrame:
    """Keep at most ``max_per_key`` best rows per key — the per-domain
    quota cap web-corpus curation uses against SEO farms and mirror
    sites (one domain contributing millions of near-identical pages
    would otherwise dominate a crawl epoch; C4/RefinedWeb-style
    pipelines cap per registrable domain).

    Ordering is ``order_cols`` with ``id_col`` ascending appended as the
    final tiebreak, making the ranking a total order — the survivor set
    is therefore a pure function of the data, stable across partitioning
    and cluster size (same contract as the other samplers here).

    Scale/skew note: a single window over ``key_col`` puts each key's
    ENTIRE row set in one reducer task — a mega-domain (billions of
    pages) becomes one straggler.  This runs the salted two-phase shape
    the KG merge uses (operators/merge.py): phase 1 ranks within
    ``(key, crc32(id) % salts)`` and keeps ``max_per_key`` per salt
    group — any global top-k row is necessarily in its subset's top-k,
    so no survivor is lost — bounding every task at ~1/salts of the
    hottest key; phase 2 re-ranks the <= ``max_per_key * salts``
    survivors per key, a shuffle of quota-bounded (not corpus-bounded)
    size.  Catalyst additionally inserts ``WindowGroupLimit`` (Partial)
    before BOTH exchanges — map-side top-k pruning — so even the phase-1
    shuffle carries at most ``max_per_key`` rows per (key, salt) per
    input partition; the salting's job is bounding the reducer-side
    sort, which the group-limit alone cannot.  Output carries
    ``rank_col`` (1-based, BIGINT) for downstream "keep top-N only"
    refinement without a re-sort.
    """
    from pyspark.sql.window import Window

    if max_per_key < 1:
        raise ValueError(f"max_per_key {max_per_key} must be >= 1")
    if salts < 1:
        raise ValueError(f"salts {salts} must be >= 1")
    order = [*order_cols, F.col(id_col).asc()]
    salted = df.withColumn(
        "_qsalt", F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(salts))
    )
    w1 = Window.partitionBy(key_col, "_qsalt").orderBy(*order)
    survivors = (
        salted.withColumn("_qr1", F.row_number().over(w1))
        .filter(F.col("_qr1") <= max_per_key)
        .drop("_qsalt", "_qr1")
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return survivors.withColumn(
        rank_col, F.row_number().over(w2).cast("long")
    ).filter(F.col(rank_col) <= max_per_key)


def mixture_resample(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    id_col: str,
    salt: str = "mixture",
) -> DataFrame:
    """Downsample-only resampling to a target domain mixture — the
    Pile/DoReMi-style step that turns a crawl's accidental domain shares
    into the mixture the training run wants.  Given target shares
    ``weights`` (normalized internally), the output size is the largest
    achievable WITHOUT upsampling any domain, ``n_out = min_d(n_d /
    w_d)``, and each domain keeps ``p_d = w_d * n_out / n_d`` of its
    rows (the binding domain keeps everything, p=1).  Expected output
    share of every domain is then exactly ``w_d``.

    Membership is ``hash_uniform(id) < p_d`` — a pure function of the
    key, so the sample is stable under repartitioning, cluster size,
    and re-runs, and SQL-expressible for the DuckDB oracle (both
    engines compute ``w * n_out / n`` over IEEE doubles in the same
    operation order, so the comparison constant is bit-identical).

    Plan shape: one hash aggregate on ``key_col`` for the per-domain
    counts (map-side partial combine, #domains result rows), the
    1-row ``n_out`` reduction crossJoined back broadcast-style, and the
    per-domain keep probabilities broadcast-joined onto the corpus —
    the corpus itself is touched by exactly one scan + one broadcast
    join + a scan-side filter, no corpus-sized shuffle.  Domains absent
    from ``weights`` are dropped (inner join); weights for absent
    domains are ignored by the min.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    spark = df.sparkSession
    w_df = spark.createDataFrame(
        [(k, float(v) / total) for k, v in sorted(weights.items())],
        schema=f"{key_col} string, _w double",
    )
    n_df = df.groupBy(key_col).agg(F.count(F.lit(1)).cast("double").alias("_n"))
    stats = n_df.join(w_df, key_col, "inner")
    cap = stats.agg(F.min(F.col("_n") / F.col("_w")).alias("_n_out"))
    p = stats.crossJoin(F.broadcast(cap)).select(
        key_col,
        F.least(
            F.lit(1.0), F.col("_w") * F.col("_n_out") / F.col("_n")
        ).alias("_p"),
    )
    return (
        df.join(F.broadcast(p), key_col, "inner")
        .filter(hash_uniform(F.col(id_col), salt) < F.col("_p"))
        .drop("_p")
    )


def mixture_upsample(
    df: DataFrame,
    weights: dict[str, float],
    target_rows: int,
    key_col: str,
    id_col: str,
    salt: str = "mixture",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Epoch-aware mixture construction WITH repetition — the
    training-recipe counterpart of :func:`mixture_resample`: hit a
    target corpus size ``target_rows`` at target domain shares by
    repeating under-weighted domains (how LLM data recipes give a small
    high-quality domain several epochs per mix).  Each domain owes
    ``m_d = w_d * target_rows`` rows from its ``n_d``: every doc gets
    ``floor(m_d/n_d)`` full copies (epochs ``0..k-1``) and the
    fractional remainder epoch ``k`` goes to the hash-stable fraction
    ``m_d/n_d - k`` of docs — expected output is exactly ``m_d`` per
    domain, membership and epoch assignment are pure functions of the
    key (stable across partitioning/cluster size), and ``epoch_col``
    lets the dataloader vary shuffling/augmentation per repeat.

    Plan shape: per-domain count aggregate (#domains rows) broadcast
    back; the corpus sees one scan + one broadcast join + an explode of
    a per-row bounded sequence — output-proportional work, no
    corpus-sized shuffle.  Domains absent from ``weights`` are dropped.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    if target_rows < 1:
        raise ValueError(f"target_rows {target_rows} must be >= 1")
    spark = df.sparkSession
    w_df = spark.createDataFrame(
        [(k, float(v) / total) for k, v in sorted(weights.items())],
        schema=f"{key_col} string, _w double",
    )
    n_df = df.groupBy(key_col).agg(F.count(F.lit(1)).cast("double").alias("_n"))
    # per-doc copy budget m/n, split into full epochs + fractional tail;
    # both engines compute _w * target / _n in this exact IEEE order.
    kf = (
        n_df.join(w_df, key_col, "inner")
        .withColumn("_m", F.col("_w") * F.lit(float(target_rows)) / F.col("_n"))
        .select(
            key_col,
            F.floor(F.col("_m")).cast("long").alias("_k"),
            (F.col("_m") - F.floor(F.col("_m"))).alias("_f"),
        )
    )
    u = hash_uniform(F.col(id_col), salt)
    return (
        df.join(F.broadcast(kf), key_col, "inner")
        .withColumn(
            "_ncopies", F.col("_k") + (u < F.col("_f")).cast("long")
        )
        .filter(F.col("_ncopies") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("_ncopies") - 1)),
        )
        .drop("_k", "_f", "_ncopies")
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a split label with probability proportional to
    ``weights`` (e.g. {"train": .9, "valid": .05, "test": .05}), as a
    pure function of the key.  Labels are assigned by cumulative ranges
    in the weights' ITERATION order — pass an ordered dict and keep the
    order stable across runs (it is part of the assignment contract).
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = hash_uniform(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        expr = F.when(u < acc, name) if expr is None else expr.when(u < acc, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def epoch_shuffle(
    docs: DataFrame,
    epochs: int = 2,
    n_shards: int = 4,
    seed: str = "epoch",
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """(doc_id, epoch, shuffle_pos, shard_id) — the deterministic global
    shuffle a pretraining dataloader needs: every epoch visits the whole
    corpus in a fresh pseudo-random order, and the order is a pure
    function of (seed, epoch, doc_id) — reproducible across runs,
    cluster sizes, and partitionings (the same property argument as
    ``deterministic_sample``; ``DataFrame.sample``-style RNG state is
    banned for the same reason).  ``shuffle_pos`` is the 1-based position
    in the epoch's order (rank of md5(seed:epoch:doc_id), ties impossible
    — doc_id is in the hash); ``shard_id`` deals positions round-robin
    into ``n_shards`` dataloader shards, so shard contents are
    epoch-specific but each shard's size is balanced to within one row.

    Scale shape: NO single-partition window.  The per-epoch global rank
    is the packing/ccnet two-phase scan, generalized to grouped keys:
    range-partition by (epoch, hash) — epoch ranges stay contiguous —
    count per (partition, epoch) (one KB-scale collect), driver-side
    exclusive prefix per epoch, broadcast back, partition-local
    row_number.  The corpus is scanned once per epoch (the explode),
    which is the honest cost of materializing E orders; dataloaders that
    stream one epoch at a time call this with epochs=1 per step.
    """
    if epochs < 1 or n_shards < 1:
        raise ValueError(
            f"epochs and n_shards must be >= 1, got {epochs}, {n_shards}"
        )
    spark = docs.sparkSession
    n_part = partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    base = docs.select(F.col(id_col)).withColumn(
        "epoch", F.explode(F.array(*[F.lit(e) for e in range(epochs)]))
    ).withColumn("epoch", F.col("epoch").cast("long"))
    hashed = base.withColumn(
        "_h",
        F.md5(
            F.concat_ws(
                ":", F.lit(seed), F.col("epoch").cast("string"), F.col(id_col)
            )
        ),
    )
    ranged = hashed.repartitionByRange(n_part, "epoch", "_h").withColumn(
        "_pid", F.spark_partition_id()
    )
    from pyspark.storagelevel import StorageLevel
    from pyspark.sql.window import Window

    ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
    counts = (
        ranged.groupBy("_pid", "epoch").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    per_epoch: dict = {}
    for r in counts:
        per_epoch.setdefault(r["epoch"], {})[r["_pid"]] = r["c"]
    rows = []
    for ep, pids in per_epoch.items():
        acc = 0
        for pid in sorted(pids):
            rows.append((int(pid), int(ep), acc))
            acc += pids[pid]
    base_df = spark.createDataFrame(rows, "_pid int, epoch long, _base long")
    w = Window.partitionBy("_pid", "epoch").orderBy("_h")
    return (
        ranged.join(F.broadcast(base_df), ["_pid", "epoch"])
        .select(
            id_col,
            "epoch",
            (F.col("_base") + F.row_number().over(w)).alias("shuffle_pos"),
        )
        .withColumn(
            "shard_id", ((F.col("shuffle_pos") - 1) % n_shards).cast("long")
        )
    )


def weighted_sample_per_group(
    docs,
    weights,
    k: int = 3,
    group_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "weight",
    floor: float = 0.0001,
):
    """(group, doc_id, weight, priority, rnk) — deterministic
    quality-weighted sampling: k docs per group with selection biased
    toward high weight.  Priority = md5_uint32(doc_id) / max(weight,
    floor); the k SMALLEST priorities win — a derandomized weighted
    shuffle (the h/w priority heuristic): doubling a doc's weight halves
    its expected priority.

    Engine determinism without libm: the hash is an exact integer, the
    weight an exact 4dp-rounded double, and ONE division is correctly
    rounded IEEE — so the priority (and therefore the ranking, with
    doc_id tiebreak) is bit-identical in any engine.  Unlike
    Efraimidis-Spirakis u^(1/w) keys (pow is not correctly rounded and
    cross-engine ulp flips would break the oracle), this stays exact.

    Shape: one scan-side hash + one rank window partitioned by group
    (WindowGroupLimit prunes to k per partition map-side).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    j = docs.select(group_col, id_col).join(weights, id_col)
    pr = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    ).cast("double") / F.greatest(F.col(weight_col), F.lit(floor))
    ranked = j.withColumn("priority", pr).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(F.asc("priority"), F.asc(id_col))
        ).cast("long"),
    )
    return ranked.filter(F.col("rnk") <= k).select(
        group_col, id_col, weight_col, F.round("priority", 4).alias("priority"), "rnk"
    )
