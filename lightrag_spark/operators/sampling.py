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
