"""SQuAD-style token-overlap F1 over candidate/reference pairs — the
bag-of-tokens answer-match metric (Rajpurkar et al. 2016) QA eval and
distillation filtering use where exact-match is too brittle and BLEU's
n-gram order sensitivity is too strict.

Overlap is the CLIPPED unigram intersection (sum over distinct tokens of
min(count_cand, count_ref) — the same clipped-gram machinery as
``bleu.bleu2_pairs``, reused); precision = overlap/|cand|, recall =
overlap/|ref|, and F1 is computed as 2*overlap/(|cand|+|ref|) — the exact
harmonic mean without chaining float divisions (one integer/integer
division per output column, floor-quantized to 4dp — the cross-engine
contract).

Shape at scale: tokens explode to (pair, token, side) rows and aggregate
with map-side combine (the bm25 postings shape); everything after the
clipped-sum aggregate is a per-pair projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bleu import _clipped_sum


def _q4(col):
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def token_f1_pairs(
    pairs: DataFrame,
    cand_col: str = "cand_tokens",
    ref_col: str = "ref_tokens",
    keys: list | None = None,
) -> DataFrame:
    """(*keys, cand_len, ref_len, overlap, precision, recall, f1) from
    rows carrying a candidate and a reference token array each."""
    keys = list(keys or ["cand_id", "ref_id"])
    base = pairs.select(
        *keys, F.col(cand_col).alias("tc"), F.col(ref_col).alias("tr")
    )
    # fan-out rule: lens + both explode sides consume base — checkpoint
    # so the pair construction upstream runs once, not 3x.
    base = base.hint("rebalance").localCheckpoint(eager=True)
    lens = base.select(
        *keys,
        F.size("tc").cast("long").alias("cand_len"),
        F.size("tr").cast("long").alias("ref_len"),
    )
    ov = _clipped_sum(base, keys, F.col, "overlap")
    j = lens.join(ov, keys, "left").withColumn(
        "overlap", F.coalesce(F.col("overlap"), F.lit(0)).cast("long")
    )
    denom_p = F.col("cand_len").cast("double")
    denom_r = F.col("ref_len").cast("double")
    denom_f = (F.col("cand_len") + F.col("ref_len")).cast("double")
    o = F.col("overlap").cast("double")
    return j.select(
        *keys,
        "cand_len",
        "ref_len",
        "overlap",
        _q4(F.when(F.col("cand_len") > 0, o / denom_p).otherwise(F.lit(0.0))).alias(
            "precision"
        ),
        _q4(F.when(F.col("ref_len") > 0, o / denom_r).otherwise(F.lit(0.0))).alias(
            "recall"
        ),
        _q4(
            F.when(denom_f > 0, F.lit(2.0) * o / denom_f).otherwise(F.lit(0.0))
        ).alias("f1"),
    )
