"""ROUGE-2 over document pairs — the recall-oriented n-gram eval metric
(Lin 2004) a training-data pipeline applies to summary/reference pairs:
where BLEU asks "how much of the candidate is in the reference" (precision
+ brevity penalty), ROUGE asks "how much of the reference did the
candidate cover" (recall), and F1 balances the two.

Shares the clipped-count machinery with :mod:`lightrag_spark.evaluation.
bleu` (same (pair, gram, side) explode → min(tf_cand, tf_ref) aggregate).
ROUGE-2 counts bigram overlap clipped per gram, then:

  p2 = clipped / cand_bigrams,  r2 = clipped / ref_bigrams,
  f2 = 2*p2*r2 / (p2+r2)        (0 when both are 0)

Determinism contract (DuckDB twin ``oracle_sql()[eval_rouge_pairs]``):
counts are exact integers; p2/r2 are single integer/integer divisions; f2
is one multiply/divide chain written identically in the twin; outputs
round 4dp.  No transcendentals at all (unlike BLEU's brevity exp).

Shape at scale: one gram explode + map-side-combined aggregate per pair
set — never candidate x reference materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bleu import _bigrams, _clipped_sum


def rouge2_pairs(
    pairs: DataFrame,
    cand_col: str = "cand_tokens",
    ref_col: str = "ref_tokens",
    keys: list | None = None,
) -> DataFrame:
    """(*keys, cand_bi, ref_bi, overlap, p2, r2, f2) from rows carrying a
    candidate and reference token array each.  See module docstring."""
    keys = list(keys or ["cand_id", "ref_id"])
    base = pairs.select(
        *keys, F.col(cand_col).alias("tc"), F.col(ref_col).alias("tr")
    )
    # fan-out rule: lens + both explode sides consume base — checkpoint
    # so the pair construction upstream runs once, not 3x.
    base = base.hint("rebalance").localCheckpoint(eager=True)
    lens = base.select(
        *keys,
        F.when(F.size("tc") >= 2, F.size("tc") - 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cand_bi"),
        F.when(F.size("tr") >= 2, F.size("tr") - 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ref_bi"),
    )
    c2 = _clipped_sum(base, keys, lambda c: _bigrams(F.col(c)), "overlap")
    j = lens.join(c2, keys, "left").withColumn(
        "overlap", F.coalesce("overlap", F.lit(0))
    )
    p2 = F.when(
        F.col("cand_bi") > 0,
        F.col("overlap").cast("double") / F.col("cand_bi").cast("double"),
    ).otherwise(F.lit(0.0))
    r2 = F.when(
        F.col("ref_bi") > 0,
        F.col("overlap").cast("double") / F.col("ref_bi").cast("double"),
    ).otherwise(F.lit(0.0))
    j = j.withColumn("_p2", p2).withColumn("_r2", r2)
    f2 = F.when(
        (F.col("_p2") + F.col("_r2")) > 0,
        F.lit(2.0) * F.col("_p2") * F.col("_r2") / (F.col("_p2") + F.col("_r2")),
    ).otherwise(F.lit(0.0))
    return j.select(
        *keys,
        "cand_bi",
        "ref_bi",
        "overlap",
        F.round("_p2", 4).alias("p2"),
        F.round("_r2", 4).alias("r2"),
        F.round(f2, 4).alias("f2"),
    )
