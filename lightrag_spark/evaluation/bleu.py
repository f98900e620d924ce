"""Corpus BLEU-2 over document pairs — the n-gram-precision eval metric
(Papineni et al. 2002) a training-data pipeline applies to generated text
(summaries, paraphrases, synthetic augmentation) before admitting it.

Clipped modified precision per order (unigram, bigram), geometric mean as
sqrt(p1*p2) (no ln/exp needed for the mean — fewer transcendental calls
to keep cross-engine), brevity penalty exp(1 - ref_len/cand_len) only
when the candidate is shorter.  No smoothing: a zero precision at either
order yields BLEU 0 (deterministic, and the honest score for a corpus
metric — smoothing conventions differ by toolkit).

Determinism contract (DuckDB twin ``queries[eval_bleu_pairs]``): counts
are exact integers; p_n is ONE integer/integer division; the only
transcendental is the brevity exp (same 1-ulp class as the ln already
gated in retrieval_bm25_topk / text_unigram_logprob); outputs round 4dp.

Shape at scale: grams explode to (pair, gram, side) rows and aggregate
with map-side combine — the bm25 postings shape, never candidate x
reference materialization; everything after the two gram aggregates is a
per-pair projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigrams(tok):
    return F.when(
        F.size(tok) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(tok) - 2),
            lambda i: F.concat(
                F.element_at(tok, i + 1), F.lit(" "), F.element_at(tok, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _clipped_sum(base: DataFrame, keys: list, gram_col, alias: str) -> DataFrame:
    c = base.select(*keys, F.explode(gram_col("tc")).alias("g")).withColumn(
        "side", F.lit("c")
    )
    r = base.select(*keys, F.explode(gram_col("tr")).alias("g")).withColumn(
        "side", F.lit("r")
    )
    per_gram = (
        c.unionByName(r)
        .groupBy(*keys, "g")
        .agg(
            F.sum((F.col("side") == "c").cast("long")).alias("tfc"),
            F.sum((F.col("side") == "r").cast("long")).alias("tfr"),
        )
    )
    return per_gram.groupBy(*keys).agg(
        F.sum(F.least("tfc", "tfr")).cast("long").alias(alias)
    )


def bleu2_pairs(
    pairs: DataFrame,
    cand_col: str = "cand_tokens",
    ref_col: str = "ref_tokens",
    keys: list | None = None,
) -> DataFrame:
    """(*keys, cand_len, ref_len, p1, p2, bp, bleu) from rows carrying a
    candidate and reference token array each.  See module docstring."""
    keys = list(keys or ["cand_id", "ref_id"])
    base = pairs.select(
        *keys, F.col(cand_col).alias("tc"), F.col(ref_col).alias("tr")
    )
    # base fans into lens + both sides of both gram orders (5 consumers):
    # checkpoint once so the upstream pair construction (doc scan + the
    # successor join) runs once, not per consumer (the fan-out rule).
    base = base.hint("rebalance").localCheckpoint(eager=True)
    lens = base.select(
        *keys,
        F.size("tc").cast("long").alias("cand_len"),
        F.size("tr").cast("long").alias("ref_len"),
        F.when(F.size("tc") >= 2, F.size("tc") - 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cand_bi"),
    )
    c1 = _clipped_sum(base, keys, lambda c: F.col(c), "c1")
    c2 = _clipped_sum(base, keys, lambda c: _bigrams(F.col(c)), "c2")
    j = (
        lens.join(c1, keys, "left")
        .join(c2, keys, "left")
        .withColumn("c1", F.coalesce("c1", F.lit(0)))
        .withColumn("c2", F.coalesce("c2", F.lit(0)))
    )
    p1 = F.when(
        F.col("cand_len") > 0,
        F.col("c1").cast("double") / F.col("cand_len").cast("double"),
    ).otherwise(F.lit(0.0))
    p2 = F.when(
        F.col("cand_bi") > 0,
        F.col("c2").cast("double") / F.col("cand_bi").cast("double"),
    ).otherwise(F.lit(0.0))
    bp = (
        F.when(F.col("cand_len") == 0, F.lit(0.0))
        .when(F.col("cand_len") > F.col("ref_len"), F.lit(1.0))
        .otherwise(
            F.exp(
                F.lit(1.0)
                - F.col("ref_len").cast("double") / F.col("cand_len").cast("double")
            )
        )
    )
    j = j.withColumn("_p1", p1).withColumn("_p2", p2).withColumn("_bp", bp)
    bleu = F.when(
        (F.col("_p1") > 0) & (F.col("_p2") > 0),
        F.col("_bp") * F.sqrt(F.col("_p1") * F.col("_p2")),
    ).otherwise(F.lit(0.0))
    return j.select(
        *keys,
        "cand_len",
        "ref_len",
        F.round("_p1", 4).alias("p1"),
        F.round("_p2", 4).alias("p2"),
        F.round("_bp", 4).alias("bp"),
        F.round(bleu, 4).alias("bleu"),
    )
