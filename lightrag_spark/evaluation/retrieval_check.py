"""Distributed TF-IDF retrieval audit (recall@k + MRR vs an oracle).

Spark re-expression of the reference's offline sanity checker
(lightrag/evaluation/offline_retrieval_check.py:78-196): same tokenizer
(``[a-z0-9]+`` on lowercased text, stopwords dropped, single chars dropped),
same idf ``ln((N+1)/(df+1)) + 1``, same per-occurrence query scoring
``(1 + ln(tf)) * idf``, same ``(-score, name)`` ranking with zero-score
documents excluded, same recall@k / reciprocal-rank summary.

The reference walks Counter objects per document on one core; here every
step is a DataFrame op so the audit runs over a full corpus:

- term frequencies: one shuffle keyed by (doc, token) with map-side combine;
- idf: token-keyed agg over the tf table (already token-keyed — narrow),
  then BROADCAST to the scorers (vocabulary << corpus);
- scoring: the query side is a handful of rows — broadcast both query term
  counts and idf onto the corpus tf table, so the only data-volume shuffle
  in the whole audit is the (question, doc) score agg;
- ranking: per-question window over score-positive docs.  Ranks are
  assigned on ``(round(score, 6) DESC, name)`` — the rounding makes
  mathematically-equal scores (common under a small vocabulary) tie
  cleanly and fall through to the deterministic name tiebreak regardless
  of float summation order, which keeps the ranking replayable bit-for-bit
  by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# Verbatim stopword list from offline_retrieval_check.py:26-52 — part of the
# scoring contract (a different list changes every score).
STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "how",
    "in", "into", "is", "it", "its", "of", "on", "or", "that", "the",
    "their", "to", "what", "with",
]

_TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    """Explode ``text_col`` into reference-tokenizer tokens, keeping
    multiplicity (the reference scores each query-token occurrence)."""
    tok = F.explode(F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT)).alias("token")
    out = df.select(*keep, tok)
    return out.filter((F.length("token") > 1) & ~F.col("token").isin(STOPWORDS))


def doc_term_frequencies(docs: DataFrame) -> DataFrame:
    """(name, token, tf) — one shuffle, map-side combined."""
    return _tokens(docs, "text", ["name"]).groupBy("name", "token").agg(
        F.count("*").alias("tf")
    )


def inverse_document_frequency(tf: DataFrame, n_docs: int) -> DataFrame:
    """(token, idf) with idf = ln((N+1)/(df+1)) + 1  (reference :123-131).

    ``n_docs`` is the corpus size INCLUDING score-zero documents, so it is
    taken from the docs table, not from tf (a doc of pure stopwords has no
    tf rows but still counts toward N).
    """
    return tf.groupBy("token").agg(
        (F.log((F.lit(n_docs) + 1.0) / (F.countDistinct("name") + 1.0)) + 1.0).alias(
            "idf"
        )
    )


def rank_documents(
    docs: DataFrame,
    queries: DataFrame,
    top_k: int | None = None,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Rank every document against every question.

    docs: (name, text); queries: (question).  Returns
    (question, name, score, rank) for score>0 docs, rank 1-based on
    (round(score,6) DESC, name), optionally truncated to ``top_k``.
    ``tf``: optionally pass an already-materialized postings table
    (doc_term_frequencies output) so callers that need the postings
    themselves (ndcg's relevance grades) share one corpus pass.
    """
    # tf feeds BOTH the idf aggregate and the scoring join — checkpoint
    # the postings once (the fan-out rule; byte-sized partitions via
    # rebalance) instead of running the tokenize+count pass per consumer.
    if tf is None:
        tf = doc_term_frequencies(docs).hint("rebalance").localCheckpoint(eager=True)
    idf = inverse_document_frequency(tf, docs.count())
    qtf = (
        _tokens(queries.select("question"), "question", ["question"])
        .groupBy("question", "token")
        .agg(F.count("*").alias("qtf"))
    )
    # Broadcast contract: both small sides must be QUERY-bounded, never
    # corpus-bounded.  qtf is tiny by construction, but idf spans the whole
    # corpus vocabulary (billions of tokens on web text) — semi-join it down
    # to the query token set first so the broadcast stays O(query tokens).
    q_tokens = qtf.select("token").distinct()
    idf_q = idf.join(F.broadcast(q_tokens), "token", "left_semi")
    scored = (
        tf.join(F.broadcast(qtf), "token")
        .join(F.broadcast(idf_q), "token")
        .groupBy("question", "name")
        .agg(
            F.round(
                F.sum(F.col("qtf") * (F.log("tf") + 1.0) * F.col("idf")), 6
            ).alias("score")
        )
        .filter(F.col("score") > 0)
    )
    w = Window.partitionBy("question").orderBy(F.col("score").desc(), F.col("name"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if top_k is not None:
        ranked = ranked.filter(F.col("rank") <= top_k)
    return ranked


def retrieval_metrics(ranked: DataFrame, oracle: DataFrame, top_k: int) -> DataFrame:
    """Per-question metrics vs the oracle.

    ranked: full (untruncated) output of rank_documents; oracle:
    (question, expected: array<string>).  Returns one row per question:
    (question, recall_at_k, reciprocal_rank) — reference :66-75
    (recall over top_k; RR over the FULL ranking, 0 when no hit).
    """
    hits = ranked.join(oracle, "question").withColumn(
        "is_expected", F.array_contains("expected", F.col("name"))
    )
    per_q = hits.groupBy("question").agg(
        (
            F.count_distinct(
                F.when(
                    F.col("is_expected") & (F.col("rank") <= top_k), F.col("name")
                )
            )
            / F.first(F.size("expected"))
        ).alias("recall_at_k"),
        F.coalesce(
            1.0 / F.min(F.when(F.col("is_expected"), F.col("rank"))), F.lit(0.0)
        ).alias("reciprocal_rank"),
    )
    # questions whose every expected doc scored 0 never appear in ranked —
    # they still carry metrics (all zero), exactly like the reference.
    return (
        oracle.select("question")
        .join(per_q, "question", "left")
        .fillna({"recall_at_k": 0.0, "reciprocal_rank": 0.0})
    )


def summarize_retrieval(metrics: DataFrame, top_k: int) -> dict:
    """Aggregate summary matching offline_retrieval_check.summarize
    (:181-196).  Single small row — collected."""
    row = metrics.agg(
        F.count("*").alias("queries"),
        F.avg("recall_at_k").alias("average_recall_at_k"),
        F.avg("reciprocal_rank").alias("mean_reciprocal_rank"),
        F.sum((F.col("recall_at_k") == 1.0).cast("int")).alias("full_recall_queries"),
        F.sum((F.col("recall_at_k") == 0.0).cast("int")).alias("no_hit_queries"),
    ).first()
    return {
        "queries": row["queries"],
        "top_k": top_k,
        "average_recall_at_k": row["average_recall_at_k"],
        "mean_reciprocal_rank": row["mean_reciprocal_rank"],
        "full_recall_queries": row["full_recall_queries"],
        "no_hit_queries": row["no_hit_queries"],
    }


def ndcg_at_k(docs: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """(question, dcg, idcg, ndcg) — NDCG@k over the TF-IDF ranking with
    graded relevance = number of DISTINCT non-stop query tokens present
    in the document (a label-free grade the corpus itself defines);
    normalized by the ideal ordering of the retrieved set — the standard
    cutoff convention when exhaustive relevance labels don't exist.

    Engine determinism: rel and positions are exact integers; both DCG
    and IDCG fold their rel/log2(pos+1) terms in an explicit order (rank
    for DCG, ideal position for IDCG) from a 0.0 seed, the sorted-fold
    IEEE pattern — libm log2 ulp noise sits far below the 4dp round.

    Shape: ranked pairs are |Q| x k (bounded), so the per-question
    collect_list folds touch k structs; relevance joins broadcast the
    query-token and ranked-name sides, never the corpus.
    """
    # ONE corpus tokenization: the checkpointed postings feed the ranking
    # AND the relevance grades (distinct (name, token) == the postings'
    # group keys, identical set by construction of the groupBy).
    tf = doc_term_frequencies(docs).hint("rebalance").localCheckpoint(eager=True)
    # |Q| x k rows consumed by the names probe AND the relevance join —
    # checkpoint so the whole ranking chain runs once, not twice.
    ranked = (
        rank_documents(docs, queries, top_k=k, tf=tf)
        .select("question", "name", "rank")
        .localCheckpoint(eager=True)
    )
    dtoks = tf.select("name", "token")
    qtoks = _tokens(queries.select("question"), "question", ["question"]).distinct()
    names = ranked.select("name").distinct()
    rel = (
        dtoks.join(F.broadcast(names), "name", "left_semi")
        .join(F.broadcast(qtoks), "token")
        .groupBy("question", "name")
        .agg(F.count_distinct("token").cast("long").alias("rel"))
    )
    r = (
        ranked.join(rel, ["question", "name"], "left")
        .select(
            "question",
            "rank",
            F.coalesce(F.col("rel"), F.lit(0)).cast("long").alias("rel"),
        )
        .withColumn(
            "term",
            F.col("rel").cast("double") / F.log2(F.col("rank").cast("double") + 1.0),
        )
        .withColumn(
            "ipos",
            F.row_number().over(
                Window.partitionBy("question").orderBy(F.desc("rel"), F.asc("rank"))
            ),
        )
    )
    r = r.withColumn(
        "iterm",
        F.col("rel").cast("double") / F.log2(F.col("ipos").cast("double") + 1.0),
    )

    def _fold(pos_col, term_col):
        lst = F.sort_array(
            F.collect_list(F.struct(F.col(pos_col).alias("p"), F.col(term_col).alias("t")))
        )
        return F.aggregate(lst, F.lit(0.0), lambda a, s: a + s["t"])

    agg = r.groupBy("question").agg(
        _fold("rank", "term").alias("dcg_raw"), _fold("ipos", "iterm").alias("idcg_raw")
    )
    return agg.select(
        "question",
        F.round("dcg_raw", 4).alias("dcg"),
        F.round("idcg_raw", 4).alias("idcg"),
        F.round(
            F.when(F.col("idcg_raw") > 0, F.col("dcg_raw") / F.col("idcg_raw")).otherwise(0.0),
            4,
        ).alias("ndcg"),
    )
