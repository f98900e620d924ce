"""Pages source + document enqueue.

Input contract (BASELINE.json input_hint): an Iceberg-style table
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)``.  In this sandbox the table is synthesized deterministically
(seed-stable, generated distributed via ``spark.range``) or derived from the
driver's ``documents.parquet``.

``enqueue_documents`` reproduces the reference's enqueue semantics
(/root/reference/lightrag/pipeline.py:605-1511):

- sanitize text (``sanitize_text_for_encoding`` — the byte-identical
  "HTML-to-text" stage, pipeline.py:1010);
- doc_id = ``doc-`` + md5(sanitized content) (pipeline.py:937-946);
- in-batch content-hash dedup, first occurrence wins (pipeline.py:948-974)
  — expressed as a row_number window over the content hash;
- doc_status rows start PENDING (base.py:888-900).
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..constants import DOC_STATUS_PENDING
from ..functions.hashing import compute_mdhash_id
from ..functions.textnorm import sanitize_text_for_encoding

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("page_order", LongType()),
    ]
)

# Seeded vocabulary for synthetic page text; the Zipf head makes a few
# entities ("united_states" analogue) extremely hot so the salted merge is
# actually exercised (FIXTURES.md §3).
_VOCAB_HEAD = ["united_states", "spark_engine", "world_bank"]
_VOCAB_BODY = [
    "table", "query", "window", "stream", "batch", "merge", "vector", "column",
    "filter", "customer", "market", "science", "energy", "system", "network",
    "model", "policy", "health", "climate", "finance", "industry", "research",
    "culture", "history", "nature", "music", "sport", "travel", "media",
    "the", "a", "of", "and", "in", "on", "at", "is", "was", "key", "row",
]
_DIRTY_SNIPPETS = [
    " &amp; entity ",  # html entity -> sanitize changes bytes
    " ctrl\x07char ",  # control char stripped
    " ｆｕｌｌｗｉｄｔｈ ",  # full-width letters (normalize path)
    " “quoted” ",
]


def _page_text(rng: random.Random, min_words: int, max_words: int, dirty: bool) -> str:
    n = rng.randint(min_words, max_words)
    words = []
    for _ in range(n):
        if rng.random() < 0.05:
            words.append(_VOCAB_HEAD[0])  # hot head: ~5% of all tokens
        elif rng.random() < 0.04:
            words.append(rng.choice(_VOCAB_HEAD))
        else:
            words.append(rng.choice(_VOCAB_BODY))
    text = " ".join(words)
    if dirty:
        pos = rng.randrange(len(_DIRTY_SNIPPETS))
        text = text[: len(text) // 2] + _DIRTY_SNIPPETS[pos] + text[len(text) // 2 :]
    return text


def synthesize_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    min_words: int = 50,
    max_words: int = 2400,
    duplicate_fraction: float = 0.05,
    dirty_fraction: float = 0.03,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic Common-Crawl-shaped corpus, generated on executors.

    Each row is derived solely from (seed, row index) — independent of
    partitioning and parallelism — so two runs at different core counts see
    byte-identical input.  ``duplicate_fraction`` of pages repeat an earlier
    page's text under a different url (content-hash dedup fodder).
    """
    mn, mx, dup, dirty, sd = min_words, max_words, duplicate_fraction, dirty_fraction, seed

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "html", "text", "lang", "page_order")}
            for i in pdf["id"]:
                i = int(i)
                rng = random.Random((sd << 24) ^ i)
                if rng.random() < dup and i > 10:
                    src = rng.randrange(max(1, i - 10), i)
                    text = _page_text(
                        random.Random((sd << 24) ^ src), mn, mx,
                        random.Random((sd << 24) ^ src ^ 1).random() < dirty,
                    )
                else:
                    text = _page_text(rng, mn, mx, random.Random((sd << 24) ^ i ^ 1).random() < dirty)
                site = rng.randrange(1000)
                path = hashlib.md5(f"{sd}:{i}".encode()).hexdigest()[:12]
                rows["url"].append(f"https://site{site:04d}.example/{path}")
                rows["warc_ts"].append(pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i))
                rows["html"].append(f"<html><body><p>{text}</p></body></html>".encode())
                rows["text"].append(text)
                rows["lang"].append("en" if rng.random() < 0.9 else "zh")
                rows["page_order"].append(i)
            yield pd.DataFrame(rows)

    rng_df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


_DOCS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("text", StringType()),
        StructField("content_hash", StringType()),
        StructField("doc_id", StringType()),
        StructField("page_order", LongType()),
    ]
)


def html_to_text_col(html: F.Column) -> F.Column:
    """Deterministic HTML-to-text over the ``html binary`` column — pure
    Catalyst expression chain (scan-side, codegen, no Python), so the
    extraction runs at parquet-scan speed on a 10^12-page corpus.

    Rules (conservative, documented — every transformation is one
    regexp_replace, and NOTHING locale- or parser-dependent happens):

    1. decode utf-8;
    2. drop <script>...</script> and <style>...</style> blocks entirely
       (their text is code, not content);
    3. block-level closing tags and <br> become newlines (paragraph
       structure survives as line structure);
    4. every remaining tag is stripped;
    5. HTML entities are NOT decoded — entity handling belongs to the
       sanitize stage's byte-identity contract, and decoding here would
       silently change content bytes;
    6. leading/trailing whitespace trimmed; inner bytes untouched.

    Byte-identity: tests assert extract(html) == the generator's ``text``
    column for every synthetic page (including dirty ones), which is the
    north rule's "extracted text per url byte-identical" clause made
    checkable in-sandbox.
    """
    s = html.cast("string")
    s = F.regexp_replace(s, r"(?is)<script\b.*?</script>", "")
    s = F.regexp_replace(s, r"(?is)<style\b.*?</style>", "")
    s = F.regexp_replace(
        s, r"(?i)<(br|/p|/div|/li|/tr|/h[1-6]|/blockquote|/section|/article)\s*/?>", "\n"
    )
    s = F.regexp_replace(s, r"(?s)<[^>]*>", "")
    # F.trim strips only U+0020; the tag->newline step leaves trailing
    # newlines, so trim the full whitespace class explicitly
    return F.regexp_replace(s, r"^\s+|\s+$", "")


def pages_with_text(pages: DataFrame) -> DataFrame:
    """Ensure the pages frame has a usable ``text`` column: pass through
    when present/non-null, else extract from ``html`` (the crawl-ingest
    face — WARC payloads carry html, not text)."""
    if "text" in pages.columns and "html" in pages.columns:
        return pages.withColumn(
            "text", F.coalesce(F.col("text"), html_to_text_col(F.col("html")))
        )
    if "text" in pages.columns:
        return pages
    return pages.withColumn("text", html_to_text_col(F.col("html")))


def enqueue_documents(pages: DataFrame, streaming: bool = False) -> DataFrame:
    """pages -> docs(doc_id, text, file_path, doc_order, content_hash, status).

    The sanitize step runs in one Arrow pass (byte-identical invariant);
    dedup keeps the first page per content hash (by page order — the
    reference's "first-seen wins within a batch", pipeline.py:962-974).

    ``streaming=True`` swaps the row_number window (batch-only) for
    stateful ``dropDuplicates`` — same keep-one-per-hash semantics, except
    "first" means first-arriving micro-batch row.
    """

    def sanitize_batches(batches):
        for pdf in batches:
            texts = [sanitize_text_for_encoding(t) if t is not None else "" for t in pdf["text"]]
            hashes = [hashlib.md5(t.encode("utf-8", errors="replace")).hexdigest() for t in texts]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "text": texts,
                    "content_hash": hashes,
                    "doc_id": [compute_mdhash_id(t, prefix="doc-") for t in texts],
                    "page_order": pdf["page_order"],
                }
            )

    sanitized = pages.select("url", "text", "page_order").mapInPandas(
        sanitize_batches, schema=_DOCS_SCHEMA
    )
    nonempty = sanitized.filter(F.col("text") != "")
    if streaming:
        deduped = nonempty.dropDuplicates(["content_hash"])
    else:
        from pyspark.sql.window import Window

        w = Window.partitionBy("content_hash").orderBy("page_order")
        deduped = (
            nonempty.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return (
        deduped
        .select(
            "doc_id",
            "text",
            F.col("url").alias("file_path"),
            F.col("page_order").alias("doc_order"),
            "content_hash",
            F.lit(DOC_STATUS_PENDING).alias("status"),
        )
    )
