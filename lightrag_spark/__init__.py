"""lightrag_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the *semantics* of HKUDS/LightRAG's
indexing pipeline (chunk -> extract -> canonicalize/merge -> graph tables)
as idiomatic Spark DataFrame jobs.  The reference system is a single-process
asyncio Python application; this package re-expresses every operator as
declarative DataFrame transformations plus Arrow-batched pandas UDFs, so the
same pipeline scales out on a multi-executor cluster.

Layout
------
- ``functions``  : pure, dependency-free parity functions (text
  normalization, hashing, tokenization, extraction-record parsing).  These
  define output parity with the reference and run inside pandas UDFs.
- ``operators``  : Spark operators (chunking, extraction, merge/canonicalize,
  dedup, similarity, text analysis).
- ``sources``    : input-table helpers (pages synthesis, document enqueue).
- ``plans``      : end-to-end pipelines (kg_build) + lineage/metrics.
- ``streaming``  : incremental / Structured Streaming variants.
"""

__version__ = "0.1.0"
