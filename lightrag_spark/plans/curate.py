"""Corpus curation — the 100-TB training-data pipeline, one plan.

Chains the already-oracle-gated stages into the shape a web-scale
pretraining corpus actually flows through before it ever reaches a
tokenizer:

    pages --canonical_url dedup--> --sanitize + exact content dedup-->
    docs --minhash near-dup pairs--> --connected components-->
    canonicalization --benchmark decontamination--> --hash splits-->
    curated_docs

Stage-by-stage scale contract (each stage's own docstring carries the
detail; this is the composition view):

- URL canonicalization is a pure Catalyst expression on the scan; the
  url-level dedup is one shuffle on the canonical key.
- Exact content dedup (enqueue_documents) is one shuffle on content_hash.
- Near-dup candidates come from LSH band buckets (scan-side signatures,
  one bounded-fan-in shuffle); exact Jaccard runs inside buckets.
- Connected components closes duplicate clusters over the PAIRS only —
  the corpus-sized doc table never enters the iteration.
- Decontamination broadcasts the (small by definition) benchmark shingle
  set; hits aggregate per doc.
- Split assignment is a pure per-row function of doc_id — no shuffle.

The assembly joins everything back onto docs BY doc_id: components,
contamination, and the doc table shuffle onto the same key once, and the
two pair-bounded right sides are orders of magnitude smaller than the
corpus (every near-dup table is bounded by duplicate density, the
contamination table by benchmark size).  ``tests/test_curate.py`` pins the
plan shape: one doc_id exchange of the corpus branch, no cross joins, no
corpus-sized broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from ..functions.urlnorm import canonical_url_col
from ..operators import datapipe as dp
from ..operators.graphs import duplicate_components
from ..operators.sampling import hash_split
from ..sources.pages import enqueue_documents

DEFAULT_SPLIT_WEIGHTS = {"train": 0.9, "valid": 0.05, "test": 0.05}


@dataclass
class CurateConfig:
    bench_phrases: list[str] = field(default_factory=list)
    split_weights: dict[str, float] = field(
        default_factory=lambda: dict(DEFAULT_SPLIT_WEIGHTS)
    )
    neardup_threshold: float = dp.NEARDUP_THRESHOLD
    max_bucket: object = "auto"   # megabucket guard passthrough
    drop_contaminated: bool = True
    # near-dup + CC can be disabled for a cheap exact-only pass
    near_dup: bool = True
    # Gopher-style quality gate (datapipe.gopher_quality): docs failing
    # the published thresholds are dropped BEFORE the (more expensive)
    # near-dup/contamination stages — boilerplate and word-salad pages are
    # exactly the ones that flood LSH buckets.
    quality_filter: bool = False
    # THREE consumers fan out of the post-dedup docs frame (band rows,
    # bench shingles, the final join) — without a persist each one re-runs
    # the scan + sanitize + both dedup shuffles.  On a cluster this is
    # where the docs table would be written once and re-read (the
    # cache_records pattern, kg_build.py); locally MEMORY_AND_DISK.
    persist_docs: bool = True


@dataclass
class CurateResult:
    curated: DataFrame        # surviving docs + split/flags
    docs: DataFrame           # post exact-dedup enqueue output
    near_pairs: DataFrame | None
    components: DataFrame | None
    contamination: DataFrame | None


def curate_corpus(pages: DataFrame, cfg: CurateConfig | None = None) -> CurateResult:
    """pages(url, text, page_order) -> curated docs.

    Returned ``curated`` columns: doc_id, text, file_path, doc_order,
    canonical_doc_id (self when unique), component_size, is_near_dup
    (member of a duplicate cluster but NOT its canonical), n_bench_hits,
    is_contaminated, split.  Rows dropped: url-duplicates, exact content
    duplicates, non-canonical near-dup cluster members, and (when
    ``drop_contaminated``) benchmark-contaminated docs.

    Everything is lazy; the caller materializes once.  Counts for a
    metrics line come from one aggregate over the pre-drop frame —
    never per-stage .count() actions (each would re-run the lineage).
    """
    cfg = cfg or CurateConfig()

    # ---- stage 1: URL identity — canonicalize, keep first page per key ----
    pages = pages.withColumn("_curl", canonical_url_col(F.col("url")))
    from pyspark.sql.window import Window

    w = Window.partitionBy("_curl").orderBy("page_order")
    pages = (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_curl")
    )

    # ---- stage 2: sanitize + exact content dedup (first-seen wins) --------
    docs = enqueue_documents(pages)
    return curate_documents(docs, cfg)


def curate_documents(docs: DataFrame, cfg: CurateConfig | None = None) -> CurateResult:
    """Stages 3-6 on an already content-deduped docs frame (doc_id, text,
    ...) — the entry point when exact dedup happened upstream (the driver
    gate's documents table, an Iceberg docs table written by a previous
    epoch).  ``curate_corpus`` is the pages-in front door."""
    cfg = cfg or CurateConfig()

    # ---- stage 2b (optional): Gopher quality gate -------------------------
    if cfg.quality_filter:
        q = dp.gopher_quality(docs)
        docs = docs.join(
            q.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
        )

    if cfg.persist_docs:
        from pyspark.storagelevel import StorageLevel

        docs = docs.persist(StorageLevel.MEMORY_AND_DISK)

    # ---- stage 3+4: near-dup pairs -> duplicate clusters ------------------
    near_pairs = components = None
    if cfg.near_dup:
        near_pairs = dp.near_duplicate_pairs(
            docs, threshold=cfg.neardup_threshold, max_bucket=cfg.max_bucket
        )
        components = duplicate_components(near_pairs)

    # ---- stage 5: benchmark decontamination -------------------------------
    contamination = None
    if cfg.bench_phrases:
        contamination = dp.contamination_check(docs, cfg.bench_phrases)

    # ---- assembly: one doc_id-keyed join chain ----------------------------
    id_type = docs.schema["doc_id"].dataType.simpleString()
    out = docs
    if components is not None:
        out = out.join(
            components.withColumnRenamed("doc_id", "_cid").select(
                F.col("_cid").alias("doc_id"), "canonical_doc_id", "component_size"
            ),
            "doc_id",
            "left",
        )
    else:
        out = out.withColumn("canonical_doc_id", F.lit(None).cast(id_type))
        out = out.withColumn("component_size", F.lit(None).cast("long"))
    out = (
        out.withColumn(
            "canonical_doc_id", F.coalesce("canonical_doc_id", F.col("doc_id"))
        )
        .withColumn("component_size", F.coalesce("component_size", F.lit(1)))
        .withColumn("is_near_dup", F.col("doc_id") != F.col("canonical_doc_id"))
    )
    if contamination is not None:
        out = out.join(
            contamination.select("doc_id", F.col("n_hits").alias("n_bench_hits")),
            "doc_id",
            "left",
        )
    else:
        out = out.withColumn("n_bench_hits", F.lit(None).cast("long"))
    out = out.withColumn(
        "n_bench_hits", F.coalesce("n_bench_hits", F.lit(0))
    ).withColumn("is_contaminated", F.col("n_bench_hits") > 0)

    # ---- stage 6: deterministic splits ------------------------------------
    out = hash_split(out, cfg.split_weights, key_col="doc_id")

    keep = ~F.col("is_near_dup")
    if cfg.drop_contaminated:
        keep = keep & ~F.col("is_contaminated")
    passthrough = [c for c in ("text", "file_path", "doc_order") if c in docs.columns]
    curated = out.filter(keep).select(
        "doc_id",
        *passthrough,
        "canonical_doc_id",
        "component_size",
        "is_near_dup",
        "n_bench_hits",
        "is_contaminated",
        "split",
    )
    return CurateResult(
        curated=curated,
        docs=docs,
        near_pairs=near_pairs,
        components=components,
        contamination=contamination,
    )


# ---------------------------------------------------------------------------
# Crawl-epoch incremental curation
# ---------------------------------------------------------------------------


def _state_exists(spark, path: str) -> bool:
    """Probe a state path through the Hadoop FileSystem API so the check
    works for whatever scheme the state dir lives on (HDFS/S3/local) —
    a driver-local ``os.path.exists`` is always False for remote URIs,
    which would silently re-bootstrap (overwrite) the state every epoch."""
    from ..functions.fsutil import hadoop_path_exists

    return hadoop_path_exists(spark, path)


def save_curation_state(docs: DataFrame, state_dir: str) -> None:
    """Persist the dedup state a future epoch probes against: the content
    hashes (exact dedup) and the minhash band index (near dedup) of every
    ACCEPTED document.  Overwrites — call once at bootstrap, then
    ``append_curation_state`` per epoch."""
    docs.select("doc_id", "content_hash").write.mode("overwrite").parquet(
        f"{state_dir}/content_hashes"
    )
    dp.save_minhash_index(docs, f"{state_dir}/minhash_index")


def append_curation_state(docs: DataFrame, state_dir: str) -> None:
    """Append an epoch's accepted docs to the persisted state (hash rows +
    band rows; the band append keeps the band_idx partition layout so
    future probes still prune partitions)."""
    docs.select("doc_id", "content_hash").write.mode("append").parquet(
        f"{state_dir}/content_hashes"
    )
    from ..operators.ann import prune_megabuckets

    bands = dp.minhash_band_rows(docs, with_shingles=True)
    bands = prune_megabuckets(bands, "auto")  # same save-time guard as bootstrap
    bands.write.mode("append").partitionBy("band_idx").parquet(
        f"{state_dir}/minhash_index"
    )


def curate_epoch(
    spark,
    pages: DataFrame,
    state_dir: str,
    cfg: CurateConfig | None = None,
    update_state: bool = True,
) -> CurateResult:
    """One crawl epoch against persisted curation state: the production
    incremental path (a fresh crawl lands; only documents that are new
    vs EVERYTHING accepted so far survive).

    Order of the gates, cheapest first:
    1. in-batch URL + exact dedup (curate_corpus stages 1-2);
    2. cross-epoch EXACT dedup — anti-join on stored content hashes
       (one broadcast-or-shuffle join against a hash-only table);
    3. in-batch near-dup clustering + cross-epoch near-dup probe against
       the stored band index (datapipe.incremental_near_pairs — work is
       bounded by band collisions);
    4. contamination + quality + splits as in the batch path.

    ``update_state=True`` appends the SURVIVORS' hashes and band rows to
    the state after materializing the curated frame, so the next epoch
    sees them.  Bootstrap: a missing/empty state dir skips the
    cross-epoch gates (first epoch).
    """
    cfg = cfg or CurateConfig()
    hashes_path = f"{state_dir}/content_hashes"
    index_path = f"{state_dir}/minhash_index"
    have_state = _state_exists(spark, hashes_path)

    # stages 1-2 in-batch (url canon + sanitize + exact dedup)
    pages = pages.withColumn("_curl", canonical_url_col(F.col("url")))
    from pyspark.sql.window import Window

    w = Window.partitionBy("_curl").orderBy("page_order")
    pages = (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_curl")
    )
    docs = enqueue_documents(pages)

    if have_state:
        prev_hashes = spark.read.parquet(hashes_path).select("content_hash")
        docs = docs.join(prev_hashes, "content_hash", "left_anti")

    result = curate_documents(docs, cfg)
    curated = result.curated

    if have_state and cfg.near_dup:
        cross = dp.incremental_near_pairs(
            spark, curated, index_path, threshold=cfg.neardup_threshold
        )
        curated = curated.join(
            cross.select(F.col("new_doc_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )

    if update_state:
        # Lineage truncation, not caching: appending to the state paths
        # makes Spark refreshByPath-invalidate ANY cached plan that reads
        # them, so a persist()ed survivors frame silently recomputes
        # against the post-append state and anti-joins ITSELF away (the
        # epoch's survivors are in the state by then).  localCheckpoint
        # severs the plan from the state files entirely; a cluster job
        # writes curated_docs parquet first and re-reads it, same idea.
        # The auxiliary frames (docs/near_pairs/components/contamination)
        # carry the SAME lineage through the anti-join on content_hashes,
        # so they must be truncated too before the append — otherwise any
        # action on them after this call recomputes against the grown
        # state and silently loses this epoch's rows.
        curated = curated.localCheckpoint(eager=True)
        _ckpt = lambda df: df.localCheckpoint(eager=True) if df is not None else None
        result = CurateResult(
            curated=curated,
            docs=_ckpt(result.docs),
            near_pairs=_ckpt(result.near_pairs),
            components=_ckpt(result.components),
            contamination=_ckpt(result.contamination),
        )
        accepted = curated.select("doc_id", "text").join(
            result.docs.select("doc_id", "content_hash"), "doc_id"
        )
        if have_state:
            append_curation_state(accepted, state_dir)
        else:
            save_curation_state(accepted, state_dir)

    return CurateResult(
        curated=curated,
        docs=result.docs,
        near_pairs=result.near_pairs,
        components=result.components,
        contamination=result.contamination,
    )
