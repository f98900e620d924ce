"""Entity linking — alias resolution over the canonicalized KG.

The reference's entity linking IS name normalization: mentions that
normalize to the same string become one node
(``reference/lightrag/utils.py:4697-4700`` via the merge key,
``operate.py:2226+``).  That leaves surface variants apart — "acme corp"
vs "acme corporation", "color" vs "colour" — which at web scale
(10^8+ distinct names from 10^12 docs) is the dominant source of split
entities.  The north rule names entity linking as a first-class stage;
this module supplies it as a deterministic, oracle-replayable operator
ABOVE the reference's semantics (the reference graph is the input, the
linked graph the output — running with an empty link map is the
reference behavior unchanged).

Pipeline (all JVM-side expressions, no Python in the flow):

1. candidate generation — character 3-gram shingles of each DISTINCT
   entity name, MinHash (the md5-portable formula of
   ``datapipe.minhash_signature_cols``), LSH banding.  Names are short
   (≤~60 chars → ≤~58 shingles), so the interpreted higher-order-function
   cost that pushed document shingling to an Arrow kernel is immaterial
   here; the expression form keeps the DuckDB twin bit-identical for free.
2. megabucket guard — buckets larger than ``max_bucket`` are dropped
   (common-trigram bands would otherwise quadratically explode the
   candidate join at 10^8 names; the same N²-bucket law as
   ``ann.prune_megabuckets``).  A fixed absolute cap keeps the oracle
   twin a one-line join instead of a median estimate: name-similarity
   buckets are tiny by construction (a bucket = names sharing 2 of 8
   minhashes), so a size-64 bucket is pathology, not signal.
3. verify — exact character-shingle Jaccard on bucket-cohabiting pairs,
   keep >= ``threshold``.
4. closure — :func:`~lightrag_spark.operators.graphs.connected_components`
   (min-label propagation, checkpointed rounds).
5. canonical pick — per component the highest-degree node wins
   (tie: mention_count desc, then lexicographic min), mirroring the
   reference's keep-the-hub instinct in ``amerge_entities``
   (``utils_graph.py:572+``) where the target entity absorbs sources.

Scale shape at 10^12 docs: every stage is bounded by DISTINCT NAME
cardinality (~10^8), not corpus size — one groupBy to get names, 4 band
shuffles of 8-byte buckets, a bucket-local self-join bounded by
``max_bucket``², and a CC whose components are alias clusters (diameter
2-3).  Nothing touches the chunks or documents tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from lightrag_spark.operators.datapipe import minhash_signature_cols
from lightrag_spark.operators.graphs import connected_components

NAME_SHINGLE_N = 3       # character n-gram width
NAME_MINHASH_K = 8       # minhash functions over name shingles
NAME_LSH_BANDS = 4       # bands (x NAME_LSH_ROWS = NAME_MINHASH_K)
NAME_LSH_ROWS = 2        # rows per band
NAME_LINK_THRESHOLD = 0.6   # exact char-shingle Jaccard to accept a link
NAME_MAX_BUCKET = 64     # absolute megabucket guard on band buckets


def name_shingles_col(name: Column, n: int = NAME_SHINGLE_N) -> Column:
    """Distinct character n-grams of a name; whole name when shorter.

    The short-name fallback keeps 1-2 char names linkable only on exact
    equality (they already merged at normalization), instead of the
    empty-set rows the document shingler drops.
    """
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.length(name) - n),
            lambda i: F.substring(name, F.lit(1) + i, n),
        )
    )
    return F.when(F.length(name) >= n, grams).otherwise(F.array(name))


def name_band_rows(
    names: DataFrame,
    name_col: str = "entity_name",
    use_arrow: bool = True,
) -> DataFrame:
    """(nm, band_idx, bucket, sh) — one row per LSH band per DISTINCT name,
    carrying the shingle set so the verify stage never recomputes it.

    Two physical strategies for the same formula (the minhash_band_rows
    pattern): ``use_arrow=True`` computes shingles, all minhash md5
    minima, and band buckets in ONE Arrow pass with hashlib — Catalyst
    interprets (does not codegen) the higher-order md5 folds, and at
    200k+ names the interpreted path dominated the linking probe.
    ``use_arrow=False`` is the pure-expression form the DuckDB oracle
    replays; the two are asserted bit-identical in tests (md5 hex strings
    and their lexicographic minima compare the same everywhere).
    """
    distinct = names.select(F.col(name_col).alias("nm")).distinct()
    if not use_arrow:
        sh = distinct.withColumn("sh", name_shingles_col(F.col("nm")))
        sigs = sh.select(
            "nm", "sh",
            F.array(*minhash_signature_cols(F.col("sh"), k=NAME_MINHASH_K)).alias("sig"),
        )
        bands = [
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col("sig")[b * NAME_LSH_ROWS + r] for r in range(NAME_LSH_ROWS)],
                    )
                ).alias("bucket"),
            )
            for b in range(NAME_LSH_BANDS)
        ]
        return sigs.select("nm", "sh", F.explode(F.array(*bands)).alias("bb")).select(
            "nm",
            F.col("bb.band_idx").cast("int").alias("band_idx"),
            F.col("bb.bucket").alias("bucket"),
            "sh",
        )

    n_part = int(names.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    src = distinct.repartition(n_part)
    n, k, n_bands, rows = NAME_SHINGLE_N, NAME_MINHASH_K, NAME_LSH_BANDS, NAME_LSH_ROWS

    def kernel(batches):
        import hashlib

        import pandas as pd

        prefixes = [f"{i}:".encode() for i in range(k)]
        for pdf in batches:
            nms, bands_out, buckets, sh_out = [], [], [], []
            for nm in pdf.iloc[:, 0]:
                # same fallback as name_shingles_col: whole name when short
                if len(nm) >= n:
                    sh = list(dict.fromkeys(nm[i : i + n] for i in range(len(nm) - n + 1)))
                else:
                    sh = [nm]
                enc = [s.encode() for s in sh]
                mh = [min(hashlib.md5(p + e).hexdigest() for e in enc) for p in prefixes]
                for b in range(n_bands):
                    nms.append(nm)
                    bands_out.append(b)
                    buckets.append(
                        hashlib.md5("|".join(mh[b * rows : (b + 1) * rows]).encode()).hexdigest()
                    )
                    sh_out.append(sh)
            out = pd.DataFrame({"nm": nms, "band_idx": bands_out, "bucket": buckets})
            # explicit object dtype: empty batches otherwise infer float64
            out["sh"] = pd.Series(sh_out, dtype="object")
            yield out

    return src.mapInPandas(kernel, "nm string, band_idx int, bucket string, sh array<string>")


def name_link_pairs(
    names: DataFrame,
    name_col: str = "entity_name",
    threshold: float = NAME_LINK_THRESHOLD,
    max_bucket: int = NAME_MAX_BUCKET,
    use_arrow: bool = True,
) -> DataFrame:
    """(nm_a, nm_b, jaccard) — accepted alias-candidate pairs, nm_a < nm_b.

    LSH-bucketed candidates verified by exact shingle Jaccard — never an
    all-pairs join (the brute-force twin lives only in the DuckDB oracle
    at gate scale).  Shingle sets ride the band rows through the
    self-join, so verification adds no extra join against a recomputed
    shingle table.
    """
    # banded fans out 3 ways (guard size-agg + BOTH self-join sides) — the
    # shingle/minhash kernel would re-run once per consumer without the
    # checkpoint (4 bands x distinct names, shingles of <=60-char strings:
    # tiny).  Buckets with a single member cannot produce a pair (a.nm <
    # b.nm), so dropping them pre-join is result-identical and keeps
    # lonely names out of the self-join shuffle.
    banded = name_band_rows(names, name_col=name_col, use_arrow=use_arrow)
    banded = banded.hint("rebalance").localCheckpoint(eager=True)
    sizes = banded.groupBy("band_idx", "bucket").agg(F.count(F.lit(1)).alias("_n"))
    pruned = banded.join(
        sizes.filter((F.col("_n") <= max_bucket) & (F.col("_n") >= 2)),
        ["band_idx", "bucket"],
    ).drop("_n")
    cand = (
        pruned.alias("a")
        .join(
            pruned.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.nm") < F.col("b.nm")),
        )
        .select(
            F.col("a.nm").alias("nm_a"),
            F.col("b.nm").alias("nm_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["nm_a", "nm_b"])
    )
    return (
        cand.withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("nm_a", "nm_b", "jaccard")
    )


def link_entities(
    nodes: DataFrame,
    name_col: str = "entity_name",
    degree_col: str = "degree",
    mention_col: str = "mention_count",
    threshold: float = NAME_LINK_THRESHOLD,
    max_bucket: int = NAME_MAX_BUCKET,
    use_arrow: bool = True,
) -> DataFrame:
    """(entity_name, canonical_name, component_size) — the alias map.

    Only entities belonging to a link component (size >= 2) appear; the
    canonical itself maps to itself.  Everything absent from the map is
    its own canonical — exactly the contract
    :func:`duplicate_components` uses for docs, so the applier's
    left-join-coalesce default is correct by the same argument.
    """
    pairs = name_link_pairs(
        nodes, name_col=name_col, threshold=threshold, max_bucket=max_bucket,
        use_arrow=use_arrow,
    )
    return links_from_pairs(
        pairs, nodes,
        name_col=name_col, degree_col=degree_col, mention_col=mention_col,
    )


def link_entities_by_embedding(
    nodes: DataFrame,
    threshold: float = 0.9,
    name_col: str = "entity_name",
    vec_col: str = "embedding",
    dim: int = 64,
    degree_col: str = "degree",
    mention_col: str = "mention_count",
) -> DataFrame:
    """Semantic alias map — the second linking modality.

    Surface-form linking (:func:`link_entities`) cannot see aliases that
    share no characters — acronyms ("WHO" / "world health organization"),
    translations, nicknames.  Those DO sit together in embedding space,
    so this modality buckets entity-description embeddings with the ANN
    machinery (:func:`~lightrag_spark.operators.ann.embedding_near_pairs`
    — LSH band candidates, exact cosine verify, never all-pairs) and
    closes/canonicalizes identically to the surface path.  Same output
    contract; union the two maps' PAIRS before closure when both
    modalities run (a shared member merges the clusters transitively).
    """
    from lightrag_spark.operators.ann import embedding_near_pairs

    pairs = embedding_near_pairs(
        nodes.select(F.col(name_col).alias("vec_id"), F.col(vec_col).alias("embedding")),
        threshold=threshold,
        dim=dim,
    ).select(F.col("vec_a").alias("nm_a"), F.col("vec_b").alias("nm_b"))
    return links_from_pairs(
        pairs, nodes,
        name_col=name_col, degree_col=degree_col, mention_col=mention_col,
    )


def links_from_pairs(
    pairs: DataFrame,
    nodes: DataFrame,
    src: str = "nm_a",
    dst: str = "nm_b",
    name_col: str = "entity_name",
    degree_col: str = "degree",
    mention_col: str = "mention_count",
) -> DataFrame:
    """Accepted alias pairs -> (entity_name, canonical_name,
    component_size): connected-components closure + hub-canonical pick —
    the shared back half of every linking modality."""
    from lightrag_spark.operators.graphs import CC_DRIVER_MAX_EDGES

    comp = connected_components(
        pairs, src=src, dst=dst, driver_max_edges=CC_DRIVER_MAX_EDGES
    )
    stats = nodes.select(
        F.col(name_col).alias("node"),
        F.col(degree_col).cast("long").alias("_deg"),
        F.col(mention_col).cast("long").alias("_men"),
    )
    ranked = comp.join(stats, "node", "left").fillna(0, subset=["_deg", "_men"])
    w = Window.partitionBy("component").orderBy(
        F.desc("_deg"), F.desc("_men"), F.asc("node")
    )
    canon = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("component", F.col("node").alias("canonical_name"))
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("component_size"))
    return (
        comp.join(canon, "component")
        .join(sizes, "component")
        .select(
            F.col("node").alias("entity_name"),
            "canonical_name",
            F.col("component_size").cast("long").alias("component_size"),
        )
    )


def apply_entity_links(
    nodes: DataFrame, edges: DataFrame, links: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Rewrite the graph through the alias map -> (linked_nodes, linked_edges).

    Edges re-point to canonical endpoints, re-key undirected
    (least/greatest — the merge.py orientation rule), drop self-loops
    (both endpoints linked to one entity: the relation is now internal),
    and merge duplicates by summing weight/relation_count — the same
    additive semantics ``merge_relation_edges`` gives co-occurrence
    counts.  Nodes aggregate mention_count and linked-name count per
    canonical; degree is RECOMPUTED from the rewritten edges (the old
    degrees count alias-split edges twice).

    The links frame is alias-cluster-sized (small share of distinct
    names); Spark broadcasts it under AQE, so both rewrites stay
    scan-shaped with no corpus shuffle beyond the final merge groupBy.
    """
    amap = links.select(
        F.col("entity_name").alias("_k"), F.col("canonical_name").alias("_c")
    )
    e = (
        edges.join(amap.withColumnRenamed("_k", "src"), "src", "left")
        .withColumn("_src", F.coalesce("_c", F.col("src")))
        .drop("_c")
        .join(amap.withColumnRenamed("_k", "tgt"), "tgt", "left")
        .withColumn("_tgt", F.coalesce("_c", F.col("tgt")))
        .drop("_c")
        .select(
            F.least("_src", "_tgt").alias("src"),
            F.greatest("_src", "_tgt").alias("tgt"),
            "weight",
            "relation_count",
        )
        .filter(F.col("src") != F.col("tgt"))
        .groupBy("src", "tgt")
        .agg(
            F.sum("weight").cast("double").alias("weight"),
            F.sum("relation_count").cast("long").alias("relation_count"),
        )
    )
    deg = (
        e.select(F.col("src").alias("entity_name"))
        .union(e.select(F.col("tgt").alias("entity_name")))
        .groupBy("entity_name")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    n = (
        nodes.join(amap.withColumnRenamed("_k", "entity_name"), "entity_name", "left")
        .withColumn("_canon", F.coalesce("_c", F.col("entity_name")))
        .groupBy(F.col("_canon").alias("entity_name"))
        .agg(
            F.sum("mention_count").cast("long").alias("mention_count"),
            F.count(F.lit(1)).cast("long").alias("linked_names"),
        )
        .join(deg, "entity_name", "left")
        .fillna(0, subset=["degree"])
    )
    return n, e
