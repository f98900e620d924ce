"""Benchmark: headline KG-construction throughput + per-query timings.

Prints ONE JSON line:
  {"metric": "kg_build_e2e", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "docs": N, "chunks": N, "triples": N, "triples_per_sec": N, "cpus": N}

Env:
  SPARK_GRAFT_SF_DIR      input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        local[] parallelism (default 32)
  SPARK_GRAFT_BENCH_MODE  "sf" (default: testdata corpus + operator suite),
                          "synth" (FIXTURES.md §1 bench corpus: long synthetic
                          pages, KG build only — the two-parallelism scaling
                          job; sized so real work dominates fixed overhead), or
                          "sf1" (10x key-shifted sf0.1 timing corpus built by
                          tools/make_sf1.py into /tmp/sf1 — regression rows
                          above host variance; BENCH.md records better-of-3)
  SPARK_GRAFT_N_PAGES     synth corpus size (default 8000)

The headline job is the full-mode pipeline (regex tokenizer windows 1200/100
are pointless on ~100-word synthetic docs, so the bench uses 64/8 windows —
multi-chunk docs — with gleaning ON and the salted merge): docs -> chunks ->
extract -> merge -> materialize kg_nodes + kg_edges counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "sf")
    n_pages = int(os.environ.get("SPARK_GRAFT_N_PAGES", "8000"))
    if mode == "sf1":
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import make_sf1

        sf_dir = make_sf1.build()
        sf = "1"
        mode = "sf"

    import __spark_entry__ as em
    from lightrag_spark.plans.kg_build import KGBuildConfig, build_kg
    from lightrag_spark.session import get_spark

    spark = get_spark(
        app_name="lightrag-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # --- headline: full-mode KG build --------------------------------------
    if mode == "synth":
        from lightrag_spark.sources.pages import enqueue_documents, synthesize_pages

        pages = synthesize_pages(spark, n_pages, seed=42)
        docs = enqueue_documents(pages)
        cfg = KGBuildConfig(
            tokenizer_kind="regex",
            chunk_token_size=256,
            chunk_overlap_token_size=32,
            max_gleaning=1,
            merge_salts=16,
            with_source_spans=True,
            cache_records=True,
        )
    else:
        docs = em._docs_for_kg(spark, sf_dir)
        cfg = KGBuildConfig(
            tokenizer_kind="regex",
            chunk_token_size=64,
            chunk_overlap_token_size=8,
            max_gleaning=1,
            merge_salts=16,
            with_source_spans=True,
            cache_records=True,
        )
    docs.cache()
    n_docs = docs.count()
    t0 = time.time()
    r = build_kg(docs, cfg)
    n_nodes = r.kg_nodes.count()
    n_edges = r.kg_edges.count()
    kg_sec = time.time() - t0
    timings["kg_build_full"] = round(kg_sec, 3)

    # counts off the persisted extraction output (no recompute)
    n_chunks = r.chunks.count()
    n_triples = r.triples.count()

    # --- secondary operator benchmarks --------------------------------------
    # Two groups: queries that reuse the kg build's persisted records run
    # first (warm cache is their intended state); then the session cache is
    # dropped so the standalone datapipe/sim operators are timed without the
    # build's cached blocks competing for executor memory (measured 2-4x
    # inflation of the md5-heavy codegen stages when timed under the build's
    # residency).
    kg_dependent = () if mode == "synth" else (
        "kg_chunks",
        "kg_triples",
        "kg_nodes",
        "kg_global_context",
        "kg_hybrid_interleave",
        "batch_query_context",
        "batch_query_rerank",
        "kg_summary",
        "kg_delete_doc",
        "kg_entity_links",
        "kg_pagerank",
        "kg_edge_lift",
        "kg_triangles",
        "kg_communities",
        "kg_node_similarity",
        "kg_pagerank_weighted",
        "kg_negative_samples",
        "kg_neighborhood2",
        "kg_transe_scores",
        "kg_ppr",
        "kg_transe_hits",
        "kg_modularity",
        "kg_community_cuts",
        "kg_random_walks",
        "kg_degree_alpha",
        "kg_chunk_dedup",
        "kg_community_reps",
        "kg_integrity",
        "kg_type_pairs",
        "kg_metapaths",
        "kg_hits",
        "kg_assortativity",
        "kg_degree_histogram",
    )
    standalone = () if mode == "synth" else (
        "dedup_near_pairs",
        "dedup_simhash",
        "dedup_simhash_near",
        "dedup_embedding_near",
        "sim_cosine_topk",
        "sim_ann_topk",
        "sim_knn_label_vote",
        "text_quality",
        "events_sessions",
        "tpch_q1ish",
        "eval_retrieval",
        "corpus_curated",
        "text_pii_redact",
        "data_pack_layout",
        "data_domain_quota",
        "data_domain_mixture",
        "data_domain_upsample",
        "text_scrub_spans",
        "text_segment_dedup",
        "text_unigram_logprob",
        "kg_links_embedding",
        "events_asof_join",
        "events_rollup",
        "text_tfidf_terms",
        "events_interval_join",
        "events_quantiles",
        "data_dsir_weights",
        "text_hll_tokens",
        "text_cm_heavy_hitters",
        "doc_blocklist_scrub",
        "events_funnel",
        "events_retention",
        "events_pivot",
        "events_anomalies",
        "text_dup_ngrams",
        "text_dup_spans",
        "text_bpe_pairs",
        "sim_sq_topk",
        "events_topk_users",
        "text_readability",
        "events_hll_users",
        "doc_url_canonical",
        "eval_ndcg",
        "text_token_entropy",
        "dedup_containment",
        "corpus_filter_report",
        "text_zipf_slope",
        "text_js_domains",
        "events_ewma",
        "data_weighted_sample",
        "doc_url_dedup",
        "events_interarrival",
        "eval_langid_confusion",
        "events_session_length",
        "retrieval_rrf_hybrid",
        "text_winnow_fingerprints",
        "data_epoch_shuffle",
        "events_kmv_users",
        "dedup_bloom",
        "retrieval_bm25_topk",
        "dedup_semantic",
        "events_histogram",
        "events_kmv_overlap",
        "eval_bleu_pairs",
        "eval_rouge_pairs",
        "eval_chrf_pairs",
        "text_bigram_logprob",
        "events_sliding",
        "sim_mmr_topk",
        "text_rake_keywords",
        "text_encoding_stats",
        "eval_rank_corr",
        "events_rank_shift",
        "sim_norm_histogram",
        "data_stratified_sample",
        "events_seasonality",
        "events_markov",
        "events_cusum",
        "events_gini",
        "crawl_schedule",
        "eval_token_f1",
        "sim_label_centroids",
        "sim_knn_confusion",
        "eval_knn_calibration",
        "dedup_truss_cores",
        "sim_hard_negatives",
        "events_bot_signals",
        "data_temperature_weights",
        "retrieval_ql_topk",
        "events_attribution",
        "events_conversion_latency",
        "events_stickiness",
        "sim_label_separation",
        "doc_host_report",
        "sim_training_triplets",
        "events_ab_test",
        "eval_knn_mrr",
        "doc_k_anonymity",
        "text_lexical_diversity",
        "events_type_affinity",
        "events_autocorr",
        "events_new_users",
        "text_ngram_coverage",
        "data_token_budget",
        "events_error_rate",
    )

    def _time(name):
        fn = em.queries()[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # Warm the memoized simple-mode build as its OWN timing entry — it used
    # to be silently absorbed by whichever kg_* query ran first, which made
    # that query's number meaningless round-over-round.
    if kg_dependent:
        t0 = time.time()
        r_simple = em._build(spark, sf_dir)
        r_simple.mentions.count()
        r_simple.triples.count()
        timings["kg_simple_build_warm"] = round(time.time() - t0, 3)
    for name in kg_dependent:
        _time(name)
    if standalone:
        spark.catalog.clearCache()
    for name in standalone:
        _time(name)

    total = timings["kg_build_full"]
    out = {
        "metric": "kg_build_e2e",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "mode": mode,
        "cpus": cpus,
        "docs": n_docs,
        "chunks": n_chunks,
        "nodes": n_nodes,
        "edges": n_edges,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / max(kg_sec, 1e-9), 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
