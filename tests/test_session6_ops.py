"""Unit coverage for the session-6 operators: value histogram, KMV
day-overlap sketch algebra, KG integrity audit, corpus BLEU-2."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from lightrag_spark.evaluation.bleu import bleu2_pairs
from lightrag_spark.operators import datapipe as dp
from lightrag_spark.operators.graphs import graph_integrity


def test_value_histogram_bins(spark):
    rows = [("a", float(i)) for i in range(10)] + [("b", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    out = dp.value_histogram(df, group="g", col="value").collect()
    a = {r["bin"]: r for r in out if r["g"] == "a"}
    # mn=0, mx=9: each integer value lands in its own bin, max clamps to 9
    assert sorted(a) == list(range(10))
    assert all(a[b]["n"] == 1 for b in a)
    assert a[0]["bin_lo"] == 0.0
    assert a[9]["bin_lo"] == pytest.approx(8.1)
    # constant-valued group degenerates to a single bin 0
    b = [r for r in out if r["g"] == "b"]
    assert len(b) == 1 and b[0]["bin"] == 0 and b[0]["n"] == 2
    assert b[0]["bin_lo"] == 5.0


def test_kmv_day_overlap_small_set_exact(spark):
    rows = []
    for d, users in [(1, [1, 2, 3]), (2, [2, 3, 4, 5]), (3, [9])]:
        for u in users:
            rows.append((datetime.datetime(2024, 1, d, 12, 0, 0), u))
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = {
        (str(r["day"]), str(r["next_day"])): r
        for r in dp.kmv_day_overlap(ev).collect()
    }
    assert set(out) == {("2024-01-01", "2024-01-02"), ("2024-01-02", "2024-01-03")}
    r = out[("2024-01-01", "2024-01-02")]
    # below k the sketch IS the union: estimates collapse to exact counts
    assert r["exact_union"] == 5 and r["exact_intersection"] == 2
    assert r["est_union"] == 5.0 and r["est_intersection"] == 2.0
    r2 = out[("2024-01-02", "2024-01-03")]
    assert r2["exact_union"] == 5 and r2["exact_intersection"] == 0
    assert r2["est_intersection"] == 0.0


def test_kmv_day_overlap_estimate_tracks_exact(spark):
    # two days of 600 users with 50% overlap; k=256 (the default k=64 is
    # ~2.3 sigma high on this fixed md5 draw) — estimates within 25%/35%
    rows = []
    for u in range(600):
        rows.append((datetime.datetime(2024, 2, 1, 6, 0, 0), u))
        rows.append((datetime.datetime(2024, 2, 2, 6, 0, 0), u + 300))
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    r = dp.kmv_day_overlap(ev, k=256).collect()[0]
    assert r["exact_union"] == 900 and r["exact_intersection"] == 300
    assert abs(r["est_union"] - 900) / 900 < 0.25
    assert abs(r["est_intersection"] - 300) / 300 < 0.35


def test_graph_integrity_flags_planted_violations(spark):
    nodes = spark.createDataFrame(
        [("a", 2), ("b", 1), ("c", 0)], "entity_name string, degree long"
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", 1.0, 2),
            ("a", "b", 1.0, 1),   # duplicate undirected key
            ("b", "a", 1.0, 1),   # unordered key (src > tgt)
            ("c", "c", 0.0, 1),   # self loop + nonpositive weight
            ("a", "zz", 1.0, 1),  # dangling endpoint
        ],
        "src string, tgt string, weight double, relation_count long",
    )
    m = {r["metric"]: r["value"] for r in graph_integrity(nodes, edges).collect()}
    assert m["n_nodes"] == 3 and m["n_edges"] == 5
    assert m["self_loops"] == 1
    assert m["unordered_edge_keys"] == 1
    assert m["duplicate_edge_keys"] == 1
    assert m["nonpositive_weight_edges"] == 1
    assert m["dangling_edges"] == 1
    assert m["isolated_nodes"] == 1
    assert m["max_degree"] == 2 and m["total_relations"] == 6


def test_bleu2_identity_disjoint_and_brevity(spark):
    rows = [
        (1, 1, ["a", "b", "c", "d"], ["a", "b", "c", "d"]),
        (2, 2, ["x", "x"], ["a", "b", "c", "d"]),
        (3, 3, ["a", "b"], ["a", "b", "c", "d"]),
        (4, 4, ["a", "b", "c", "d", "e"], ["a", "b"]),
    ]
    df = spark.createDataFrame(
        rows,
        "cand_id long, ref_id long, cand_tokens array<string>, "
        "ref_tokens array<string>",
    )
    out = {r["cand_id"]: r for r in bleu2_pairs(df).collect()}
    # identical pair: all precisions 1, no brevity penalty
    assert out[1]["bleu"] == 1.0 and out[1]["bp"] == 1.0
    # fully disjoint candidate: zero precision at order 1 -> BLEU 0
    assert out[2]["p1"] == 0.0 and out[2]["bleu"] == 0.0
    # perfect half-length prefix: p1=p2=1, bp=exp(1-4/2)
    assert out[3]["p1"] == 1.0 and out[3]["p2"] == 1.0
    assert out[3]["bleu"] == pytest.approx(round(math.exp(-1.0), 4))
    # longer-than-reference candidate: bp clamps to 1, clipping bounds p1
    assert out[4]["bp"] == 1.0
    assert out[4]["p1"] == pytest.approx(0.4)  # clipped 2 matches / 5


def test_bleu2_clipping_counts_repeats_once(spark):
    # candidate repeats 'a' 4x but reference has it twice -> clipped tf=2
    df = spark.createDataFrame(
        [(1, 1, ["a", "a", "a", "a"], ["a", "b", "a", "c"])],
        "cand_id long, ref_id long, cand_tokens array<string>, "
        "ref_tokens array<string>",
    )
    r = bleu2_pairs(df).collect()[0]
    assert r["p1"] == pytest.approx(0.5)  # min(4,2)/4
    # candidate bigrams: 'a a' x3, reference has none -> p2 = 0 -> bleu 0
    assert r["p2"] == 0.0 and r["bleu"] == 0.0


def test_rouge2_identity_disjoint_prefix_clipping(spark):
    rows = [
        (1, 1, ["a", "b", "c", "d"], ["a", "b", "c", "d"]),
        (2, 2, ["x", "x"], ["a", "b", "c", "d"]),
        (3, 3, ["a", "b"], ["a", "b", "c", "d"]),
        (4, 4, ["a", "b", "a", "b"], ["a", "b"]),
    ]
    df = spark.createDataFrame(
        rows,
        "cand_id long, ref_id long, cand_tokens array<string>, "
        "ref_tokens array<string>",
    )
    from lightrag_spark.evaluation.rouge import rouge2_pairs

    out = {r["cand_id"]: r for r in rouge2_pairs(df).collect()}
    assert out[1]["p2"] == 1.0 and out[1]["r2"] == 1.0 and out[1]["f2"] == 1.0
    assert out[2]["overlap"] == 0 and out[2]["f2"] == 0.0
    # prefix: cand bigrams {ab}, ref {ab,bc,cd} -> p2=1, r2=1/3, f2=0.5
    assert out[3]["p2"] == 1.0
    assert out[3]["r2"] == pytest.approx(0.3333)
    assert out[3]["f2"] == pytest.approx(0.5)
    # clipping: cand has 'a b' twice, ref once -> overlap clipped to 1
    assert out[4]["overlap"] == 1 and out[4]["p2"] == pytest.approx(0.3333)


def test_chrf_identity_whitespace_and_disjoint(spark):
    from lightrag_spark.evaluation.chrf import chrf_pairs

    rows = [
        (1, 1, "spark engine", "spark engine"),
        (2, 2, "spark  engine", "sp ark engine"),  # same chars, diff spacing
        (3, 3, "aaaa", "zzzz"),
        (4, 4, "ab", "ab"),  # shorter than max order: order-3 p=r=0
    ]
    df = spark.createDataFrame(
        rows, "cand_id long, ref_id long, cand_text string, ref_text string"
    )
    out = {r["cand_id"]: r for r in chrf_pairs(df).collect()}
    assert out[1]["chrf"] == 1.0
    # whitespace stripped -> identical gram multisets -> perfect score
    assert out[2]["chrf"] == 1.0 and out[2]["cand_chars"] == 11
    assert out[3]["chrf"] == 0.0
    # 'ab': p1=p2=1, p3=0 -> chrP=chrR=2/3, chrF=2/3
    assert out[4]["chrp"] == pytest.approx(0.6667)
    assert out[4]["chrf"] == pytest.approx(0.6667)


def test_bigram_logprob_manual(spark):
    import math

    # corpus: doc1 "a b a b", doc2 "a b" ; doc3 "x" has no bigrams
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dp.bigram_logprob(df).collect()}
    assert 3 not in out
    # corpus bigrams: 'a b' x3, 'b a' x1; ctx a=3, b=1; V = {a,b,x} = 3
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (1 + 3)
    exp1 = (2 * math.log(p_ab) + 1 * math.log(p_ba)) / 3
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logprob"] == pytest.approx(round(exp1, 4), abs=1e-4)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_logprob"] == pytest.approx(round(math.log(p_ab), 4), abs=1e-4)


def test_sliding_windows_expand_and_count(spark):
    from lightrag_spark.streaming.incremental import sliding_ingest_counts

    rows = [
        (datetime.datetime(2024, 1, 1, 10, 7, 0), "a"),
        (datetime.datetime(2024, 1, 1, 10, 8, 0), "a"),
        (datetime.datetime(2024, 1, 1, 10, 11, 0), "a"),
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in sliding_ingest_counts(
            ev, window_minutes=10, slide_minutes=5, key_col="event_type"
        ).collect()
    }
    # events at :07/:08 live in [10:00,10:10) and [10:05,10:15);
    # the :11 event lives in [10:05,10:15) and [10:10,10:20)
    assert out[("2024-01-01 10:00:00", "a")] == 2
    assert out[("2024-01-01 10:05:00", "a")] == 3
    assert out[("2024-01-01 10:10:00", "a")] == 1
    with pytest.raises(ValueError):
        sliding_ingest_counts(ev, window_minutes=10, slide_minutes=4)


def test_mmr_prefers_diverse_over_redundant(spark):
    # query 0; candidates: 1 and 2 nearly identical (both ~q), 3 orthogonal-ish
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.14, 0.0]),
        (2, [0.98, 0.199, 0.0]),
        (3, [0.5, 0.0, 0.87]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # lam=0.5: redundancy penalty strong enough that the near-duplicate of
    # pick 1 (psim ~0.998) scores below the diverse candidate 3
    out = (
        dp.mmr_topk(df, n_queries=1, k=3, pool_k=3, lam=0.5)
        .orderBy("step")
        .collect()
    )
    picks = [r["neighbor_id"] for r in out]
    # plain cosine order is [1, 2, 3]; MMR keeps 1 then jumps to diverse 3
    assert picks[0] == 1
    assert picks[1] == 3
    assert picks[2] == 2
    assert [r["step"] for r in out] == [1, 2, 3]
    # relevance-dominant lam leaves the cosine order untouched
    greedy = dp.mmr_topk(df, n_queries=1, k=2, pool_k=3, lam=1.0)
    assert [r["neighbor_id"] for r in greedy.orderBy("step").collect()] == [1, 2]


def test_rake_scores_multiword_phrases_highest(spark):
    # classic RAKE behavior: co-occurring content words outscore singles
    df = spark.createDataFrame(
        [(1, "deep learning is the study of deep networks and learning")],
        "doc_id long, text string",
    )
    out = dp.rake_keywords(df).collect()
    by_phrase = {r["phrase"]: r for r in out}
    # phrases: 'deep learning' | 'study' | 'deep networks' | 'learning'
    # freq: deep=2, learning=2, networks=1, study=1
    # deg:  deep=2+2=4, learning=2+1=3, networks=2, study=1
    assert by_phrase["deep networks"]["score"] == 4.0  # 2.0 + 2.0
    assert by_phrase["deep learning"]["score"] == 3.5  # 2.0 + 1.5
    assert by_phrase["learning"]["score"] == 1.5
    assert by_phrase["study"]["score"] == 1.0
    ranks = {r["rank"]: r["phrase"] for r in out}
    assert ranks[1] == "deep networks"
    assert ranks[2] == "deep learning"


def test_rake_punctuation_stripped_and_stopword_breaks(spark):
    df = spark.createDataFrame(
        [(1, "Spark, and FAST engines!")], "doc_id long, text string"
    )
    out = {r["phrase"] for r in dp.rake_keywords(df).collect()}
    # 'spark,' -> 'spark'; 'and' breaks; 'fast engines!' -> 'fast engines'
    assert out == {"spark", "fast engines"}


def test_encoding_stats_detects_planted_junk(spark):
    df = spark.createDataFrame(
        [(1, "plain ascii"), (2, "café �" + chr(7))],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dp.encoding_stats(df).collect()}
    assert out[1]["non_ascii"] == 0 and not out[1]["suspect"]
    r = out[2]
    assert r["non_ascii"] == 2  # é and U+FFFD
    assert r["replacement"] == 1
    assert r["control"] == 1  # BEL; tab/newline/CR would not count
    assert r["suspect"]


def test_graph_type_pairs_unordered_key(spark):
    nodes = spark.createDataFrame(
        [("a", "person"), ("b", "org"), ("c", "person")],
        "entity_name string, entity_type string",
    )
    edges = spark.createDataFrame(
        [("a", "b", 1.0, 1), ("b", "c", 2.0, 2), ("a", "c", 1.0, 1)],
        "src string, tgt string, weight double, relation_count long",
    )
    from lightrag_spark.operators.graphs import graph_type_pairs

    out = {(r["type_a"], r["type_b"]): r for r in graph_type_pairs(nodes, edges).collect()}
    # a-b (person,org) and b-c (org,person) collapse to the same pair
    assert out[("org", "person")]["n_edges"] == 2
    assert out[("org", "person")]["relations"] == 3
    assert out[("org", "person")]["weight_sum"] == 3.0
    assert out[("person", "person")]["n_edges"] == 1


def test_rank_correlation_perfect_and_inverted(spark):
    # group g1: y order follows x exactly; g2: perfectly inverted
    rows = []
    for i, (nc, nw) in enumerate([(10, 2), (20, 4), (30, 6)]):
        rows.append((i, "g1", nc, "w " * nw))
    for i, (nc, nw) in enumerate([(10, 6), (20, 4), (30, 2)]):
        rows.append((10 + i, "g2", nc, "w " * nw))
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long, text string"
    )
    out = {r["source"]: r for r in dp.rank_correlation(df).collect()}
    assert out["g1"]["tau_b"] == 1.0 and out["g1"]["concordant"] == 3
    assert out["g2"]["tau_b"] == -1.0 and out["g2"]["discordant"] == 3


def test_rank_correlation_ties_and_cap(spark):
    rows = [
        (0, "g", 10, "a b"),
        (1, "g", 10, "a b c"),   # tied x
        (2, "g", 20, "a b c"),   # tied y with doc 1
        (99, "g", 5, "a"),       # beyond cap=3 -> excluded
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long, text string"
    )
    r = dp.rank_correlation(df, cap=3).collect()[0]
    assert r["n_docs"] == 3
    assert r["tied_x"] == 1 and r["tied_y"] == 1 and r["concordant"] == 1
    # tau_b = (1-0)/sqrt((1+0+1)*(1+0+1)) = 0.5
    assert r["tau_b"] == pytest.approx(0.5)


def test_daily_rank_shift_tracks_movers(spark):
    rows = []
    for _ in range(3):
        rows.append((datetime.datetime(2024, 1, 1, 9, 0), "x"))
    rows.append((datetime.datetime(2024, 1, 1, 9, 0), "y"))
    # next day y overtakes x; z debuts
    for _ in range(5):
        rows.append((datetime.datetime(2024, 1, 2, 9, 0), "y"))
    rows.append((datetime.datetime(2024, 1, 2, 9, 0), "x"))
    rows.append((datetime.datetime(2024, 1, 2, 9, 0), "z"))
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {
        (str(r["day"]), r["event_type"]): r
        for r in dp.daily_rank_shift(ev).collect()
    }
    assert out[("2024-01-01", "x")]["rnk"] == 1
    assert out[("2024-01-01", "x")]["prev_rnk"] is None
    y2 = out[("2024-01-02", "y")]
    assert y2["rnk"] == 1 and y2["prev_rnk"] == 2 and y2["delta"] == 1
    x2 = out[("2024-01-02", "x")]
    assert x2["rnk"] == 2 and x2["delta"] == -1
    assert out[("2024-01-02", "z")]["prev_rnk"] is None


def test_graph_metapaths_counts_and_hub_prune(spark):
    nodes = spark.createDataFrame(
        [("a", "person"), ("b", "org"), ("c", "person"), ("h", "event"),
         ("d", "person"), ("e", "person")],
        "entity_name string, entity_type string",
    )
    # path a-b-c plus a hub h connected to a, c, d, e
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "h"), ("c", "h"), ("d", "h"), ("e", "h")],
        "src string, tgt string",
    )
    from lightrag_spark.operators.graphs import graph_metapaths

    out = {
        (r["type_a"], r["type_mid"], r["type_b"]): r["n_paths"]
        for r in graph_metapaths(nodes, edges).collect()
    }
    # through b: a-b-c -> (person, org, person) x1
    assert out[("person", "org", "person")] == 1
    # through h (deg 4): C(4,2)=6 person-event-person paths
    assert out[("person", "event", "person")] == 6
    # endpoint paths through a and c (deg-2 middles): b-a-h, b-c-h
    assert out[("event", "person", "org")] == 2
    # hub prune at max_degree=3 removes every path through h
    pruned = {
        (r["type_a"], r["type_mid"], r["type_b"]): r["n_paths"]
        for r in graph_metapaths(nodes, edges, max_degree=3).collect()
    }
    assert ("person", "event", "person") not in pruned
    assert pruned[("person", "org", "person")] == 1


def test_stratified_sample_exact_quotas_and_determinism(spark):
    rows = [(i, "s" + str(i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = dp.stratified_sample(df, frac=0.2).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # 10 docs per stratum -> exactly ceil(2.0) = 2 kept each
    assert {k: len(v) for k, v in by_src.items()} == {"s0": 2, "s1": 2, "s2": 2}
    assert all(r["n_group"] == 10 for r in out)
    # deterministic: a second run picks the identical ids
    again = {r["doc_id"] for r in dp.stratified_sample(df, frac=0.2).collect()}
    assert {r["doc_id"] for r in out} == again


def test_hourly_seasonality_lift(spark):
    rows = []
    # type 'a': 12 events at hour 3, 12 at hour 9 -> ratio 12*24/24 = 12
    for _ in range(12):
        rows.append((datetime.datetime(2024, 3, 1, 3, 5), "a"))
        rows.append((datetime.datetime(2024, 3, 1, 9, 5), "a"))
    # type b: 2 events in 2 distinct hours -> each hour lift 1*24/2 = 12
    rows.append((datetime.datetime(2024, 3, 1, 0, 0), "b"))
    rows.append((datetime.datetime(2024, 3, 1, 12, 0), "b"))
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {
        (r["event_type"], r["hour"]): r for r in dp.hourly_seasonality(ev).collect()
    }
    assert out[("a", 3)]["n"] == 12 and out[("a", 3)]["ratio"] == 12.0
    assert out[("b", 0)]["ratio"] == 12.0  # 1 * 24 / 2
    assert ("a", 4) not in out  # absent hours emit nothing
