"""Semantic-vector chunker V (functions/semantic_chunking.py) vs the
algorithm the reference pins (semantic_vector.py:122-196 mirrors LangChain
SemanticChunker; the package itself is absent from this container, so the
differential here is against numpy restatements of the pinned math plus
hand-computable groupings with a controlled embedder)."""

from __future__ import annotations

import numpy as np
import pytest

from lightrag_spark.functions import semantic_chunking as sc
from lightrag_spark.functions.tokenizer import get_tokenizer


def test_percentile_matches_numpy():
    rng = np.random.default_rng(7)
    for n in (1, 2, 5, 40):
        xs = rng.random(n).tolist()
        for pct in (25.0, 75.0, 95.0, 50.0):
            assert sc._percentile(xs, pct) == pytest.approx(
                float(np.percentile(xs, pct)), abs=1e-12
            )


def test_gradient_matches_numpy():
    rng = np.random.default_rng(8)
    for n in (2, 3, 7, 20):
        xs = rng.random(n).tolist()
        assert sc._gradient(xs) == pytest.approx(
            np.gradient(np.array(xs)).tolist(), abs=1e-12
        )


def test_threshold_types_match_numpy_formulas():
    rng = np.random.default_rng(9)
    ds = rng.random(30).tolist()
    arr = np.array(ds)
    t, b = sc.semantic_breakpoint_threshold(ds, "percentile")
    assert t == pytest.approx(float(np.percentile(arr, 95))) and b == ds
    t, _ = sc.semantic_breakpoint_threshold(ds, "standard_deviation")
    assert t == pytest.approx(float(arr.mean() + 3 * arr.std()))
    t, _ = sc.semantic_breakpoint_threshold(ds, "interquartile")
    iqr = float(np.percentile(arr, 75) - np.percentile(arr, 25))
    assert t == pytest.approx(float(arr.mean()) + 1.5 * iqr)
    t, b = sc.semantic_breakpoint_threshold(ds, "gradient")
    grad = np.gradient(arr)
    assert t == pytest.approx(float(np.percentile(grad, 95)))
    assert b == pytest.approx(grad.tolist())
    with pytest.raises(ValueError):
        sc.semantic_breakpoint_threshold(ds, "nope")


def _controlled_embed(texts):
    """Two topic clusters: sentences containing 'cat' embed to e1,
    everything else to e2 — breakpoint must land exactly at the topic
    switch."""
    out = []
    for t in texts:
        out.append([1.0, 0.0] if "cat" in t else [0.0, 1.0])
    return out


def test_grouping_breaks_at_topic_switch():
    text = "cat one. cat two. cat three. dog four. dog five."
    groups = sc.semantic_groups_with_spans(
        text, _controlled_embed, breakpoint_threshold_type="percentile",
        breakpoint_threshold_amount=50.0, buffer_size=0,
    )
    # distances: cat-cat=0, cat-cat=0, cat-dog=1, dog-dog=0 -> threshold
    # (50th pct of [0,0,1,0]) = 0 -> single breakpoint after sentence 3
    assert [g[0] for g in groups] == [
        "cat one. cat two. cat three.",
        "dog four. dog five.",
    ]
    # spans reconstruct the text exactly
    for g, start, end in groups:
        assert text[start:end] == g


def test_grouping_single_sentence_and_gradient_two():
    assert sc.semantic_groups_with_spans("just one sentence", _controlled_embed) == [
        ("just one sentence", 0, 17)
    ]
    got = sc.semantic_groups_with_spans(
        "cat a. dog b.", _controlled_embed, breakpoint_threshold_type="gradient"
    )
    assert [g[0] for g in got] == ["cat a.", "dog b."]


def test_min_chunk_size_merges_forward():
    text = "cat one. dog a. dog b."
    # breakpoint after sentence 1, but group "cat one." is < min_chunk_size
    # characters -> skipped, everything merges into one group
    groups = sc.semantic_groups_with_spans(
        text, _controlled_embed, breakpoint_threshold_amount=50.0,
        buffer_size=0, min_chunk_size=20,
    )
    assert [g[0] for g in groups] == [text]


def test_oversized_groups_resplit_and_lose_spans():
    tok = get_tokenizer("whitespace")
    text = "cat " * 50 + "one. dog " + "dog " * 50 + "two."
    chunks = sc.chunk_text_semantic(tok, text, chunk_token_size=30,
                                    chunk_overlap_token_size=4)
    assert len(chunks) > 2
    assert all(c["tokens"] <= 30 for c in chunks)
    assert all("_source_span" not in c for c in chunks)  # all groups oversized
    assert [c["chunk_order_index"] for c in chunks] == list(range(len(chunks)))


def test_intact_groups_keep_exact_spans():
    tok = get_tokenizer("whitespace")
    text = "cat one. cat two. dog three. dog four."
    chunks = sc.chunk_text_semantic(
        tok, text, chunk_token_size=100,
        embed_fn=_controlled_embed,
        breakpoint_threshold_amount=50.0, buffer_size=0,
    )
    assert len(chunks) == 2
    for c in chunks:
        span = c["_source_span"]
        assert text[span["start"]:span["end"]] == c["content"]
        assert c["tokens"] == tok.count(c["content"])


def test_chunk_documents_semantic_strategy(spark):
    from lightrag_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [
            {
                "doc_id": "d1",
                "text": "alpha beta. alpha gamma. " * 12,
                "file_path": "f",
                "doc_order": 0,
            }
        ]
    )
    out = chunk_documents(
        docs, tokenizer_kind="whitespace", chunk_token_size=16,
        chunk_overlap_token_size=2, strategy="V",
    ).collect()
    assert len(out) >= 1
    assert all(r.tokens <= 16 for r in out)
    assert all(r.chunk_id.startswith("d1-chunk-") for r in out)
    with pytest.raises(ValueError):
        chunk_documents(docs, strategy="X")


def test_semantic_breakpoint_table_matches_local_math(spark):
    """The distributed breakpoint table equals a single-threaded replay of
    the same functions over the same groups."""
    from lightrag_spark.functions.semantic_chunking import (
        _cosine_distance,
        semantic_breakpoint_threshold,
    )
    from lightrag_spark.operators.chunking import semantic_breakpoint_table

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        (r.group_id, r.vec_id): (r.sent_idx, r.dist_next, r.chunk_idx)
        for r in semantic_breakpoint_table(emb, group_size=10).collect()
    }
    rows = sorted(
        (r.vec_id, [float(x) for x in r.embedding]) for r in emb.collect()
    )
    groups: dict = {}
    for vid, v in rows:
        groups.setdefault(vid // 10, []).append((vid, v))
    want = {}
    for gid, members in groups.items():
        vecs = [v for _, v in members]
        dists = [_cosine_distance(vecs[i], vecs[i + 1]) for i in range(len(vecs) - 1)]
        thr, arr = semantic_breakpoint_threshold(dists, "percentile")
        acc = 0
        for i, (vid, _) in enumerate(members):
            dn = round(dists[i], 4) if i < len(dists) else None
            want[(gid, vid)] = (i, dn, acc)
            if i < len(arr) and arr[i] > thr:
                acc += 1
    assert got == want
