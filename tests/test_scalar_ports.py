"""Differentials for the round-2 scalar ports: truncate_list_by_token_size,
subtract_source_ids, relation chunk keys — each vs the reference's own
function (pure Python, no Spark)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lightrag_spark.functions.chunk_ids import (
    make_relation_chunk_key,
    parse_relation_chunk_key,
    subtract_source_ids,
)
from lightrag_spark.functions.tokenizer import (
    get_tokenizer,
    truncate_list_by_token_size,
)


def _ref():
    from refshim import load_reference

    pkg = load_reference()
    assert pkg is not None
    return pkg


IDS = st.lists(st.sampled_from(["", "a", "b", "c", "d", "e"]), max_size=10)


@settings(max_examples=200, deadline=None)
@given(ids=IDS, rem=st.lists(st.sampled_from(["a", "b", "x"]), max_size=4))
def test_subtract_source_ids_matches_reference(ids, rem):
    ref = _ref().utils.subtract_source_ids
    assert subtract_source_ids(ids, rem) == ref(ids, rem)


def test_relation_chunk_keys_match_reference():
    ref = _ref().utils
    for src, tgt in [("b", "a"), ("a", "b"), ("x", "x"), ("中", "a")]:
        k = make_relation_chunk_key(src, tgt)
        assert k == ref.make_relation_chunk_key(src, tgt)
        assert parse_relation_chunk_key(k) == ref.parse_relation_chunk_key(k)
    with pytest.raises(ValueError):
        parse_relation_chunk_key("no-separator")


WORDS = st.lists(
    st.text(alphabet="abcdef ", min_size=0, max_size=20), min_size=0, max_size=8
)


@settings(max_examples=150, deadline=None)
@given(items=WORDS, budget=st.integers(min_value=0, max_value=40))
def test_truncate_list_matches_reference_semantics(items, budget):
    """The reference's truncate_list_by_token_size needs its Tokenizer class
    (truncate_by_token_limit with span returns); instead of invoking it with
    a shimmed tokenizer, assert the CONTRACT it documents: whole items only,
    separator counted, kept prefix verifiably fits, maximal K."""
    tok = get_tokenizer("regex")
    sep = "\n"
    out = truncate_list_by_token_size(items, lambda x: x, sep, budget, tok)
    k = len(out)
    assert out == items[:k]
    if k > 0:
        assert tok.count(sep.join(items[:k])) <= budget
    if k < len(items):
        # maximality: keeping one more item would bust the budget
        assert tok.count(sep.join(items[: k + 1])) > budget or budget <= 0


def test_truncate_list_examples():
    tok = get_tokenizer("whitespace")
    items = ["one two", "three four", "five"]
    # whitespace tokens of "one two\nthree four" -> joined text "one two
    # three four" = 4 tokens; budget 4 keeps exactly 2 items
    assert truncate_list_by_token_size(items, lambda x: x, "\n", 4, tok) == items[:2]
    assert truncate_list_by_token_size(items, lambda x: x, "\n", 0, tok) == []
    assert truncate_list_by_token_size([], lambda x: x, "\n", 10, tok) == []
    assert truncate_list_by_token_size(items, lambda x: x, "\n", 100, tok) == items
