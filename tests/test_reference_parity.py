"""Differential parity tests: our pure functions vs the reference package.

These are the strongest correctness evidence in the suite: the reference
implementation itself (imported read-only) is the oracle for text
normalization, delimiter repair, extraction parsing and token-window
chunking.  Triple-level P/R vs the reference parser is computed explicitly
at the end (north rule: P/R >= 0.95; we assert 1.0).
"""

from __future__ import annotations

import asyncio

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lightrag_spark.functions.extraction_parser import parse_extraction_result
from lightrag_spark.functions.hashing import compute_args_hash
from lightrag_spark.functions.mock_llm import MockExtractorModel
from lightrag_spark.functions.textnorm import (
    fix_tuple_delimiter_corruption,
    normalize_entity_name,
    normalize_extracted_info,
    sanitize_text_for_encoding,
    split_string_by_multi_markers,
)
from refshim import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference package unavailable")

TEXTS = [
    "",
    "   ",
    "hello world",
    ' "United States" ',
    "'single'",
    "«odd» “中 文 字” text",
    "ＦＵＬＬｗｉｄｔｈ１２３",
    "a&amp;b &lt;tag&gt; &#65;",
    "ctrl\x07chars\x1fhere\tkeep\nnewline",
    "《书名》",
    "12",
    "1.2.3",
    "123456",
    "中文 abc 中文",
    "<p>para</p><br>line",
    "　full width space　",
    "desc with surrogate \ud800 half",
    "nbsp and nnbsp",
    "“国家”的'引号'",
    "multi\n\nline\ntext",
]


@pytest.mark.parametrize("text", TEXTS)
def test_sanitize_parity(text):
    import lightrag.utils as ru

    assert sanitize_text_for_encoding(text) == ru.sanitize_text_for_encoding(text)


@pytest.mark.parametrize("text", TEXTS)
@pytest.mark.parametrize("riq", [False, True])
def test_normalize_parity(text, riq):
    import lightrag.utils as ru

    safe = sanitize_text_for_encoding(text)
    if not safe:
        return
    assert normalize_extracted_info(safe, remove_inner_quotes=riq) == ru.normalize_extracted_info(
        safe, remove_inner_quotes=riq
    )


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_sanitize_parity_fuzz(text):
    import lightrag.utils as ru

    assert sanitize_text_for_encoding(text) == ru.sanitize_text_for_encoding(text)


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_normalize_entity_name_fuzz(text):
    import lightrag.utils as ru

    assert normalize_entity_name(text) == ru.normalize_entity_name(text)


CORRUPT = [
    "entity<|##|>A<|#|>concept<|#|>d",
    "entity<#>A<#>concept<#>d",
    "entity<|#>B<|#|>concept<|#|>d",
    "entity<#|>C<#|>concept<#|>d",
    "entity<X|#|>D<|#|Y>concept<|#|>d",
    "entity||#||E<|#|>concept<|#|>d",
    "entity|#|>F<|#|>concept<|#|>d",
    "entity<|#|G<|#|>concept<|#|>d",
    "entity<|#:H<|#|>concept<|#|>d",
    "entity<||#>I<|#|>concept<|#|>d",
    "relation<|\\#|>a<|#|>b<|#|>k<|#|>d",
    "free text with a <|> b spaced",
    "glued<|>pair",
    "x <|| y free",
    "glued<||tail",
]


@pytest.mark.parametrize("record", CORRUPT)
def test_fix_delimiter_parity(record):
    import lightrag.utils as ru

    assert fix_tuple_delimiter_corruption(record, "#", "<|#|>") == ru.fix_tuple_delimiter_corruption(
        record, "#", "<|#|>"
    )


@given(st.text(alphabet="<|#>XY abent", max_size=60))
@settings(max_examples=300, deadline=None)
def test_fix_delimiter_parity_fuzz(record):
    import lightrag.utils as ru

    assert fix_tuple_delimiter_corruption(record, "#", "<|#|>") == ru.fix_tuple_delimiter_corruption(
        record, "#", "<|#|>"
    )


def test_split_multi_markers_parity():
    import lightrag.utils as ru

    cases = [
        ("a<|#|>b\nc", ["<|#|>", "\n"]),
        ("  x  ", ["|"]),
        ("", ["\n"]),
        ("a<|COMPLETE|>b", ["<|COMPLETE|>"]),
    ]
    for content, markers in cases:
        assert split_string_by_multi_markers(content, markers) == ru.split_string_by_multi_markers(
            content, markers
        )


def test_compute_args_hash_parity():
    import lightrag.utils as ru

    assert compute_args_hash("abc") == ru.compute_args_hash("abc")
    assert compute_args_hash("abc", "x") == ru.compute_args_hash("abc", "x")
    assert compute_args_hash("ab", "cx") != compute_args_hash("abc", "x")


# ---------------------------------------------------------------------------
# Extraction parser parity (the P/R-defining function)
# ---------------------------------------------------------------------------

RESPONSES = [
    # well-formed
    "entity<|#|>Alpha Corp<|#|>organization<|#|>A company<|COMPLETE|>",
    "relation<|#|>Alpha Corp<|#|>Beta Inc<|#|>owns, controls<|#|>Alpha owns Beta<|COMPLETE|>",
    # relationship prefix variant
    "relationship<|#|>A1<|#|>B1<|#|>k<|#|>d\n<|COMPLETE|>",
    # glued records on one line
    "entity<|#|>One<|#|>concept<|#|>d1<|#|>entity<|#|>Two<|#|>concept<|#|>d2<|COMPLETE|>",
    "entity<|#|>One<|#|>concept<|#|>d1<|#|>relation<|#|>One<|#|>Two<|#|>k<|#|>d<|COMPLETE|>",
    # mis-prefixed relation (5 fields, entity prefix)
    "entity<|#|>SrcE<|#|>TgtE<|#|>kw<|#|>desc<|COMPLETE|>",
    # corruption shapes
    "entity<|##|>Corrupt1<|#|>concept<|#|>d<|COMPLETE|>",
    "entity<#>Corrupt2<#>concept<#>d<|COMPLETE|>",
    # self-loop dropped
    "relation<|#|>Same<|#|>Same<|#|>k<|#|>d<|COMPLETE|>",
    # invalid type chars
    "entity<|#|>Bad<|#|>con(cept)<|#|>d<|COMPLETE|>",
    # comma type
    "entity<|#|>Multi<|#|>person, organization<|#|>d<|COMPLETE|>",
    # empty description
    "entity<|#|>NoDesc<|#|>concept<|#|><|COMPLETE|>",
    # numeric-name filtering
    "entity<|#|>12<|#|>concept<|#|>d<|COMPLETE|>",
    "entity<|#|>1.2.3<|#|>concept<|#|>d<|COMPLETE|>",
    # missing completion delimiter
    "entity<|#|>Tail<|#|>concept<|#|>d",
    # lowercase completion delimiter
    "entity<|#|>Low<|#|>concept<|#|>d<|complete|>",
]


def _ref_parse(response: str, chunk_key: str = "chunk-1", ts: int = 7, fp: str = "f"):
    import lightrag.operate as ro

    return asyncio.run(
        ro._process_extraction_result(
            response, chunk_key, ts, fp, tuple_delimiter="<|#|>", completion_delimiter="<|COMPLETE|>"
        )
    )


def _as_comparable(nodes, edges):
    n = {
        k: [tuple(sorted(r.items())) for r in v] for k, v in nodes.items()
    }
    e = {
        tuple(k): [tuple(sorted(r.items())) for r in v] for k, v in edges.items()
    }
    return n, e


@pytest.mark.parametrize("response", RESPONSES)
def test_parser_parity(response):
    ours = parse_extraction_result(response, "chunk-1", 7, "f")
    theirs = _ref_parse(response)
    assert _as_comparable(*ours) == _as_comparable(*theirs)


def test_parser_parity_on_mock_corpus_pr():
    """Triple-level P/R of our parser vs the reference parser over the mock
    extractor's output (clean + corrupted).  North rule asks >=0.95; the
    shared-parser design yields exactly 1.0."""
    texts = [
        f"alpha{i} beta{i} gamma{i} delta common market {('united_states ' * (i % 4))}energy"
        for i in range(40)
    ]
    ours_pairs, ref_pairs = set(), set()
    for corruption in (False, True):
        model = MockExtractorModel(corruption=corruption)
        for i, text in enumerate(texts):
            for p in (0, 1):
                resp = model.respond(text, p)
                key = f"c{i}"
                on, oe = parse_extraction_result(resp, key, 7, "f")
                rn, re_ = _ref_parse(resp, key)
                assert _as_comparable(on, oe) == _as_comparable(rn, re_)
                ours_pairs.update((key, s, t) for (s, t) in oe)
                ref_pairs.update((key, *k) for k in re_.keys())
    tp = len(ours_pairs & ref_pairs)
    precision = tp / max(1, len(ours_pairs))
    recall = tp / max(1, len(ref_pairs))
    assert precision == 1.0 and recall == 1.0


# ---------------------------------------------------------------------------
# Chunker parity
# ---------------------------------------------------------------------------


def test_chunker_parity_against_reference():
    from lightrag.chunker.token_size import chunking_by_token_size

    from lightrag_spark.functions.chunking_core import chunk_text_by_tokens
    from lightrag_spark.functions.tokenizer import RegexTokenizer

    tok = RegexTokenizer()
    texts = [
        "word " * 500,
        "one two three",
        "",
        "a. b! c? " * 300,
        "line one\nline two\n" * 200,
    ]
    for text in texts:
        for size, overlap in [(1200, 100), (64, 8), (16, 4)]:
            ours = chunk_text_by_tokens(
                tok, text, chunk_overlap_token_size=overlap, chunk_token_size=size
            )
            theirs = chunking_by_token_size(
                tok, text, chunk_overlap_token_size=overlap, chunk_token_size=size
            )
            assert ours == theirs


def test_chunker_split_by_character_parity():
    from lightrag.chunker.token_size import chunking_by_token_size

    from lightrag_spark.functions.chunking_core import chunk_text_by_tokens
    from lightrag_spark.functions.tokenizer import RegexTokenizer

    tok = RegexTokenizer()
    text = ("para one words here. " * 30 + "\n\n") * 5 + "tail paragraph"
    ours = chunk_text_by_tokens(
        tok, text, split_by_character="\n\n", chunk_overlap_token_size=4, chunk_token_size=32
    )
    theirs = chunking_by_token_size(
        tok, text, split_by_character="\n\n", chunk_overlap_token_size=4, chunk_token_size=32
    )
    assert ours == theirs


def test_chunker_overlap_validation():
    from lightrag_spark.functions.chunking_core import chunk_text_by_tokens
    from lightrag_spark.functions.tokenizer import RegexTokenizer

    with pytest.raises(ValueError):
        chunk_text_by_tokens(
            RegexTokenizer(), "some text", chunk_overlap_token_size=10, chunk_token_size=10
        )
