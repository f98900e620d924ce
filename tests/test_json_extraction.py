"""JSON-mode extraction parity + recovery tests.

Differential cases run against the reference's
``_process_json_extraction_result`` (json_repair is stubbed to identity in
refshim, so differential inputs are limited to shapes that parse without
repair: clean, fenced, prose-wrapped, trailing-brace, array-reject).
Repair shapes (trailing comma, single quotes, unquoted keys, truncation)
are asserted directly against expected recovered content.
"""

from __future__ import annotations

import asyncio

import pytest

from lightrag_spark.functions.json_extraction import (
    parse_json_extraction_result,
    tolerant_load_json_dict,
)
from refshim import load_reference

ref = load_reference()

CLEAN = (
    '{"entities": [{"name": "Alpha Corp", "type": "organization", "description": "A co"},'
    '{"name": "12", "type": "concept", "description": "dropped numeric"}],'
    '"relationships": [{"source": "Alpha Corp", "target": "Beta", "keywords": "owns, runs",'
    '"description": "Alpha owns Beta"},'
    '{"source": "Same", "target": "Same", "keywords": "k", "description": "self-loop"}]}'
)

DIFFERENTIAL = [
    CLEAN,
    "```json\n" + CLEAN + "\n```",
    "Here is the result: " + CLEAN,
    CLEAN + " trailing {brace} prose",
    '[{"entities": []}]',          # top-level array -> {}
    "no json at all",
    "",
    '{"entities": "not-a-list", "relationships": [{"source": "A", "target": "B", "keywords": "k", "description": "d"}]}',
]


def _as_comparable(nodes, edges):
    return (
        {k: [tuple(sorted(r.items())) for r in v] for k, v in nodes.items()},
        {tuple(k): [tuple(sorted(r.items())) for r in v] for k, v in edges.items()},
    )


@pytest.mark.skipif(ref is None, reason="reference unavailable")
@pytest.mark.parametrize("payload", DIFFERENTIAL)
def test_json_parity(payload):
    import lightrag.operate as ro

    ours = parse_json_extraction_result(payload, "c1", 7, "f")
    theirs = asyncio.run(ro._process_json_extraction_result(payload, "c1", 7, "f"))
    assert _as_comparable(*ours) == _as_comparable(*theirs)


def test_repair_trailing_comma():
    obj = tolerant_load_json_dict('{"a": 1, "b": [1, 2,],}')
    assert obj == {"a": 1, "b": [1, 2]}


def test_repair_single_quotes_and_bare_keys():
    assert tolerant_load_json_dict("{'a': 'x'}") == {"a": "x"}
    assert tolerant_load_json_dict('{a: 1}') == {"a": 1}


def test_repair_truncated():
    assert tolerant_load_json_dict('{"a": {"b": 1}') == {"a": {"b": 1}}


def test_array_rejected_even_with_prose():
    assert tolerant_load_json_dict('Here: [{"a": 1}]') == {}


def test_validation_matches_text_mode():
    nodes, edges = parse_json_extraction_result(CLEAN, "c1", 7, "f")
    assert list(nodes) == ["Alpha Corp"]          # "12" dropped (numeric filter)
    assert list(edges) == [("Alpha Corp", "Beta")]  # self-loop dropped
    rec = edges[("Alpha Corp", "Beta")][0]
    assert rec["keywords"] == "owns, runs"
    assert rec["weight"] == 1.0
