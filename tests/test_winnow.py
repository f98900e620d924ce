"""Winnowing fingerprints — Arrow-kernel vs expression-path differential,
rightmost-tie selection, the k+w-1 coverage guarantee, short-doc cutoff."""

from __future__ import annotations

import hashlib

import pytest

from lightrag_spark.operators.datapipe import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)


def _fp(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(df, **kw).collect()
    }


_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "alpha beta gamma delta epsilon zeta eta theta"),
    (3, "too short"),  # < k+w-1 tokens: emits nothing
    (4, "x " * 30),    # degenerate all-equal hashes: rightmost-tie path
]


def test_arrow_matches_expression_path(spark):
    a = _fp(spark, _ROWS, use_arrow=True)
    e = _fp(spark, _ROWS, use_arrow=False)
    assert a == e and len(a) > 0


def test_short_doc_emits_nothing(spark):
    got = _fp(spark, [(3, "too short words here")], k=3, w=4)
    assert got == set()


def test_python_reference_winnow(spark):
    """Replay the algorithm in plain Python on one doc and require the
    identical (pos, fp) set."""
    text = _ROWS[0][1]
    toks = text.split()
    hs = [
        hashlib.md5(" ".join(toks[i : i + WINNOW_K]).encode()).hexdigest()
        for i in range(len(toks) - WINNOW_K + 1)
    ]
    exp = set()
    for i in range(len(hs) - WINNOW_W + 1):
        win = hs[i : i + WINNOW_W]
        v = min(win)
        exp.add((1, i + WINNOW_W - 1 - win[::-1].index(v), v))
    assert _fp(spark, [_ROWS[0]]) == exp


def test_all_equal_hashes_pick_rightmost(spark):
    """'x' * n: every k-gram hashes identically, so each window's
    rightmost element is selected — positions w-1, w, ..., one per
    window, all the same fp."""
    got = _fp(spark, [(4, ("x " * 10).strip())])
    n_grams = 10 - WINNOW_K + 1
    exp_pos = set(range(WINNOW_W - 1, n_grams))
    assert {p for _, p, _ in got} == exp_pos
    assert len({f for _, _, f in got}) == 1


def test_coverage_guarantee(spark):
    """Two docs sharing a (k+w-1)-token run must share >= 1 fingerprint
    hash — THE winnowing guarantee."""
    shared = "one two three four five six"  # k+w-1 = 6 tokens
    a = f"prefix tokens here {shared} tail a"
    b = f"{shared} completely different ending words"
    fps = _fp(spark, [(1, a), (2, b)])
    fa = {f for d, _, f in fps if d == 1}
    fb = {f for d, _, f in fps if d == 2}
    assert fa & fb


def test_param_validation(spark):
    with pytest.raises(ValueError):
        _fp(spark, _ROWS[:1], k=0)
