"""Differential tests: the paired-text metric operators (BLEU-2, ROUGE-2,
chrF) vs independent pure-Python reference implementations over seeded
random pairs — one Spark job per metric, every pair compared at the
operator's 4dp grain.  This is the metric-family analogue of the oracle
gate: a second implementation nobody shares code with."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

N_PAIRS = 60
VOCAB = ["a", "b", "c", "dd", "eee", "x1", "y2", "spark", "kg", "web"]


def _pairs(seed=421):
    rng = random.Random(seed)
    rows = []
    for i in range(N_PAIRS):
        cand = [rng.choice(VOCAB) for _ in range(rng.randint(0, 12))]
        if rng.random() < 0.3:
            ref = list(cand)  # identity family
            if ref and rng.random() < 0.5:
                ref = ref[: max(1, len(ref) - 2)]
        else:
            ref = [rng.choice(VOCAB) for _ in range(rng.randint(0, 12))]
        rows.append((i, i, cand, ref))
    return rows


def _clipped(c_grams, r_grams):
    tc, tr = Counter(c_grams), Counter(r_grams)
    return sum(min(n, tr[g]) for g, n in tc.items())


def _bigrams(t):
    return [f"{t[i]} {t[i + 1]}" for i in range(len(t) - 1)]


def _py_bleu2(cand, ref):
    cl, rl = len(cand), len(ref)
    p1 = _clipped(cand, ref) / cl if cl else 0.0
    cb = max(cl - 1, 0)
    p2 = _clipped(_bigrams(cand), _bigrams(ref)) / cb if cb else 0.0
    if cl == 0:
        bp = 0.0
    elif cl > rl:
        bp = 1.0
    else:
        bp = math.exp(1.0 - rl / cl)
    bleu = bp * math.sqrt(p1 * p2) if p1 > 0 and p2 > 0 else 0.0
    return p1, p2, bp, bleu


def _py_rouge2(cand, ref):
    cb, rb = max(len(cand) - 1, 0), max(len(ref) - 1, 0)
    ov = _clipped(_bigrams(cand), _bigrams(ref))
    p = ov / cb if cb else 0.0
    r = ov / rb if rb else 0.0
    f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return ov, p, r, f


def _py_chrf(cand_text, ref_text, max_order=3, beta=2.0):
    sc = "".join(cand_text.split())
    sr = "".join(ref_text.split())
    ps, rs = [], []
    for n in range(1, max_order + 1):
        cg = [sc[i : i + n] for i in range(len(sc) - n + 1)]
        rg = [sr[i : i + n] for i in range(len(sr) - n + 1)]
        clip = _clipped(cg, rg)
        ps.append(clip / len(cg) if cg else 0.0)
        rs.append(clip / len(rg) if rg else 0.0)
    p = sum(ps) / max_order
    r = sum(rs) / max_order
    b2 = beta * beta
    f = (1 + b2) * p * r / (b2 * p + r) if (b2 * p + r) > 0 else 0.0
    return p, r, f


def test_bleu2_matches_python_reference(spark):
    from lightrag_spark.evaluation.bleu import bleu2_pairs

    rows = _pairs()
    df = spark.createDataFrame(
        rows,
        "cand_id long, ref_id long, cand_tokens array<string>, "
        "ref_tokens array<string>",
    )
    got = {r["cand_id"]: r for r in bleu2_pairs(df).collect()}
    for i, _, cand, ref in rows:
        p1, p2, bp, bleu = _py_bleu2(cand, ref)
        g = got[i]
        assert g["p1"] == pytest.approx(p1, abs=1e-4), (i, cand, ref)
        assert g["p2"] == pytest.approx(p2, abs=1e-4), (i, cand, ref)
        assert g["bp"] == pytest.approx(bp, abs=1e-4), (i, cand, ref)
        assert g["bleu"] == pytest.approx(bleu, abs=1e-4), (i, cand, ref)


def test_rouge2_matches_python_reference(spark):
    from lightrag_spark.evaluation.rouge import rouge2_pairs

    rows = _pairs(seed=777)
    df = spark.createDataFrame(
        rows,
        "cand_id long, ref_id long, cand_tokens array<string>, "
        "ref_tokens array<string>",
    )
    got = {r["cand_id"]: r for r in rouge2_pairs(df).collect()}
    for i, _, cand, ref in rows:
        ov, p, r, f = _py_rouge2(cand, ref)
        g = got[i]
        assert g["overlap"] == ov, (i, cand, ref)
        assert g["p2"] == pytest.approx(p, abs=1e-4), (i, cand, ref)
        assert g["r2"] == pytest.approx(r, abs=1e-4), (i, cand, ref)
        assert g["f2"] == pytest.approx(f, abs=1e-4), (i, cand, ref)


def test_chrf_matches_python_reference(spark):
    from lightrag_spark.evaluation.chrf import chrf_pairs

    rng = random.Random(99)
    rows = []
    for i in range(40):
        mk = lambda: " ".join(
            rng.choice(VOCAB) for _ in range(rng.randint(0, 8))
        )
        c = mk()
        r = c if rng.random() < 0.3 else mk()
        rows.append((i, i, c, r))
    df = spark.createDataFrame(
        rows, "cand_id long, ref_id long, cand_text string, ref_text string"
    )
    got = {r["cand_id"]: r for r in chrf_pairs(df).collect()}
    for i, _, c, r in rows:
        p, rr, f = _py_chrf(c, r)
        g = got[i]
        assert g["chrp"] == pytest.approx(p, abs=1e-4), (i, c, r)
        assert g["chrr"] == pytest.approx(rr, abs=1e-4), (i, c, r)
        assert g["chrf"] == pytest.approx(f, abs=1e-4), (i, c, r)
