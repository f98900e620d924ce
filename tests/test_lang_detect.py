"""detect_language: correct predictions on genuine multilingual snippets
(the synthetic corpus's lang column is random metadata over English-ish
text, so the oracle gate checks determinism; THIS test checks quality)."""

from __future__ import annotations

from lightrag_spark.operators.datapipe import detect_language

SNIPPETS = [
    ("d-en", "the quick brown fox jumped over the lazy dog and ran off with the bone", "en"),
    ("d-de", "der schnelle braune fuchs sprang über den faulen hund und das war nicht gut", "de"),
    ("d-fr", "le renard brun rapide saute dans le jardin pour chercher les poules avec ruse", "fr"),
    ("d-es", "el zorro marrón salta por encima del perro para buscar las gallinas como siempre", "es"),
    ("d-zh", "敏捷的棕色狐狸跳过了懒惰的狗然后跑走了", "zh"),
    ("d-ru", "быстрая коричневая лиса перепрыгнула через ленивую собаку", "ru"),
    ("d-und", "zzzz qqqq kkkk wwww", "und"),
    ("d-empty", "", "und"),
]


def test_detects_real_languages(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in SNIPPETS], "doc_id string, text string"
    )
    got = {r.doc_id: r.detected_lang for r in detect_language(docs).collect()}
    for doc_id, _, want in SNIPPETS:
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_mixed_script_thresholds(spark):
    # mostly latin with a couple of CJK chars -> stays latin-vote
    docs = spark.createDataFrame(
        [("m1", "the cat sat on the mat 猫 and the dog too")],
        "doc_id string, text string",
    )
    got = detect_language(docs).collect()[0]
    assert got.detected_lang == "en"


def test_deterministic_tiebreak(spark):
    # one hit each for de ('der') and en ('the') -> tie -> smallest code
    docs = spark.createDataFrame(
        [("t1", "der the zebra")], "doc_id string, text string"
    )
    assert detect_language(docs).collect()[0].detected_lang == "de"
