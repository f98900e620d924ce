"""PII redaction (operators/pii.py): detector coverage, the fixed-order
overlap contract (card digits never double-counted as phone), placeholder
rewrites, and clean-text passthrough."""

from __future__ import annotations

from lightrag_spark.operators.pii import redact_pii


def _run(spark, texts):
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    return {r["doc_id"]: r for r in redact_pii(df).collect()}


def test_each_detector(spark):
    rows = _run(
        spark,
        [
            "mail me at jane.doe+spam@example.co.uk today",
            "ssn is 123-45-6789 ok",
            "card 4111 1111 1111 1111 and also 4222222222222222",
            "server at 192.168.0.1 responded",
            "call +1 (555) 123-4567 or 555.987.6543",
            "perfectly clean text with numbers 42 and 2024",
        ],
    )
    assert rows["d0"]["n_email"] == 1 and "[EMAIL]" in rows["d0"]["text"]
    assert "jane" not in rows["d0"]["text"]
    assert rows["d1"]["n_ssn"] == 1 and "[SSN]" in rows["d1"]["text"]
    assert rows["d2"]["n_card"] == 2 and rows["d2"]["text"].count("[CARD]") == 2
    assert rows["d2"]["n_phone"] == 0  # card digits not re-matched as phone
    assert rows["d3"]["n_ipv4"] == 1 and "[IP]" in rows["d3"]["text"]
    assert rows["d4"]["n_phone"] == 2
    assert rows["d5"]["n_pii"] == 0
    assert rows["d5"]["text"] == "perfectly clean text with numbers 42 and 2024"


def test_order_contract_and_total(spark):
    # one doc with several kinds; total = sum of per-kind counts
    rows = _run(
        spark,
        ["a@b.io then 10.0.0.1 then 555-123-4567 and ssn 321-54-9876"],
    )
    r = rows["d0"]
    assert (r["n_email"], r["n_ssn"], r["n_ipv4"], r["n_phone"]) == (1, 1, 1, 1)
    assert r["n_pii"] == 4
    for tag in ("[EMAIL]", "[IP]", "[PHONE]", "[SSN]"):
        assert tag in r["text"]

    # ssn-shaped digits consumed by the SSN stage are NOT phone matches
    rows2 = _run(spark, ["only 123-45-6789 here"])
    assert rows2["d0"]["n_phone"] == 0
