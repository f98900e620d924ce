"""Pairwise two-system win-rate evaluation (reference: reproduce/batch_eval.py).

The reference builds one judge request per (question, answer1, answer2)
triple with a fixed criteria prompt and ships them to the OpenAI batch API
(batch_eval.py:25-95).  Here the same prompt strings (verbatim, including
the reference's indentation — they are part of the judging contract) wrap a
PLUGGABLE ``judge_fn(user_prompt, system_prompt) -> str`` that returns the
judge's JSON verdict, applied over the cases DataFrame with mapInPandas;
win rates per criterion are then one small aggregation.

The verdict parse is tolerant the same way the extraction parsers are:
code fences stripped, first {...} object taken, "Answer 1"/"Answer 2"
winners matched case-insensitively; unparseable verdicts count as neither.
"""

from __future__ import annotations

import json
import re
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

PAIRWISE_CRITERIA = ["Comprehensiveness", "Diversity", "Empowerment", "Overall Winner"]

# batch_eval.py:27-29 — verbatim.
_SYS_PROMPT = """
        ---Role---
        You are an expert tasked with evaluating two answers to the same question based on three criteria: **Comprehensiveness**, **Diversity**, and **Empowerment**.
        """


def pairwise_sys_prompt() -> str:
    return _SYS_PROMPT


def build_pairwise_prompt(query: str, answer1: str, answer2: str) -> str:
    """batch_eval.py:30-73 — verbatim template, same substitutions."""
    return f"""
        You will evaluate two answers to the same question based on three criteria: **Comprehensiveness**, **Diversity**, and **Empowerment**.

        - **Comprehensiveness**: How much detail does the answer provide to cover all aspects and details of the question?
        - **Diversity**: How varied and rich is the answer in providing different perspectives and insights on the question?
        - **Empowerment**: How well does the answer help the reader understand and make informed judgments about the topic?

        For each criterion, choose the better answer (either Answer 1 or Answer 2) and explain why. Then, select an overall winner based on these three categories.

        Here is the question:
        {query}

        Here are the two answers:

        **Answer 1:**
        {answer1}

        **Answer 2:**
        {answer2}

        Evaluate both answers using the three criteria listed above and provide detailed explanations for each criterion.

        Output your evaluation in the following JSON format:

        {{
            "Comprehensiveness": {{
                "Winner": "[Answer 1 or Answer 2]",
                "Explanation": "[Provide explanation here]"
            }},
            "Diversity": {{
                "Winner": "[Answer 1 or Answer 2]",
                "Explanation": "[Provide explanation here]"
            }},
            "Empowerment": {{
                "Winner": "[Answer 1 or Answer 2]",
                "Explanation": "[Provide explanation here]"
            }},
            "Overall Winner": {{
                "Winner": "[Answer 1 or Answer 2]",
                "Explanation": "[Summarize why this answer is the overall winner based on the three criteria]"
            }}
        }}
        """


def parse_verdict(raw: str) -> dict:
    """{criterion: '1' | '2' | None} from a judge response."""
    out = {c: None for c in PAIRWISE_CRITERIA}
    if not raw:
        return out
    s = re.sub(r"```(?:json)?", "", raw).strip("` \n")
    m = re.search(r"\{.*\}", s, re.DOTALL)
    if not m:
        return out
    try:
        doc = json.loads(m.group(0))
    except (ValueError, TypeError):
        return out
    if not isinstance(doc, dict):
        return out
    for crit in PAIRWISE_CRITERIA:
        entry = doc.get(crit)
        if isinstance(entry, dict):
            winner = str(entry.get("Winner", ""))
        else:
            winner = str(entry or "")
        mm = re.search(r"answer\s*([12])", winner, re.IGNORECASE)
        out[crit] = mm.group(1) if mm else None
    return out


def judge_pairs(
    cases: DataFrame, judge_fn: Callable[[str, str], str]
) -> DataFrame:
    """cases: (question, answer1, answer2) -> + one winner column per
    criterion ('1'/'2'/null)."""
    cols = [f.name for f in cases.schema.fields]
    out_schema = StructType(
        list(cases.schema.fields)
        + [StructField(f"winner_{c.lower().replace(' ', '_')}", StringType()) for c in PAIRWISE_CRITERIA]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for q, a1, a2 in zip(pdf["question"], pdf["answer1"], pdf["answer2"]):
                verdict = parse_verdict(
                    judge_fn(build_pairwise_prompt(q, a1, a2), _SYS_PROMPT)
                )
                rows.append(tuple(verdict[c] for c in PAIRWISE_CRITERIA))
            res = pd.DataFrame(
                rows,
                columns=[f"winner_{c.lower().replace(' ', '_')}" for c in PAIRWISE_CRITERIA],
                index=pdf.index,
            )
            yield pd.concat([pdf, res], axis=1)

    return cases.select(*cols).mapInPandas(run, out_schema)


def win_rates(judged: DataFrame) -> DataFrame:
    """One row per criterion: wins for each side + rates over decided
    verdicts (undecided excluded from the denominator)."""
    pieces = []
    for c in PAIRWISE_CRITERIA:
        col = f"winner_{c.lower().replace(' ', '_')}"
        pieces.append(
            judged.agg(
                F.lit(c).alias("criterion"),
                F.sum((F.col(col) == "1").cast("int")).alias("wins_1"),
                F.sum((F.col(col) == "2").cast("int")).alias("wins_2"),
                F.sum(F.col(col).isNull().cast("int")).alias("undecided"),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    decided = F.col("wins_1") + F.col("wins_2")
    return out.withColumn(
        "win_rate_1",
        F.when(decided > 0, F.col("wins_1") / decided).otherwise(F.lit(None)),
    )
