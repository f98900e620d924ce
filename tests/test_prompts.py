"""Prompt-template parity: every ported template byte-matches the reference
package's PROMPTS dict, and the rendered extraction/summary/keywords prompts
byte-match a re-render performed with the REFERENCE's own template objects
and the reference's assembly recipe (lightrag/operate.py:3715-3830, 556-580,
4608) on identical inputs."""

from __future__ import annotations

import json

import pytest

from lightrag_spark import prompts as P
from refshim import load_reference

ref = load_reference()
REF_PROMPTS = None
if ref is not None:
    from lightrag.prompt import PROMPTS as REF_PROMPTS  # noqa: E402

pytestmark = pytest.mark.skipif(
    REF_PROMPTS is None, reason="reference package unavailable"
)

PORTED_KEYS = [
    "DEFAULT_TUPLE_DELIMITER",
    "DEFAULT_COMPLETION_DELIMITER",
    "default_entity_types_guidance",
    "entity_extraction_section_context",
    "entity_extraction_system_prompt",
    "entity_extraction_user_prompt",
    "entity_continue_extraction_user_prompt",
    "entity_extraction_examples",
    "entity_extraction_json_system_prompt",
    "entity_extraction_json_user_prompt",
    "entity_continue_extraction_json_user_prompt",
    "entity_extraction_json_examples",
    "summarize_entity_descriptions",
    "fail_response",
    "rag_response",
    "naive_rag_response",
    "kg_query_context",
    "naive_query_context",
    "keywords_extraction",
    "keywords_extraction_examples",
]


def test_every_template_is_byte_identical():
    for k in PORTED_KEYS:
        assert P.PROMPTS[k] == REF_PROMPTS[k], f"template drift: {k}"


def _ref_render_extraction(content, heading_path, language, use_json,
                           max_total_records, max_entity_records):
    """The reference's own assembly (operate.py:3715-3830), executed against
    the reference's PROMPTS objects."""
    guidance = REF_PROMPTS["default_entity_types_guidance"].rstrip()
    if use_json:
        examples = "\n".join(
            e.rstrip() for e in REF_PROMPTS["entity_extraction_json_examples"]
        )
        context_base = dict(
            entity_types_guidance=guidance,
            examples=examples,
            language=language,
            max_total_records=max_total_records,
            max_entity_records=max_entity_records,
        )
        sys_t = REF_PROMPTS["entity_extraction_json_system_prompt"]
        usr_t = REF_PROMPTS["entity_extraction_json_user_prompt"]
        cont_t = REF_PROMPTS["entity_continue_extraction_json_user_prompt"]
    else:
        examples = "\n".join(
            e.rstrip() for e in REF_PROMPTS["entity_extraction_examples"]
        )
        examples = examples.format(
            tuple_delimiter=REF_PROMPTS["DEFAULT_TUPLE_DELIMITER"],
            completion_delimiter=REF_PROMPTS["DEFAULT_COMPLETION_DELIMITER"],
            entity_types_guidance=guidance,
            language=language,
        )
        context_base = dict(
            tuple_delimiter=REF_PROMPTS["DEFAULT_TUPLE_DELIMITER"],
            completion_delimiter=REF_PROMPTS["DEFAULT_COMPLETION_DELIMITER"],
            entity_types_guidance=guidance,
            examples=examples,
            language=language,
            max_total_records=max_total_records,
            max_entity_records=max_entity_records,
        )
        sys_t = REF_PROMPTS["entity_extraction_system_prompt"]
        usr_t = REF_PROMPTS["entity_extraction_user_prompt"]
        cont_t = REF_PROMPTS["entity_continue_extraction_user_prompt"]
    hcb = (
        REF_PROMPTS["entity_extraction_section_context"].format(
            heading_path=heading_path
        )
        if heading_path
        else ""
    )
    system = sys_t.format(**context_base)
    user = usr_t.format(
        **{**context_base, "input_text": content, "heading_context_block": hcb}
    )
    if use_json:
        cont = cont_t.format(**context_base)
    else:
        cont = cont_t.format(**{**context_base, "input_text": content})
    return system, user, cont


CASES = [
    dict(content="Dr. Ada Lovelace wrote the first program.", heading_path="",
         language="English", use_json=False),
    dict(content="Tokyo 2020 was postponed to {2021}.", heading_path="History → Olympics",
         language="English", use_json=False),
    dict(content="El grafo conecta Madrid con Lisboa.", heading_path="",
         language="Spanish", use_json=True),
    dict(content="LaTeX \\frac{a}{b} inside \"quotes\".", heading_path="Math → Fractions",
         language="English", use_json=True),
]


@pytest.mark.parametrize("case", CASES)
def test_rendered_extraction_prompts_match_reference(case):
    want = _ref_render_extraction(
        case["content"], case["heading_path"], case["language"],
        case["use_json"], 100, 40,
    )
    got = P.render_extraction_prompts(
        case["content"],
        heading_path=case["heading_path"],
        language=case["language"],
        use_json=case["use_json"],
    )
    assert got.system == want[0]
    assert got.user == want[1]
    assert got.continue_user == want[2]


def test_rendered_summary_prompt_matches_reference():
    descs = ["Ada wrote programs.", "Ada was a countess — b. 1815 é"]
    joined = "\n".join(
        json.dumps({"Description": d}, ensure_ascii=False) for d in descs
    )
    want = REF_PROMPTS["summarize_entity_descriptions"].format(
        description_type="Entity",
        description_name="Ada Lovelace",
        description_list=joined,
        summary_length=600,
        language="English",
    )
    got = P.render_summarize_prompt("Entity", "Ada Lovelace", descs)
    assert got == want


def test_rendered_keywords_prompt_matches_reference():
    examples = "\n".join(
        e.rstrip() for e in REF_PROMPTS["keywords_extraction_examples"]
    )
    want = REF_PROMPTS["keywords_extraction"].format(
        query="How does LightRAG merge entities?",
        examples=examples,
        language="English",
    )
    got = P.render_keywords_prompt("How does LightRAG merge entities?")
    assert got == want


def test_rendered_rag_response_prompts_match_reference():
    ctx = "Knowledge Graph Data (Entity):\n```json\n[]\n```"
    want = REF_PROMPTS["rag_response"].format(
        context_data=ctx, response_type="Multiple Paragraphs", user_prompt="n/a"
    )
    assert P.render_rag_response_prompt(ctx) == want
    want_naive = REF_PROMPTS["naive_rag_response"].format(
        content_data=ctx, response_type="Bullet Points", user_prompt="cite all"
    )
    got_naive = P.render_rag_response_prompt(
        ctx, response_type="Bullet Points", user_prompt="cite all", naive=True
    )
    assert got_naive == want_naive


def test_rendered_context_blocks_match_reference():
    want = REF_PROMPTS["kg_query_context"].format(
        entities_str="[e]", relations_str="[r]",
        text_chunks_str="[c]", reference_list_str="[1] T",
    )
    assert P.render_kg_query_context("[e]", "[r]", "[c]", "[1] T") == want
    want_n = REF_PROMPTS["naive_query_context"].format(
        text_chunks_str="[c]", reference_list_str="[1] T"
    )
    assert P.render_naive_query_context("[c]", "[1] T") == want_n


def test_prompted_extractor_model_end_to_end(spark):
    """A real-endpoint stand-in plugged into extract_records via
    model_factory receives the VERBATIM reference prompts (system + user
    around the chunk, continue prompt + history for gleaning) and its
    responses flow through the normal parse/merge path."""
    from pyspark.sql import functions as F

    from lightrag_spark.functions.llm_adapter import PromptedExtractorModel
    from lightrag_spark.functions.mock_llm import MockExtractorModel
    from lightrag_spark.operators.extraction import extract_records

    mock = MockExtractorModel(min_len=5)

    def llm_fn(prompt, system_prompt=None, history_messages=None):
        # assert the envelope is the reference envelope, then answer like
        # the deterministic mock so downstream parsing stays checkable
        assert "---Role---" in (system_prompt or "")
        assert "Knowledge Graph Specialist" in system_prompt
        if history_messages is None:
            assert "---Input Text---" in prompt
            content = prompt.split("```\n", 1)[1].rsplit("\n```", 1)[0]
            return mock.respond(content, pass_index=0)
        assert "missed or incorrectly formatted" in prompt
        assert history_messages[0]["role"] == "user"
        assert history_messages[1]["role"] == "assistant"
        content = history_messages[0]["content"].split("```\n", 1)[1].rsplit(
            "\n```", 1
        )[0]
        return mock.respond(content, pass_index=1)

    chunks = spark.createDataFrame(
        [
            ("c1", "united_states network analysis customer pipeline", "f1", 0, 0),
            ("c2", "model music network united_states customer", "f2", 1, 0),
        ],
        "chunk_id string, content string, file_path string, doc_order long, "
        "chunk_order_index int",
    )
    recs = extract_records(
        chunks,
        max_gleaning=1,
        model_factory=lambda: PromptedExtractorModel(llm_fn),
    )
    ents = recs.filter(F.col("kind") == "entity")
    assert ents.count() > 0
    assert recs.filter(F.col("kind") == "error").count() == 0

    # the prompted path emits the same records as the direct-mock path
    direct = extract_records(chunks, max_gleaning=1)
    cols = ["kind", "entity_name", "src", "tgt", "description", "chunk_id"]
    got = sorted(map(tuple, recs.select(cols).collect()))
    want = sorted(map(tuple, direct.select(cols).collect()))
    assert got == want


def test_prompted_model_renders_reference_prompts_directly():
    from lightrag_spark.functions.llm_adapter import PromptedExtractorModel

    seen = {}

    def llm_fn(prompt, system_prompt=None, history_messages=None):
        seen["prompt"] = prompt
        seen["system"] = system_prompt
        seen["history"] = history_messages
        return "<|COMPLETE|>"

    m = PromptedExtractorModel(llm_fn)
    m.respond("Some chunk text.", pass_index=0)
    want = _ref_render_extraction("Some chunk text.", "", "English", False, 100, 40)
    assert seen["system"] == want[0]
    assert seen["prompt"] == want[1]
    m.respond("Some chunk text.", pass_index=1, prior_response="resp0")
    assert seen["prompt"] == want[2]
    assert seen["history"][1]["content"] == "resp0"
