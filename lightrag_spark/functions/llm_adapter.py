"""Real-endpoint adapter for the extraction stage.

``extract_records`` talks to any object with
``respond(chunk_content, pass_index=0, prior_response=None) -> str``.
The default is the deterministic MockExtractorModel; this module provides
the production shape: ``PromptedExtractorModel`` renders the VERBATIM
reference prompts (prompts.py — byte-identical templates, same assembly
as lightrag/operate.py:3715-3830) around each chunk and delegates to a
user-supplied client callable

    llm_fn(user_prompt, system_prompt=None, history_messages=None) -> str

mirroring the reference's ``use_llm_func_with_cache`` contract
(utils.py: prompt + system_prompt + history messages).  The gleaning pass
(pass_index=1) replays the first exchange as history, exactly like
pack_user_ass_to_openai_messages (operate.py:3840-3844).

The object is constructed ON THE DRIVER and pickled to executors, so
``llm_fn`` must be serializable; real HTTP clients should be built lazily
inside ``llm_fn`` per executor (standard Spark client pattern).
"""

from __future__ import annotations

from typing import Callable

from ..prompts import (
    DEFAULT_LANGUAGE,
    DEFAULT_MAX_EXTRACTION_ENTITIES,
    DEFAULT_MAX_EXTRACTION_RECORDS,
    render_extraction_prompts,
)


class PromptedExtractorModel:
    """Wraps a real LLM callable in the reference's exact prompt envelope."""

    def __init__(
        self,
        llm_fn: Callable[..., str],
        *,
        use_json: bool = False,
        language: str = DEFAULT_LANGUAGE,
        max_total_records: int = DEFAULT_MAX_EXTRACTION_RECORDS,
        max_entity_records: int = DEFAULT_MAX_EXTRACTION_ENTITIES,
        entity_types_guidance: str | None = None,
    ):
        self.llm_fn = llm_fn
        self.use_json = use_json
        self.language = language
        self.max_total_records = max_total_records
        self.max_entity_records = max_entity_records
        self.entity_types_guidance = entity_types_guidance

    def _prompts(self, chunk_content: str, heading_path: str = ""):
        return render_extraction_prompts(
            chunk_content,
            heading_path=heading_path,
            language=self.language,
            use_json=self.use_json,
            max_total_records=self.max_total_records,
            max_entity_records=self.max_entity_records,
            entity_types_guidance=self.entity_types_guidance,
        )

    def respond(
        self,
        chunk_content: str,
        pass_index: int = 0,
        prior_response: str | None = None,
    ) -> str:
        p = self._prompts(chunk_content)
        if pass_index == 0:
            return self.llm_fn(p.user, system_prompt=p.system, history_messages=None)
        history = [
            {"role": "user", "content": p.user},
            {"role": "assistant", "content": prior_response or ""},
        ]
        return self.llm_fn(
            p.continue_user, system_prompt=p.system, history_messages=history
        )
