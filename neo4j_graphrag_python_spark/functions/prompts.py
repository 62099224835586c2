"""Prompt templates — the extraction/RAG prompt contracts.

Reference: generation/prompts.py — ``PromptTemplate.format`` with
required-input checking (:26-92), ``ERExtractionTemplate`` defining the
JSON extraction contract (:162-202), ``RagTemplate`` (:95-108).

Driver-side string work; the formatted prompts feed any LLM-backed
``ExtractorFn`` (operators/extractor.py ``llm_extractor``).
"""

from __future__ import annotations

import json
import re
from typing import Any


class PromptMissingInputError(ValueError):
    pass


class PromptTemplate:
    """``{placeholder}`` substitution with required-input validation
    (reference prompts.py:26-92)."""

    DEFAULT_TEMPLATE: str = ""
    EXPECTED_INPUTS: list[str] = []

    def __init__(
        self,
        template: str | None = None,
        expected_inputs: list[str] | None = None,
    ) -> None:
        self.template = template if template is not None else self.DEFAULT_TEMPLATE
        self.expected_inputs = (
            expected_inputs if expected_inputs is not None else self.EXPECTED_INPUTS
        )

    def placeholders(self) -> set[str]:
        return set(re.findall(r"{(\w+)}", self.template))

    def format(self, **kwargs: Any) -> str:
        for expected in self.expected_inputs:
            if expected not in kwargs or kwargs[expected] is None:
                raise PromptMissingInputError(
                    f"Missing input '{expected}' for prompt template"
                )
        data = {p: kwargs.get(p, "") for p in self.placeholders()}
        return self.template.format(**data)


class ERExtractionTemplate(PromptTemplate):
    """The entity/relation extraction contract (prompts.py:162-202): the
    model must answer with the JSON shape consumed by
    operators/extractor.parse_extraction."""

    DEFAULT_TEMPLATE = (
        "You are a top-tier algorithm designed for extracting information in "
        "structured formats to build a knowledge graph.\n\n"
        "Extract the entities (nodes) and specify their type from the "
        "following text.\nAlso extract the relationships between these "
        "nodes.\n\n"
        "Return result as JSON using the following format:\n"
        '{{"nodes": [{{"id": "0", "label": "entity type", '
        '"properties": {{"name": "name of entity"}}}}],\n'
        '"relationships": [{{"type": "TYPE_OF_RELATIONSHIP", '
        '"start_node_id": "0", "end_node_id": "1", '
        '"properties": {{"details": "Description of the relationship"}}}}]}}\n\n'
        "Use only the following node and relationship types (if provided):\n"
        "{schema}\n\n"
        "Assign a unique ID (string) to each node, and reuse it to define "
        "relationships.\nDo respect the source and target node types for "
        "relationship and the relationship direction.\n\n"
        "Do not return any additional information other than the JSON in it.\n\n"
        "Examples:\n{examples}\n\nInput text:\n\n{text}"
    )
    EXPECTED_INPUTS = ["text"]

    def format(
        self,
        text: str = "",
        schema: dict[str, Any] | None = None,
        examples: str = "",
    ) -> str:
        return super().format(
            text=text,
            schema=json.dumps(schema or {}, ensure_ascii=False),
            examples=examples,
        )


class RagTemplate(PromptTemplate):
    """Answer-generation prompt (prompts.py:95-108)."""

    DEFAULT_TEMPLATE = (
        "Context:\n{context}\n\nExamples:\n{examples}\n\nQuestion:\n{query_text}\n\n"
        "Answer:"
    )
    EXPECTED_INPUTS = ["context", "query_text"]
