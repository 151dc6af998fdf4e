"""RAG assembly: document-level results, context formatting, citations,
prompt construction — the driver-side tail of the reference's /query
endpoint (/root/reference/core/services/document_service.py:1028-1147,
litellm_completion.py:22-170).

Everything up to and including top-k retrieval is distributed; assembly
operates on the collected k rows (k ≤ 20), so these are plain-Python
helpers over Row dicts. The LLM call itself sits behind ``CompletionModel``
— a protocol with a deterministic stub for tests; LiteLLM/OpenAI-style
backends implement the same two methods.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Protocol

__all__ = ["ChunkContext", "assemble_context", "build_prompt", "CompletionModel", "StubCompletionModel", "rag_query"]


@dataclass(frozen=True)
class ChunkContext:
    document_id: Any
    chunk_number: int
    content: str
    score: float
    filename: str | None = None
    page_number: int | None = None
    metadata: dict = field(default_factory=dict)

    @property
    def citation(self) -> str:
        """Inline-citation label (colpali page = chunk_number + 1, reference
        document_service.py:1120-1147)."""
        name = self.filename or str(self.document_id)
        page = self.page_number if self.page_number is not None else self.chunk_number + 1
        return f"[{name} p.{page}]"


def assemble_context(chunks: list[ChunkContext], max_chars: int | None = None) -> str:
    """Join chunk contents in score order with citation headers; optional
    char budget truncates whole chunks (never mid-chunk)."""
    ordered = sorted(chunks, key=lambda c: (-c.score, str(c.document_id), c.chunk_number))
    parts: list[str] = []
    used = 0
    for c in ordered:
        block = f"{c.citation}\n{c.content}"
        if max_chars is not None and used + len(block) > max_chars and parts:
            break
        parts.append(block)
        used += len(block)
    return "\n\n".join(parts)


def build_prompt(query: str, context: str, prompt_template: str | None = None) -> str:
    """Default template mirrors the reference's structure: context block,
    then the question (litellm_completion.py:110-170). A custom template
    receives {context} and {question}."""
    template = prompt_template or (
        "Answer the question using only the provided context.\n\n"
        "Context:\n{context}\n\nQuestion: {question}\nAnswer:"
    )
    return template.format(context=context, question=query)


class CompletionModel(Protocol):
    def complete(self, prompt: str, max_tokens: int | None = None, temperature: float | None = None) -> str: ...


class StubCompletionModel:
    """Deterministic test double: echoes the first citation + question hash."""

    def complete(self, prompt: str, max_tokens: int | None = None, temperature: float | None = None) -> str:
        first_cite = next((line for line in prompt.splitlines() if line.startswith("[")), "[no-context]")
        return f"stub-answer {first_cite}"


def rag_query(
    retrieved_rows: list,
    query: str,
    model: CompletionModel,
    prompt_template: str | None = None,
    max_context_chars: int | None = None,
) -> dict:
    """Collected top-k rows → context → prompt → completion.

    Returns {answer, context, citations} — the CompletionResponse shape.
    """
    chunks = [
        ChunkContext(
            document_id=r["document_id"],
            chunk_number=int(r.get("chunk_number", 0)),
            content=str(r.get("content", "")),
            score=float(r.get("score", 0.0)),
            filename=r.get("filename"),
            page_number=r.get("page_number"),
        )
        for r in retrieved_rows
    ]
    context = assemble_context(chunks, max_context_chars)
    prompt = build_prompt(query, context, prompt_template)
    answer = model.complete(prompt)
    return {
        "answer": answer,
        "context": context,
        "citations": [c.citation for c in sorted(chunks, key=lambda c: -c.score)],
    }
