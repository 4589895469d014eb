"""RAG assembly + generation (driver-side by design).

Top-k is ≤100 rows (retrieval/query.py:17), so context assembly, prompting,
conversation memory, and the LLM call all live on the driver — distributing
them would be cargo cult. Semantics ported from the reference:

- context assembly (generation/prompts.py:65-116): per result
  `[Source i: source]`, parent preview truncated at 800 chars + "...",
  matched content labeled `VIEW (lang)`, entries separated by "="*40;
- RAG template + system prompt rules (prompts.py:36-52);
- response formatting with `[i] source (view, sim: x.xx)` attribution
  (generation/models.py:67-79);
- conversation memory: keep last 5 turns, prompt with last 3, 200-char
  answer previews (models.py:91-126);
- KO/EN no-results message via Hangul detection (generation/pipeline.py:109-129);
- LLM client = pluggable callable with the retry harness from
  operators/embedding_provider (same backoff rules as generation/client.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Row

SYSTEM_PROMPT = """You are a helpful assistant that answers questions based on the provided context.

RULES:
1. Only answer based on the provided context - do not use external knowledge
2. If the context doesn't contain enough information, clearly say \
"I don't have enough information to answer this question based on the provided context"
3. Always cite sources using [Source N] format when referencing specific information
4. Be concise but comprehensive
5. For code questions, include relevant code snippets from the context
6. If the question is in Korean, answer in Korean. If in English, answer in English."""

RAG_TEMPLATE = """Context:
{context}

---
Question: {query}

Answer based on the context above. Include source citations [Source N] where appropriate."""

PARENT_PREVIEW_CHARS = 800
SEPARATOR = "=" * 40 + "\n"


@dataclass
class PromptContext:
    query: str
    retrieved_content: str
    source_citations: list[str]


def _get(row, name: str, default=None):
    if isinstance(row, Row):
        return row[name] if name in row.__fields__ else default
    return getattr(row, name, row.get(name, default) if hasattr(row, "get") else default)


def build_context(results: list) -> PromptContext:
    """Assemble retrieved rows (search() output: content/view/lang/source/
    similarity/parent_content) into the prompt context block."""
    parts, citations = [], []
    for i, r in enumerate(results, 1):
        source = _get(r, "source", "unknown") or "unknown"
        citations.append(f"[{i}] {source}")
        entry = f"[Source {i}: {source}]\n"
        parent = _get(r, "parent_content")
        if parent:
            preview = parent[:PARENT_PREVIEW_CHARS]
            if len(parent) > PARENT_PREVIEW_CHARS:
                preview += "..."
            entry += f"Context:\n{preview}\n\n"
        view_label = (_get(r, "view", "text") or "text").upper()
        lang = _get(r, "lang")
        if lang:
            view_label += f" ({lang})"
        entry += f"Matched Content [{view_label}]:\n{_get(r, 'content', '')}\n"
        parts.append(entry)
    return PromptContext(
        query="",
        retrieved_content="\n" + SEPARATOR.join([""] + parts),
        source_citations=citations,
    )


def format_rag_prompt(query: str, context: PromptContext) -> str:
    return RAG_TEMPLATE.format(context=context.retrieved_content, query=query)


@dataclass
class GeneratedResponse:
    query: str
    answer: str
    sources: list
    model: str

    def format_with_sources(self) -> str:
        lines = [self.answer, "", "---", "Sources:"]
        for i, r in enumerate(self.sources, 1):
            source = _get(r, "source", "unknown") or "unknown"
            view = _get(r, "view", "text")
            sim = _get(r, "similarity", 0.0) or 0.0
            lines.append(f"  [{i}] {source} ({view}, sim: {sim:.2f})")
        return "\n".join(lines)


@dataclass
class Conversation:
    turns: list = field(default_factory=list)
    max_history: int = 5

    def add_turn(self, query: str, response: GeneratedResponse) -> None:
        self.turns.append((query, response))
        if len(self.turns) > self.max_history:
            self.turns = self.turns[-self.max_history:]

    def get_history_context(self) -> str:
        if not self.turns:
            return ""
        lines = ["Previous conversation:"]
        for q, resp in self.turns[-3:]:
            lines.append(f"User: {q}")
            lines.append(f"Assistant: {resp.answer[:200]}...")
        return "\n".join(lines)

    def clear(self) -> None:
        self.turns = []


def no_results_message(query: str) -> str:
    has_korean = any("가" <= c <= "힣" for c in query)
    if has_korean:
        return (
            "죄송합니다. 질문에 관련된 정보를 찾을 수 없습니다. "
            "다른 키워드로 검색하거나 질문을 다시 작성해 주세요."
        )
    return (
        "I couldn't find relevant information to answer your question. "
        "Please try different keywords or rephrase your question."
    )


class EchoLLM:
    """Deterministic stand-in client: answers with the top source citation.
    Production swaps in a real client; `generate` keeps the retry contract."""

    model = "echo-llm"

    def complete(self, system: str, prompt: str) -> str:
        first_source = "[Source 1]" if "[Source 1:" in prompt else ""
        return f"Based on the context {first_source}: see cited material."


def generate(
    query: str,
    results: list,
    llm=None,
    conversation: Conversation | None = None,
    rpm: int = 0,
) -> GeneratedResponse:
    """Full RAG step over already-retrieved rows (retrieval is plans.query.search)."""
    from ocr_vector_db_spark.operators.embedding_provider import call_with_retry

    if not results:
        return GeneratedResponse(query, no_results_message(query), [], "none")
    llm = llm or EchoLLM()
    ctx = build_context(results)
    prompt = format_rag_prompt(query, ctx)
    if conversation and conversation.turns:
        prompt = conversation.get_history_context() + "\n\n" + prompt
    answer = call_with_retry(lambda: llm.complete(SYSTEM_PROMPT, prompt), rpm=rpm)
    resp = GeneratedResponse(query, answer, results, llm.model)
    if conversation is not None:
        conversation.add_turn(query, resp)
    return resp
