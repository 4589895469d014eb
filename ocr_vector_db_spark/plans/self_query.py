"""LLM-backed self-query filter extraction with staged fallback.

The reference extracts metadata filters from the natural-language query with
an LLM structured-query chain (retrieval/self_query.py:99-240: LangChain
SelfQueryRetriever → structured filter → PGVector metadata filter), falling
back to an UNFILTERED similarity search when extraction or conversion fails
— failure never surfaces to the caller. This module gives that seam the same
provider-interface treatment as embeddings (operators/embedding_provider.py):

  - the LLM is an INJECTED client with the one-method contract
    ``complete(system, prompt) -> str`` (same protocol plans/rag.py uses),
  - calls go through ``call_with_retry`` (×1.5 backoff, rate-limit aware —
    vector_store.py:94-137's contract),
  - the response is parsed as strict JSON against the reference's metadata
    schema (view/lang, self_query.py:23-35) with unknown keys and invalid
    values DROPPED, and
  - any failure (transport, parse, schema) falls back to the deterministic
    heuristic extractor, then to no filters — the reference's
    retrieve → _fallback_search ladder (self_query.py:155-240).

No network client exists in this sandbox; `JsonStubLLM` is the deterministic
stand-in (heuristics rendered as the JSON an instruction-following model
would emit), and tests drive the failure ladder with raising fakes.
"""

from __future__ import annotations

import json

# Reference metadata schema (retrieval/self_query.py:23-35): two filterable
# attributes; `lang` only applies to code content.
ALLOWED_FIELDS = {"view", "lang"}
ALLOWED_VIEWS = {"text", "code"}

SYSTEM_PROMPT = (
    "You extract metadata filters from search queries over technical "
    "documentation and code examples from OCR-processed PDFs.\n"
    "Fields:\n"
    "  view: 'text' for explanatory documentation, 'code' for code snippets\n"
    "  lang: programming language ('python', 'javascript', ...), only when "
    "view is 'code'\n"
    'Respond with ONLY a JSON object, e.g. {"view": "code", "lang": '
    '"python"}. Use {} when no filter applies.'
)


def build_extractor_prompt(query: str) -> str:
    return f"Query: {query}\nFilters:"


def parse_filter_json(text: str) -> dict:
    """Strict-schema parse of the model response: the first {...} block as
    JSON, keys whitelisted to the reference's metadata fields, values must
    be strings (lowercased); an invalid `view` drops the key, and `lang`
    without `view=code` is kept (the reference's converter passes any
    attribute/value pair through — self_query.py:125-152). Raises ValueError
    on anything that isn't a JSON object — callers own the fallback."""
    start, end = text.find("{"), text.rfind("}")
    if start < 0 or end <= start:
        raise ValueError(f"no JSON object in response: {text[:80]!r}")
    obj = json.loads(text[start : end + 1])
    if not isinstance(obj, dict):
        raise ValueError(f"expected JSON object, got {type(obj).__name__}")
    out = {}
    for k, v in obj.items():
        if k not in ALLOWED_FIELDS or not isinstance(v, str) or not v:
            continue
        v = v.strip().lower()
        if k == "view" and v not in ALLOWED_VIEWS:
            continue
        out[k] = v
    return out


class JsonStubLLM:
    """Deterministic instruction-following stand-in: answers the extractor
    prompt with the heuristic filters as JSON. Lets the LLM path run
    end-to-end (prompt → complete → parse → filters) with zero network."""

    model = "json-stub-llm"

    def complete(self, system: str, prompt: str) -> str:
        from ocr_vector_db_spark.plans.pipeline import heuristic_self_query

        query = prompt.removeprefix("Query: ").rsplit("\nFilters:", 1)[0]
        return json.dumps(heuristic_self_query(query))


class LLMSelfQuery:
    """The injectable stage-0 extractor: ``LLMSelfQuery(client)`` is a
    `SelfQueryFn` (plans/pipeline.py) — call it with the query, get filters.

    Failure ladder (parity with retrieval/self_query.py:155-240 +
    retrieval/pipeline.py:114-135): LLM transport/parse/schema error →
    `fallback` (the deterministic heuristic by default) → empty filters.
    `last_error` keeps the swallowed exception for observability, mirroring
    the reference's verbose logging."""

    _DEFAULT_FALLBACK = object()

    def __init__(
        self,
        llm=None,
        fallback=_DEFAULT_FALLBACK,
        rpm: int = 0,
        max_attempts: int = 6,
    ):
        from ocr_vector_db_spark.plans.pipeline import heuristic_self_query

        self.llm = llm or JsonStubLLM()
        self.fallback = (
            heuristic_self_query if fallback is self._DEFAULT_FALLBACK else fallback
        )
        self.rpm = rpm
        self.max_attempts = max_attempts
        self.last_error: Exception | None = None

    def __call__(self, query: str) -> dict:
        from ocr_vector_db_spark.operators.embedding_provider import call_with_retry

        self.last_error = None
        try:
            raw = call_with_retry(
                lambda: self.llm.complete(SYSTEM_PROMPT, build_extractor_prompt(query)),
                max_attempts=self.max_attempts,
                rpm=self.rpm,
            )
            return parse_filter_json(raw)
        except Exception as exc:  # noqa: BLE001 — the contract IS fall-through
            self.last_error = exc
            if self.fallback is None:
                return {}
            try:
                return self.fallback(query) or {}
            except Exception:
                return {}
