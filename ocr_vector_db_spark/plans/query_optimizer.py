"""Deterministic query-understanding fallback (no LLM).

Port of the reference's heuristic path (generation/query_optimizer.py:173-236):
stopword removal (EN+KO), top-5 keywords, code/text indicator words → view
hint, language pattern table → language hint. The LLM-backed self-query path
(retrieval/self_query.py) is pluggable on top — this deterministic function
is the correctness contract.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

STOPWORDS = {
    "what", "how", "why", "when", "where", "which",
    "is", "are", "was", "were", "be", "been",
    "do", "does", "did", "can", "could", "should", "would",
    "the", "a", "an", "to", "of", "in", "for", "on", "with",
    "i", "you", "me", "my", "we", "our",
    "이", "가", "을", "를", "은", "는", "에", "에서", "로", "으로",
    "와", "과", "의", "도", "만", "까지", "부터",
    "무엇", "어떻게", "왜", "언제", "어디",
}

CODE_INDICATORS = [
    "code", "function", "class", "method", "implement",
    "코드", "함수", "클래스", "메서드", "구현",
]
TEXT_INDICATORS = ["explain", "what", "concept", "mean", "설명", "개념", "뜻", "의미"]

LANGUAGE_PATTERNS = {
    "python": ["python", "파이썬", "py"],
    "javascript": ["javascript", "자바스크립트", "js", "node"],
    "java": ["java", "자바"],
    "typescript": ["typescript", "타입스크립트", "ts"],
    "go": ["golang", "go언어"],
    "rust": ["rust", "러스트"],
}


@dataclass
class OptimizedQuery:
    original: str
    keywords: list[str]
    rewritten: str
    view_hint: str | None
    language_hint: str | None


def optimize(query: str) -> OptimizedQuery:
    words = re.findall(r"[a-zA-Z가-힣]+", query.lower())
    keywords = [w for w in words if w not in STOPWORDS and len(w) > 1][:5]

    low = query.lower()
    view_hint = None
    if any(ind in low for ind in CODE_INDICATORS):
        view_hint = "code"
    elif any(ind in low for ind in TEXT_INDICATORS):
        view_hint = "text"

    language_hint = None
    for lang, pats in LANGUAGE_PATTERNS.items():
        if any(p in low for p in pats):
            language_hint = lang
            break

    return OptimizedQuery(
        original=query,
        keywords=keywords,
        rewritten=" ".join(keywords) if keywords else query,
        view_hint=view_hint,
        language_hint=language_hint,
    )
