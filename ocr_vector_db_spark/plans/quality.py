"""Golden-query evaluation harness — the reference's de-facto correctness
contract (api/cli/quality.py:21-91,167-209), same JSONL format and the same
hit criterion:

    PASS iff any returned result's parent_id ∈ expect_parent_ids,
    OR (failing that, when expect_contains is present) any token appears in
    a result's content or its parent_content.

Entry format (eval_queries*.jsonl):
    {"query": ..., "view": ..., "language": ..., "top_k": 10,
     "expand_context": true, "expect_parent_ids": [...], "expect_contains": [...]}
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame

from ocr_vector_db_spark.plans.query import QueryPlan, ValidationError, search, validate_request


def load_golden_queries(path: str) -> list[dict]:
    out = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


@dataclass
class EvalReport:
    passed: int
    total: int
    failures: list[str]

    @property
    def pass_rate(self) -> float:
        return self.passed / self.total if self.total else 0.0


def evaluate(
    golden: list[dict],
    embeddings: DataFrame,
    parents: DataFrame | None = None,
    embedder=None,
    dim: int = 64,
) -> EvalReport:
    total = passed = 0
    failures: list[str] = []

    for idx, entry in enumerate(golden, 1):
        query = entry.get("query")
        if not query:
            failures.append(f"[{idx}] missing 'query'")
            continue
        view = entry.get("view")
        language = entry.get("language")
        top_k = int(entry.get("top_k", 10))
        expand = bool(entry.get("expand_context", True))
        expect_parent_ids = entry.get("expect_parent_ids") or []
        expect_contains = entry.get("expect_contains") or []

        try:
            validate_request(query, view, top_k)
        except ValidationError as exc:
            failures.append(f"[{idx}] invalid query config: {exc}")
            continue

        kwargs = {"embedder": embedder} if embedder else {}
        plan = QueryPlan.build(
            query, view=view, lang=language, top_k=top_k, expand_context=expand,
            dim=dim, **kwargs,
        )
        rows = search(embeddings, plan, parents if expand else None).collect()
        total += 1

        matched = any(r.parent_id in expect_parent_ids for r in rows) if expect_parent_ids else False
        if not matched and expect_contains:
            for r in rows:
                content = r.content or ""
                parent = (r.parent_content if "parent_content" in r.__fields__ else "") or ""
                if any(tok in content or tok in parent for tok in expect_contains):
                    matched = True
                    break

        if matched:
            passed += 1
        else:
            failures.append(f"[{idx}] query='{query}' did not match expectations")

    return EvalReport(passed, total, failures)
