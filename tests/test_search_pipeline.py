"""End-to-end retrieval tests: ingest a fixture corpus, run the search
pipeline and the golden-query harness over it (reference §3.2 lifecycle)."""

import pytest
from pyspark.sql import functions as F

from ocr_vector_db_spark.plans import query_optimizer
from ocr_vector_db_spark.plans.query import QueryPlan, ValidationError, search
from ocr_vector_db_spark.plans.quality import EvalReport, evaluate
from ocr_vector_db_spark.sources.ingest import files_df, ingest

CORPUS = [
    (
        "/corpus/decorators.md",
        """Python decorators wrap functions to extend behavior cleanly.

```python
def retry(fn):
    return fn
```

More prose about decorator composition patterns and idioms.
""",
        "md",
    ),
    (
        "/corpus/generators.md",
        """Generators produce values lazily using the yield keyword in Python.

```python
def count(n):
    yield n
```

Lazy evaluation saves memory on large sequences of records.
""",
        "md",
    ),
]


@pytest.fixture(scope="module")
def corpus(spark):
    out = ingest(spark, files_df(spark, CORPUS), dim=32)
    emb = out["embeddings"].cache()
    parents = out["parents"].cache()
    emb.count(), parents.count()
    return {"embeddings": emb, "parents": parents, "fragments": out["fragments"]}


def test_plan_validation():
    with pytest.raises(ValidationError):
        QueryPlan.build("", top_k=10)
    with pytest.raises(ValidationError):
        QueryPlan.build("x", view="nonsense")
    with pytest.raises(ValidationError):
        QueryPlan.build("x", top_k=0)
    with pytest.raises(ValidationError):
        QueryPlan.build("x" * 10001)
    assert QueryPlan.build("x", top_k=500, dim=8).top_k == 100  # clamp to MAX_TOP_K


def test_search_exact_content_ranks_first(corpus):
    frag = corpus["fragments"].filter(F.col("view") == "code").head()
    plan = QueryPlan.build(frag.content, top_k=5, dim=32)
    rows = search(corpus["embeddings"], plan, corpus["parents"]).collect()
    assert rows
    assert rows[0].content == frag.content and rows[0].similarity == 1.0
    assert rows[0].parent_id == frag.concept_id
    # context expanded from synthesized parent
    assert rows[0].parent_content and frag.content[:40] in rows[0].parent_content


def test_search_view_filter(corpus):
    plan = QueryPlan.build("anything at all", view="code", top_k=10, dim=32)
    rows = search(corpus["embeddings"], plan).collect()
    assert rows and all(r.view == "code" for r in rows)


def test_golden_harness(corpus):
    frag = corpus["fragments"].filter(F.col("view") == "code").head()
    golden = [
        # parent-id hit via exact-content query (deterministic embedder)
        {"query": frag.content, "top_k": 3, "expect_parent_ids": [frag.concept_id]},
        # contains hit: k covers the whole tiny corpus
        {"query": "lazy evaluation", "top_k": 50, "expect_contains": ["yield"]},
        # deliberate miss
        {"query": "zzz", "top_k": 1, "expect_parent_ids": ["no-such-parent"]},
        # invalid entry is reported, not crashed
        {"query": "", "top_k": 1},
    ]
    report = evaluate(golden, corpus["embeddings"], corpus["parents"], dim=32)
    assert isinstance(report, EvalReport)
    assert report.total == 3 and report.passed == 2
    assert len(report.failures) == 2  # one miss + one invalid


def test_query_optimizer_fallback():
    q = query_optimizer.optimize("How do I implement a python decorator function?")
    assert q.view_hint == "code"
    assert q.language_hint == "python"
    assert "decorator" in q.keywords and "how" not in q.keywords
    assert len(q.keywords) <= 5
    t = query_optimizer.optimize("Explain the concept of closures")
    assert t.view_hint == "text"
    ko = query_optimizer.optimize("파이썬 함수 구현")
    assert ko.view_hint == "code" and ko.language_hint == "python"
