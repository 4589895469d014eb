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


class _FailingLLM:
    """Transport-dead client: every call raises (non-rate-limit)."""

    model = "failing-llm"
    calls = 0

    def complete(self, system, prompt):
        self.calls += 1
        raise ConnectionError("backend unreachable")


class _GarbageLLM:
    model = "garbage-llm"

    def complete(self, system, prompt):
        return "Sure! The filters you want are view equals code."


class _FlakyJsonLLM:
    """Rate-limited twice, then answers — exercises the retry contract."""

    model = "flaky-json-llm"

    def __init__(self):
        self.calls = 0

    def complete(self, system, prompt):
        self.calls += 1
        if self.calls <= 2:
            raise RuntimeError("ratelimit: slow down")
        return '{"view": "code", "lang": "python", "limit": 5, "evil": "x"}'


def test_self_query_llm_extracts_and_sanitizes():
    """Valid JSON → whitelisted filters; unknown keys and non-schema values
    are dropped; retry contract consumes rate-limit errors."""
    from ocr_vector_db_spark.plans.self_query import LLMSelfQuery

    llm = _FlakyJsonLLM()
    sq = LLMSelfQuery(llm, max_attempts=5)
    # no real sleeping in tests: patch the retry sleeper via rpm=0 default
    import ocr_vector_db_spark.operators.embedding_provider as ep

    orig = ep.time.sleep
    ep.time.sleep = lambda s: None
    try:
        got = sq("python decorator code example")
    finally:
        ep.time.sleep = orig
    assert got == {"view": "code", "lang": "python"}
    assert llm.calls == 3  # two rate-limit retries then success
    assert sq.last_error is None


def test_self_query_failure_falls_back_to_heuristic():
    """Dead transport → heuristic filters (reference's fallback ladder,
    retrieval/self_query.py:155-240); garbage JSON → same; heuristic=None →
    empty filters. The pipeline never sees the exception."""
    from ocr_vector_db_spark.plans.pipeline import heuristic_self_query
    from ocr_vector_db_spark.plans.self_query import LLMSelfQuery

    q = "python decorator code example"
    sq = LLMSelfQuery(_FailingLLM())
    assert sq(q) == heuristic_self_query(q)  # fell back, same filters
    assert isinstance(sq.last_error, ConnectionError)

    sq_bare = LLMSelfQuery(_FailingLLM(), fallback=None)
    assert sq_bare(q) == {}  # explicitly-no-fallback ladder ends empty

    sq_garbage = LLMSelfQuery(_GarbageLLM(), fallback=None)
    assert sq_garbage(q) == {}
    assert sq_garbage.last_error is not None  # parse error recorded


def test_self_query_stub_llm_end_to_end(corpus):
    """The full stage-0 path through RetrievalPipeline with an injected
    (deterministic) LLM client: extraction runs, retrieval still returns
    rows, and a failing client degrades to the same results — stage
    fallback parity with retrieval/pipeline.py:114-135."""
    from ocr_vector_db_spark.plans.pipeline import RetrievalPipeline
    from ocr_vector_db_spark.plans.self_query import JsonStubLLM, LLMSelfQuery

    pipe_llm = RetrievalPipeline(
        corpus["embeddings"], corpus["parents"], dim=32,
        self_query=LLMSelfQuery(JsonStubLLM()),
    )
    pipe_dead = RetrievalPipeline(
        corpus["embeddings"], corpus["parents"], dim=32,
        self_query=LLMSelfQuery(_FailingLLM()),
    )
    q = "lazy evaluation generators"
    got_llm = pipe_llm.retrieve(q, top_k=3).collect()
    got_dead = pipe_dead.retrieve(q, top_k=3).collect()
    assert len(got_llm) > 0
    # dead LLM falls back to the heuristic — identical filter decisions,
    # identical results
    assert [r.fragment_id for r in got_llm] == [r.fragment_id for r in got_dead]


def test_rag_generate_with_failing_llm(corpus):
    """generate() keeps the retry contract for the injected client: a
    non-rate-limit failure propagates after ONE attempt (the reference
    re-raises transport errors immediately, generation/client.py), a
    rate-limited client is retried."""
    import pytest as _pytest

    from ocr_vector_db_spark.plans.pipeline import RetrievalPipeline
    from ocr_vector_db_spark.plans.rag import generate

    rows = RetrievalPipeline(
        corpus["embeddings"], corpus["parents"], dim=32
    ).retrieve("decorators", top_k=2).collect()
    assert rows
    dead = _FailingLLM()
    with _pytest.raises(ConnectionError):
        generate("decorators", rows, llm=dead)
    assert dead.calls == 1  # non-rate-limit: no blind retries

    import ocr_vector_db_spark.operators.embedding_provider as ep

    flaky = _FlakyJsonLLM()
    orig = ep.time.sleep
    ep.time.sleep = lambda s: None
    try:
        resp = generate("decorators", rows, llm=flaky)
    finally:
        ep.time.sleep = orig
    assert flaky.calls == 3 and resp.answer.startswith("{")


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


def test_retrieve_hybrid_indexed_matches_scan_path(corpus, spark, tmp_path_factory):
    """RetrievalPipeline.retrieve_hybrid: the persisted-index serving path
    (LexicalIndex + IVFIndex) must fuse identically to the scan-path
    formulation (the q102 ≡ q90 contract, here over the real store shape)."""
    from ocr_vector_db_spark.operators.ann_index import IVFIndex
    from ocr_vector_db_spark.operators.lexical_index import LexicalIndex
    from ocr_vector_db_spark.plans.pipeline import RetrievalPipeline

    emb = corpus["embeddings"]
    lex_path = str(tmp_path_factory.mktemp("hyb_lex"))
    ivf_path = str(tmp_path_factory.mktemp("hyb_ivf"))
    LexicalIndex.build(
        spark, emb, lex_path, n_buckets=8,
        id_col="fragment_id", text_col="content",
    )
    IVFIndex.build(spark, emb, ivf_path, num_clusters=2, emb_col="embedding")

    scan_pipe = RetrievalPipeline(emb, dim=32)
    idx_pipe = RetrievalPipeline(
        emb, dim=32,
        lexical_index=LexicalIndex.load(spark, lex_path),
        ivf_index=IVFIndex.load(spark, ivf_path),
    )
    q = "lazy generators yield"
    cols = ["id", "rrf", "n_systems", "fused_rank"]
    got = [tuple(r) for r in idx_pipe.retrieve_hybrid(q, top_k=5).select(*cols).collect()]
    want = [tuple(r) for r in scan_pipe.retrieve_hybrid(q, top_k=5).select(*cols).collect()]
    assert got == want and len(got) > 0
    # both systems contributed to at least one fused result
    assert any(n == 2 for _, _, n, _ in got)
