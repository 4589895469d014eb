"""Golden-corpus port (plans/golden_corpus.py): the reference's 45 golden
queries (eval_queries*.jsonl, runner api/cli/quality.py:21-91) against a
synthesized planted-snippet corpus."""

from ocr_vector_db_spark.functions import hashing
from ocr_vector_db_spark.plans.golden_corpus import (
    SUITES,
    corpus_files,
    golden_queries_df,
    load_suites,
    parent_doc_map,
)


def test_suites_match_reference_counts():
    suites = dict((s, len(e)) for s, e in load_suites())
    assert suites == {"base": 8, "code": 7, "extended": 30}
    assert [s for s, _ in SUITES] == ["base", "code", "extended"]


def test_corpus_one_doc_per_parent_snippet():
    suites = load_suites()
    files = corpus_files(suites)
    paths = [p for p, _, _ in files]
    assert len(paths) == len(set(paths)), "duplicate fixture paths"
    doc_map = parent_doc_map(suites)
    planted_ids = {d for ids in doc_map.values() for d in ids}
    assert planted_ids == {hashing.document_id(p) for p in paths}
    # every query's expectation resolves to at least one planted doc
    for _, entries in suites:
        for e in entries:
            for p in e.get("expect_parent_ids") or []:
                assert doc_map[p], p


def test_code_snippet_fences():
    suites = load_suites()
    bodies = "\n".join(body for _, body, _ in corpus_files(suites))
    for _, entries in suites:
        for e in entries:
            if e.get("view") == "code" and e.get("language"):
                assert f"```{e['language']}" in bodies


def test_queries_df_shape(spark):
    suites = load_suites()
    qdf = golden_queries_df(spark, suites, dim=16)
    rows = qdf.collect()
    assert len(rows) == 45
    assert all(len(r.q_emb) == 16 for r in rows)
    assert all(r.top_k >= 1 for r in rows)
