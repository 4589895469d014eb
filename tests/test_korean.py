"""Korean/Unicode tokenization across the lexical stack (round 10).

The reference is a KO/EN OCR system; rounds 1-9 tokenized ASCII-only so
Korean documents produced zero terms for BM25/LM/BPE. These tests pin the
widened shared splitter (functions/tokenize.py) and the ko language-ID
extension, plus a regression guard that no oracle SQL carries the stale
ASCII-only class."""

from pyspark.sql import functions as F

from ocr_vector_db_spark.functions import text_analysis as ta
from ocr_vector_db_spark.functions.tokenize import TOKEN_SPLIT_RE, tokens_of


def test_shared_splitter_is_threaded_everywhere():
    """Every tokenizer constant in the lexical stack IS the shared one."""
    from ocr_vector_db_spark.operators import bpe, ngram_lm, tfidf

    assert tfidf.WORD_SPLIT_RE == TOKEN_SPLIT_RE
    assert ngram_lm.TOKEN_SPLIT == TOKEN_SPLIT_RE
    assert bpe.TOKEN_SPLIT_RE == TOKEN_SPLIT_RE
    assert "가-힣" in TOKEN_SPLIT_RE


def test_no_oracle_carries_stale_ascii_split():
    """No oracle SQL (nor generated fragment) still splits ASCII-only —
    a Spark-side/oracle-side tokenizer divergence would silently pass on
    ASCII corpora and explode on the first Korean document."""
    from ocr_vector_db_spark.plans.inventory import ORACLES

    for name, sql in ORACLES.items():
        if sql is not None:
            assert "[^a-z0-9]+" not in sql, name


def test_tokens_of_korean(spark):
    df = spark.createDataFrame(
        [(1, "OCR 결과를 검증-합니다 test123")], ["id", "text"]
    )
    [row] = df.select(tokens_of(F.col("text")).alias("t")).collect()
    assert row.t == ["ocr", "결과를", "검증", "합니다", "test123"]


def test_detect_language_korean(spark):
    rows = [
        (1, "저는 오늘 학교에 갑니다 그리고 도서관에서 책을 읽었습니다"),
        (2, "the quick brown fox is in the barn and it is fine"),
        (3, "mixed 한국어 and english tokens 123 here"),  # en hits win 4:1
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r.id: r.lang for r in df.select(
        "id", ta.detect_language_col(F.col("text")).alias("lang")).collect()}
    assert got == {1: "ko", 2: "en", 3: "en", 4: "unknown"}
    # pure-python twin agrees
    assert [ta.detect_language(t) for _, t in rows] == ["ko", "en", "en", "unknown"]


def test_bm25_retrieves_korean(spark):
    """A Korean query term actually retrieves Korean documents now."""
    from ocr_vector_db_spark.operators import retrieval

    df = spark.createDataFrame(
        [(1, "검색 엔진 의 기본 구조"), (2, "영어 아닌 다른 내용"),
         (3, "plain english document")],
        ["doc_id", "text"],
    )
    got = retrieval.bm25_scores(df, ["검색"]).collect()
    assert [r.id for r in got] == [1] and got[0].bm25 > 0


def test_korean_reference_shaped_golden_retrieval(spark):
    """Reference-shaped Hangul golden queries, end-to-end (VERDICT r10 #5):
    three entries in the reference's eval format (query / view / language /
    top_k / expect_parent_ids — api/cli/quality.py:32-91) plant into the
    SAME synthesized fixture corpus as q38, evaluate in the same one-batch
    plan alongside all 45 reference queries (realistic noise pool), and
    must pass 3/3 — with the original suites still passing in full. A
    second leg pins the LEXICAL path q38 can't see: the Hangul query terms
    retrieve the planted document through BM25 at rank 1 (expect_contains
    over the ingested fragment corpus).

    Kept as a pytest golden rather than a q38 rewrite: round 11 holds the
    driver window to q150 + the 49 r08-stale names (VERDICT #1 outranks
    #5), and a q38 output change would cost one of those slots."""
    from ocr_vector_db_spark.operators import retrieval
    from ocr_vector_db_spark.plans.golden_corpus import (
        corpus_files,
        evaluate_batch,
        load_suites,
        parent_doc_map,
    )
    from ocr_vector_db_spark.sources.ingest import files_df, ingest

    ko_entries = [
        {"query": "랭체인 검색 파이프라인 구성 요소를 설명한다",
         "view": "text", "top_k": 5, "expect_parent_ids": ["ko-golden-1"]},
        {"query": "임베딩 모델 재시도 정책과 비율 제한 규칙",
         "view": "text", "top_k": 5, "expect_parent_ids": ["ko-golden-2"]},
        {"query": "def 한국어_토큰화(문서): return 문서.split()",
         "view": "code", "language": "python", "top_k": 5,
         "expect_parent_ids": ["ko-golden-3"]},
    ]
    suites = load_suites() + [("korean", ko_entries)]
    out = ingest(spark, files_df(spark, corpus_files(suites)), dim=16)
    res = evaluate_batch(
        spark, suites, out["embeddings"], out["concepts"], dim=16
    )
    got = {r.suite: (r.passed, r.total) for r in res.collect()}
    assert got == {"base": (8, 8), "code": (7, 7), "extended": (30, 30),
                   "korean": (3, 3)}

    # lexical leg: BM25 over the ingested fragments — the planted Korean
    # doc is the top hit for its own query terms
    frags = out["fragments"].select("id", "content", "document_id")
    top = (
        retrieval.bm25_scores(
            frags, ["랭체인", "검색", "파이프라인"],
            id_col="id", text_col="content",
        )
        .orderBy(F.desc("bm25"), "id")
        .limit(1)
        .join(frags.select("id", "document_id"), "id")
        .head()
    )
    expect_docs = parent_doc_map(suites)["ko-golden-1"]
    assert top is not None and top.document_id in expect_docs


def test_bpe_learns_hangul_merges(spark):
    from ocr_vector_db_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [(1, "검색 검색 검색 검색 엔진 엔진 엔진")], ["doc_id", "text"]
    )
    merges, _ = bpe_train(df, 3)
    learned = {(m["la"], m["lb"]) for m in merges}
    # counts 4 vs 3 order the argmax; ties then break on (la, lb) byte
    # order, identical for Hangul (BMP) across Spark and DuckDB
    assert merges[0] == {"step": 1, "la": "검", "lb": "색", "pair_count": 4}
    assert ("엔", "진") in learned
