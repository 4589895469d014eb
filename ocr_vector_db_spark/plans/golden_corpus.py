"""Reference golden-corpus port — the 45 golden queries the reference treats
as its de-facto correctness contract (eval_queries.jsonl 8, eval_queries_code
.jsonl 7, eval_queries_extended.jsonl 30; runner api/cli/quality.py:21-91).

The reference's entries expect parent UUIDs from its own ingested PDF corpus,
which is not available here. The corpus is therefore synthesized: one fixture
document per (reference parent id, planted snippet), each containing exactly
that query's snippet (code-view snippets inside fenced blocks so the
unitizer assigns view='code'; python-language snippets in ```python fences so
the language filter matches). The expected-hit mapping is re-keyed from the
reference UUID to the set of fixture `document_id(path)`s planted for it, and
queries are hash-embedded after the same text normalization ingest applies —
the whole-string hash embedder has no semantic smoothing, so the planted
fragment matches its query at similarity exactly 1.0 and anything else is
noise; a pass therefore certifies the full pipeline (parser pass-through,
unitization, view/lang tagging, eligibility, embedding join, per-query
top-k), which is the strongest retrieval contract a deterministic stand-in
embedder can express.

Scale shape: the whole 45-query evaluation is ONE batch plan — the query
table (45 rows, embedded driver-side with the deterministic hash embedder) is
broadcast against a single corpus scan, per-query view/language predicates
ride the join condition, and a row_number window per query_id applies each
query's own top_k. The per-query sequential runner (`plans/quality.evaluate`,
the api/cli/quality.py-shaped loop) stays for API parity; this module is the
form you'd run over a 100 TB corpus: no driver-side loop issuing N jobs.
"""

from __future__ import annotations

import json
import os
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_vector_db_spark.functions import hashing
from ocr_vector_db_spark.functions.text import normalize
from ocr_vector_db_spark.functions.vector import cosine_similarity_col, embed_text

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
GOLDEN_DIR = os.path.join(_REPO_ROOT, "tests", "golden", "reference")

SUITES = [
    ("base", "eval_queries.jsonl"),
    ("code", "eval_queries_code.jsonl"),
    ("extended", "eval_queries_extended.jsonl"),
]

SIM_PRECISION = 6


def load_suites(golden_dir: str = GOLDEN_DIR) -> list[tuple[str, list[dict]]]:
    """[(suite_name, [entry, ...])] in file order; entry format is the
    reference's: query / view / language / top_k / expect_parent_ids."""
    out = []
    for suite, fname in SUITES:
        entries = []
        with open(os.path.join(golden_dir, fname), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    entries.append(json.loads(line))
        out.append((suite, entries))
    return out


def _ref_parents(suites: list[tuple[str, list[dict]]]) -> list[str]:
    """Distinct reference parent ids, first-appearance order (deterministic)."""
    seen: list[str] = []
    for _, entries in suites:
        for e in entries:
            for p in e.get("expect_parent_ids") or []:
                if p not in seen:
                    seen.append(p)
    return seen


def _snippet_path(p_idx: int, s_idx: int, ref_parent: str) -> str:
    return f"/corpus/golden/p{p_idx:02d}_s{s_idx}_{ref_parent[:8]}.md"


def _planted(suites: list[tuple[str, list[dict]]]) -> tuple[list[str], dict[str, list[str]]]:
    """(distinct ref parents, parent -> ordered distinct planted blocks).

    One block per (query, view) — code snippets fenced so the unitizer
    assigns view='code' with the query's language; text snippets bare."""
    parents = _ref_parents(suites)
    planted: dict[str, list[str]] = {p: [] for p in parents}
    for _, entries in suites:
        for e in entries:
            q = e["query"]
            lang = e.get("language")
            if e.get("view") == "code":
                block = f"```{lang or ''}\n{q}\n```"
            else:
                block = q
            for p in e.get("expect_parent_ids") or []:
                if block not in planted[p]:
                    planted[p].append(block)
    return parents, planted


def corpus_files(suites: list[tuple[str, list[dict]]]) -> list[tuple[str, str, str]]:
    """Fixture corpus: one markdown doc per (reference parent, planted
    snippet), each doc containing exactly that snippet. After ingest the
    snippet survives as a standalone fragment whose content equals the
    normalized query text, so the expected doc ranks #1 with similarity 1.0
    under the deterministic whole-string hash embedder — the eval then
    verifies the full pipeline (normalization, unitization pass-through,
    view/lang tagging, embedding join, per-query top-k) rather than noise
    ranking in a small pool."""
    parents, planted = _planted(suites)
    return [
        (_snippet_path(i, j, p), block + "\n", "md")
        for i, p in enumerate(parents)
        for j, block in enumerate(planted[p])
    ]


def parent_doc_map(suites: list[tuple[str, list[dict]]]) -> dict[str, list[str]]:
    """reference parent UUID -> fixture document_ids (hashes of planted paths)."""
    parents, planted = _planted(suites)
    return {
        p: [hashing.document_id(_snippet_path(i, j, p)) for j in range(len(planted[p]))]
        for i, p in enumerate(parents)
    }


def golden_queries_df(spark: SparkSession, suites, dim: int = 16) -> DataFrame:
    """45-row broadcastable query table: suite, qid, view/language predicates,
    per-query top_k, expected fixture document_id, hash embedding."""
    doc_map = parent_doc_map(suites)
    rows = []
    qid = 0
    for suite, entries in suites:
        for e in entries:
            expect = [
                d for p in (e.get("expect_parent_ids") or []) for d in doc_map[p]
            ]
            rows.append((
                suite, qid, e.get("view"), e.get("language"),
                int(e.get("top_k", 10)), expect,
                # Normalize the query through the same text pipeline ingest
                # applies to content (fullwidth→ASCII, OCR fixes): the
                # deterministic hash embedder has no semantic smoothing, so
                # raw-vs-normalized text would diverge where a real embedding
                # provider (the reference's search path) would not.
                embed_text(normalize(e["query"]), dim),
            ))
            qid += 1
    return spark.createDataFrame(
        rows,
        "suite string, qid int, q_view string, q_lang string, top_k int, "
        "expect_doc_ids array<string>, q_emb array<double>",
    )


def evaluate_batch(
    spark: SparkSession,
    suites,
    embeddings: DataFrame,
    concepts: DataFrame,
    dim: int = 16,
) -> DataFrame:
    """Per-suite pass counts for all golden queries in one plan.

    corpus scan ⋈ broadcast(queries) with per-query view/language predicates
    → per-qid row_number ≤ that query's top_k → hit iff any retained row's
    document_id ∈ expect_doc_ids → suite rollup. Mirrors the hit criterion of
    api/cli/quality.py:60-84 (any result's parent in expect_parent_ids),
    re-keyed to fixture document ids."""
    queries = golden_queries_df(spark, suites, dim)
    corpus = embeddings.join(
        F.broadcast(concepts.select(F.col("id").alias("parent_id"), "document_id")),
        "parent_id",
    ).select("doc_id", "document_id", "view", "lang", "embedding")
    joined = corpus.join(
        F.broadcast(queries),
        (F.col("q_view").isNull() | (F.col("view") == F.col("q_view")))
        & (F.col("q_lang").isNull() | (F.col("lang") == F.col("q_lang"))),
    )
    sim = F.round(
        cosine_similarity_col(F.col("embedding"), F.col("q_emb")), SIM_PRECISION
    )
    w = Window.partitionBy("qid").orderBy(F.desc("similarity"), F.col("doc_id"))
    ranked = (
        joined.withColumn("similarity", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("top_k"))
    )
    hits = ranked.groupBy("qid").agg(
        F.max(
            F.array_contains(F.col("expect_doc_ids"), F.col("document_id")).cast("int")
        ).alias("hit")
    )
    # Left join back onto the full query table: a query whose view/language
    # predicate matched zero corpus rows still counts toward its suite total.
    per_q = (
        queries.select("suite", "qid")
        .join(hits, "qid", "left")
        .withColumn("hit", F.coalesce(F.col("hit"), F.lit(0)))
    )
    return (
        per_q.groupBy("suite")
        .agg(F.sum("hit").alias("passed"), F.count("*").alias("total"))
        .orderBy("suite")
    )
