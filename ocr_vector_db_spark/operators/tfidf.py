"""TF-IDF vocabulary statistics — corpus-wide term weighting at scale.

An LLM-data-pipeline staple the reference's text stack stops short of
(its analysis ends at per-document heuristics, embedding/validators.py +
shared/text_utils.py): corpus vocabulary, document frequency, and TF-IDF
top terms per document — the classic signals for keyword extraction,
boilerplate discovery, and quality filtering over a crawl.

Spark-first shape (all built-in expressions, zero UDFs):

  words:    lower + regexp split → explode. Map-only.
  tf:       groupBy(doc, word).count — partial+final hash agg, the shuffle
            carries (doc, word, partial count) not raw text.
  df:       groupBy(word).count over distinct (doc, word) — piggybacks on
            the tf aggregate (already one row per (doc, word)), so the
            second shuffle is #vocab-sized.
  tfidf:    tf · (ln((1+N)/(1+df)) + 1) — sklearn's smooth idf; N is a
            scalar (one count), df joins back on word. The word→df join is
            broadcast-able whenever the vocabulary fits (natural-language
            vocab grows ~O(sqrt(corpus)) — Heaps' law — so at 100 TB the
            vocab side is still small relative to the corpus).
  top-k:    row_number over (doc) ordered by (tfidf desc, word) — per-doc
            heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ocr_vector_db_spark.functions.tokenize import TOKEN_SPLIT_RE, tokens_of

WORD_SPLIT_RE = TOKEN_SPLIT_RE  # the ONE shared splitter (functions/tokenize.py)


def words_col(text: Column) -> Column:
    """Lowercased word array (empties filtered) — ASCII alnum + Hangul."""
    return tokens_of(text)


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, word, tf) — raw term counts per document."""
    return (
        docs.select(F.col(id_col), F.explode(words_col(F.col(text_col))).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("tf"))
    )


def tfidf(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, word, tf, df, tfidf) with tfidf = tf · (ln((1+N)/(1+df)) + 1).

    Integer tf/df keep every aggregate exact (order-independent); the only
    float op is the final scalar-per-row multiply."""
    tf = term_frequencies(docs, id_col, text_col)
    n_docs = docs.select(id_col).distinct().count()
    df_ = tf.groupBy("word").agg(F.count("*").alias("df"))
    return (
        tf.join(F.broadcast(df_), "word")
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((1.0 + n_docs) / (1.0 + F.col("df"))) + F.lit(1.0)),
                6,
            ),
        )
        .select(id_col, "word", "tf", "df", "tfidf")
    )


def top_terms_per_doc(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF (ties on word)."""
    scored = tfidf(docs, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "word", "tf", "df", "tfidf")
    )
