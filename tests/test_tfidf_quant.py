"""TF-IDF vocabulary stats and int8 scalar quantization."""

import math

from pyspark.sql import functions as F

from ocr_vector_db_spark.functions.vector import int8_cosine_col, quantize_int8_col
from ocr_vector_db_spark.operators.tfidf import term_frequencies, tfidf, top_terms_per_doc


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the log"),
            (3, "quantum entanglement of the cat"),
        ],
        ["doc_id", "text"],
    )


def test_term_frequencies_counts(spark):
    tf = {
        (r.doc_id, r.word): r.tf
        for r in term_frequencies(_docs(spark)).collect()
    }
    assert tf[(1, "the")] == 2
    assert tf[(1, "cat")] == 1
    assert (3, "entanglement") in tf


def test_tfidf_weights_rare_terms_higher(spark):
    rows = {(r.doc_id, r.word): r for r in tfidf(_docs(spark)).collect()}
    # 'the' appears in all 3 docs -> idf = ln(4/4)+1 = 1
    the = rows[(1, "the")]
    assert the.df == 3 and abs(the.tfidf - 2.0) < 1e-6
    # 'quantum' appears once -> idf = ln(4/2)+1
    q = rows[(3, "quantum")]
    assert q.df == 1 and abs(q.tfidf - (math.log(2.0) + 1.0)) < 1e-5


def test_top_terms_rank_and_ties(spark):
    top = top_terms_per_doc(_docs(spark), k=2).collect()
    by_doc = {}
    for r in top:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        assert [r.rank for r in rs] == [1, 2]
        assert rs[0].tfidf >= rs[1].tfidf
    # doc 3: all words tie at tf=1 except 'the'; ties break alphabetically
    assert by_doc[3][0].word == "entanglement"


def test_int8_quantization_bounds_and_cosine(spark, tables):
    e = tables["embeddings"].limit(50).withColumn(
        "codes", quantize_int8_col(F.col("embedding"))
    )
    rows = e.collect()
    for r in rows:
        assert all(-127 <= c <= 127 for c in r.codes)
        assert max(abs(c) for c in r.codes) == 127  # scale hits the max component
    # quantized self-cosine is 1.0; cross-cosine tracks exact within ~1e-2
    from ocr_vector_db_spark.functions.vector import cosine_similarity_col

    a = e.select(
        int8_cosine_col(F.col("codes"), F.col("codes")).alias("self_q"),
        cosine_similarity_col(F.col("embedding"), F.col("embedding")).alias("self_e"),
    ).collect()
    assert all(abs(r.self_q - 1.0) < 1e-9 for r in a)


def test_int8_zero_vector_safe(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], ["id", "v"])
    out = df.select(quantize_int8_col(F.col("v")).alias("codes")).head()
    assert list(out.codes) == [0, 0, 0]
