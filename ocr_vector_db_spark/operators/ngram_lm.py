"""Corpus n-gram statistics: PMI collocation mining and a smoothed
bigram language model for perplexity-style quality filtering.

Reference parity: the reference scores document quality with heuristic
ratios (shared/text_utils.py) and the unigram cross-entropy twin lives at
q82; these are the next rung a training-data pipeline actually runs —
CCNet-style LM filtering (Wenzek et al., 2020, uses a 5-gram KenLM; the
honest distributed re-expression is an add-one-smoothed bigram LM fit on
the corpus itself) and PMI collocation extraction (Church & Hanks, 1990)
for tokenizer/phrase-vocabulary induction.

Scale shape (100 TB):
  * The token stream is derived once per caller via `F.filter` over the
    split array — empty tokens are dropped INSIDE the array before
    explosion, so bigram adjacency is position-exact without a window
    or self-join (the zip of the array against itself shifted by one is
    per-row, shuffle-free).
  * Unigram counts are Heaps'-law sized (~vocab) → broadcast back onto
    whatever needs them. Bigram counts are NOT broadcastable at corpus
    scale → the per-doc scoring join stays a shuffle equi-join on the
    pair key, which AQE can skew-split (stopword-pair keys are the hot
    ones).
  * PMI top-k is an orderBy+limit → TakeOrderedAndProject, never a full
    sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ocr_vector_db_spark.functions.tokenize import TOKEN_SPLIT_RE, tokens_of

TOKEN_SPLIT = TOKEN_SPLIT_RE  # the ONE shared splitter (functions/tokenize.py)


def _tokens_arr(text: Column) -> Column:
    """lowercase word tokens as an array, empties removed in-array (so
    element positions are adjacency-exact)."""
    return tokens_of(text)


def adjacent_bigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, tok_a, tok_b): every adjacent token pair per document —
    the array zipped against itself shifted by one, per-row and
    shuffle-free. Docs with < 2 tokens contribute no rows."""
    tk = _tokens_arr(F.col(text_col))
    n = F.greatest(F.size(tk) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(tk, 1, n),
        F.slice(tk, 2, n),
        lambda a, b: F.struct(a.alias("tok_a"), b.alias("tok_b")),
    )
    return docs.select(
        id_col, F.explode(pairs).alias("__p")
    ).select(id_col, "__p.tok_a", "__p.tok_b")


def _unigram_counts(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(tok, cnt) corpus unigram counts over the same token stream."""
    return (
        docs.select(F.explode(_tokens_arr(F.col(text_col))).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("cnt"))
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """(tok_a, tok_b, pair_count, pmi): the corpus's strongest adjacent
    collocations by pointwise mutual information,
    pmi = ln p(a,b) − ln p(a) − ln p(b), evaluated on exact integer
    counts as ln(c_ab) − ln(N_pairs) − ln(c_a) − ln(c_b) + 2·ln(N_tok)
    (one association order, reproducible across engines), rounded to 6
    dp. `min_count` suppresses the low-count PMI explosion (a pair seen
    once between two hapaxes maximizes PMI by construction — Church &
    Hanks' standard floor); `top_k` rows by (pmi desc, tok_a, tok_b), a
    deterministic total order since the pair IS the key.

    Plan: two count aggs (bigram, unigram) + one broadcast of the
    unigram table onto the (already aggregated, vocab²-bounded) bigram
    counts — the corpus token stream is scanned twice and never joined
    row-level. Scalars N_tok/N_pairs fold in as literals from the
    vocab-sized aggregates."""
    bg = adjacent_bigrams(docs, text_col, id_col)
    # cached for three consumers (n_tok agg + two broadcast joins) and
    # RELEASED before returning — the result below is localCheckpoint-
    # materialized (≤ top_k rows), so repeated calls leak nothing
    uni = _unigram_counts(docs, text_col, id_col).cache()
    n_tok = float(uni.agg(F.sum("cnt")).head()[0])
    bgc = (
        bg.groupBy("tok_a", "tok_b").agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    # N_pairs must count ALL bigrams (incl. sub-min_count ones): Σ per-doc
    # (n_tokens - 1) from the unigram-side stats would need doc grouping;
    # cheaper exact form — total tokens minus number of docs with ≥1 token
    n_docs_with_tok = float(
        docs.select(
            F.size(_tokens_arr(F.col(text_col))).alias("__n")
        ).filter(F.col("__n") > 0).count()
    )
    n_pairs = n_tok - n_docs_with_tok
    ua = uni.select(F.col("tok").alias("tok_a"), F.col("cnt").alias("__ca"))
    ub = uni.select(F.col("tok").alias("tok_b"), F.col("cnt").alias("__cb"))
    pmi = F.round(
        F.log(F.col("pair_count").cast("double"))
        - F.log(F.lit(n_pairs))
        - F.log(F.col("__ca").cast("double"))
        - F.log(F.col("__cb").cast("double"))
        + F.lit(2.0) * F.log(F.lit(n_tok)),
        6,
    )
    out = (
        bgc.join(F.broadcast(ua), "tok_a")
        .join(F.broadcast(ub), "tok_b")
        .select("tok_a", "tok_b", "pair_count", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "tok_a", "tok_b")
        .limit(top_k)
    )
    if materialize:
        # eager: pin the (≤ top_k-row) result and release the cache —
        # repeated calls leak nothing. materialize=False hands back the
        # LAZY plan (uni stays cached for its consumers) for plan
        # inspection / further composition.
        out = out.localCheckpoint()
        uni.unpersist()
    return out


def bigram_cross_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, n_bigrams, avg_neg_logprob): each document's cross-entropy
    under the corpus's add-one-smoothed bigram LM,
    p(b|a) = (c(ab) + 1) / (c(a) + V) — the distributed stand-in for
    CCNet's KenLM perplexity filter (low = boilerplate, high = noise;
    keep the mid band). Docs with < 2 tokens have no bigrams and emit no
    row (they carry no bigram evidence either way).

    Plan: the per-doc bigram stream joins the bigram-count table on the
    pair key — a shuffle equi-join, NOT a broadcast (bigram vocab at
    corpus scale is too large; stopword-pair skew is AQE's job) — and
    the unigram context counts arrive broadcast. The per-row -ln p is
    rounded to 6 dp BEFORE the decimal sum so the per-doc average is
    order-independent and engine-reproducible (q82's discipline)."""
    bg = adjacent_bigrams(docs, text_col, id_col)
    # deliberately uncached: the result below is corpus-sized (one row
    # per doc), so a checkpoint-then-unpersist would materialize the
    # whole output just to free the vocab table — recomputing the
    # Heaps'-sized unigram agg once (count here, join below) is cheaper
    # than pinning it for the session (q117's leak finding)
    uni = _unigram_counts(docs, text_col, id_col)
    v = float(uni.count())
    bgc = bg.groupBy("tok_a", "tok_b").agg(F.count("*").alias("__cab"))
    ua = uni.select(F.col("tok").alias("tok_a"), F.col("cnt").alias("__ca"))
    nlp = F.round(
        -F.log(
            (F.col("__cab") + F.lit(1)).cast("double")
            / (F.col("__ca") + F.lit(v)).cast("double")
        ),
        6,
    )
    scored = (
        bg.join(bgc, ["tok_a", "tok_b"])
        .join(F.broadcast(ua), "tok_a")
        .select(id_col, nlp.alias("__nlp"))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(
            F.sum(F.col("__nlp").cast("decimal(28,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_neg_logprob"),
    )
