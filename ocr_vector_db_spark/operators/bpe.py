"""BPE tokenizer TRAINING — iterative merge learning, corpus-scale.

q95 (`functions/text_analysis.bpe_pair_counts`) computes ONE round of
pair statistics; this module runs the full Sennrich et al. (ACL 2016)
training loop. The trick that makes it corpus-size-independent: BPE
training never needs the corpus after the first pass — it iterates on
the WEIGHTED WORD TABLE (Heaps'-law sized: ~1e6 rows for 100 TB of
text), exactly how subword-nmt does it. One corpus-wide aggregation
builds (word, count); every merge iteration is then an aggregation plus
a map over that small table.

Representation: a word's symbol sequence is a delimited string
``<s1><s2>…<_>`` (``_`` is the end-of-word marker; tokens are
[a-z0-9]+ so ``<``/``>``/``_`` can never collide with content). This
makes merge application a LITERAL global string replace —
``replace(sym, '<a><b>', '<ab>')`` — which is exactly canonical BPE:
leftmost, non-overlapping, left-to-right (verified against the naive
list implementation, including same-symbol runs: ``aaaaa`` under (a,a)
→ ``aa aa a``). Both Spark and DuckDB implement literal replace with
identical semantics, so the entire training loop is engine-portable and
q132's oracle replays it stage by stage.

Determinism: the argmax pair breaks ties by (count DESC, left ASC,
right ASC) — byte-order on ASCII, identical across engines — so the
learned merge table is a pure function of the corpus.

Scale shape: one corpus pass (token explode → word count agg, map-side
combinable); then per merge a vocabulary-sized aggregation whose result
is a SINGLE collected row (the argmax — the only driver traffic) and a
map-side replace. The vocab table is cached and re-checkpointed every
few iterations to keep lineage flat. n_merges is the driver-loop bound
(30k in production BPE — still just 30k tiny jobs against a 1e6-row
cached table, independent of the 100 TB behind it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SYM_RE = "<([^<>]+)>"
END = "_"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, cnt): the corpus's weighted word table — the ONE corpus-sized
    pass of BPE training (q65's vocabulary-agg contract)."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"))
            .alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def to_symbols(w: Column) -> Column:
    """'abc' → '<a><b><c><_>' — the delimited symbol-string form."""
    return F.concat(
        F.lit("<"), F.array_join(F.split(w, ""), "><"), F.lit("><" + END + ">")
    )


def _sym_array(sym: Column) -> Column:
    return F.regexp_extract_all(sym, F.lit(SYM_RE), 1)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(la, lb, c): adjacent symbol pairs weighted by word count."""
    arr = _sym_array(F.col("sym"))
    n = F.size(arr)
    pairs = F.zip_with(
        F.slice(arr, 1, n - 1), F.slice(arr, 2, n - 1),
        lambda x, y: F.struct(x.alias("la"), y.alias("lb")),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.la").alias("la"), F.col("p.lb").alias("lb"))
        .agg(F.sum("cnt").alias("c"))
    )


def apply_merge(sym: Column, la: str, lb: str) -> Column:
    """One canonical BPE merge application (literal leftmost
    non-overlapping replace on the delimited form)."""
    return F.replace(
        sym, F.lit(f"<{la}><{lb}>"), F.lit(f"<{la}{lb}>")
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns (merges, final_vocab): merges is the ordered list of
    ``{"step", "la", "lb", "pair_count"}`` dicts (the tokenizer's merge
    table — ≤ n_merges rows, the only data that ever reaches the
    driver: one argmax row per iteration); final_vocab is the word
    table in its post-merge symbol form, reusable for segmentation
    (`bpe_token_counts`). Stops early if the vocabulary runs out of
    pairs (every word fully merged)."""
    spark = docs.sparkSession
    vocab = word_counts(docs, text_col).select(
        to_symbols(F.col("w")).alias("sym"), "cnt"
    )
    vocab = vocab.localCheckpoint()  # pin: pure function of the corpus
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("c"), F.asc("la"), F.asc("lb"))
            .head(1)
        )
        if not top:
            break
        la, lb, c = top[0].la, top[0].lb, int(top[0].c)
        merges.append(
            {"step": step, "la": la, "lb": lb, "pair_count": c}
        )
        vocab = vocab.select(
            apply_merge(F.col("sym"), la, lb).alias("sym"), "cnt"
        )
        if step % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()  # flat lineage, vocab-sized
    return merges, vocab


def merges_df(spark, merges: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        [(m["step"], m["la"], m["lb"], m["pair_count"]) for m in merges],
        "step int, la string, lb string, pair_count bigint",
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens): segment every document with a trained
    merge table and count its BPE tokens.

    Each word occurrence contributes the symbol count of its merged
    form, so the chained replaces run once per DISTINCT word (the
    Heaps-sized vocabulary, broadcast back onto per-doc occurrence
    counts) — never once per occurrence. Merge order is preserved."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"))
        .alias("w"),
    ).filter(F.col("w") != "")
    sym = to_symbols(F.col("w"))
    for m in merges:
        sym = apply_merge(sym, m["la"], m["lb"])
    seg = words.select("w").distinct().select(
        "w", F.size(_sym_array(sym)).alias("n_sym")
    )
    occ = words.groupBy(id_col, "w").agg(F.count("*").alias("occ"))
    return (
        occ.join(F.broadcast(seg), "w")
        .groupBy(id_col)
        .agg(
            F.sum("occ").cast("bigint").alias("n_words"),
            F.sum(F.col("occ") * F.col("n_sym")).cast("bigint")
            .alias("n_bpe_tokens"),
        )
    )
