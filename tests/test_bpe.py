"""BPE training (operators/bpe.py): the delimited-string merge must be
EXACTLY canonical BPE (leftmost, non-overlapping, left-to-right), the
learned merge table must be deterministic, and segmentation must agree
with a naive reference implementation word-for-word."""

from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.bpe import (
    END,
    apply_merge,
    bpe_token_counts,
    bpe_train,
    to_symbols,
    word_counts,
)


def _naive_merge(syms: list[str], la: str, lb: str) -> list[str]:
    """Reference canonical BPE merge on a symbol list."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == la and syms[i + 1] == lb:
            out.append(la + lb)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _naive_train(words: dict[str, int], n_merges: int):
    """Reference subword-nmt-style trainer on a weighted word dict."""
    vocab = {w: list(w) + [END] for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple, int] = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + words[w]
        if not counts:
            break
        (la, lb), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, la, lb, c))
        vocab = {w: _naive_merge(s, la, lb) for w, s in vocab.items()}
    return merges, vocab


def test_apply_merge_is_canonical_leftmost(spark):
    # same-symbol runs are the adversarial case: 'aaaaa' under (a,a)
    # must become [aa, aa, a], never [a, aa, aa] or [aa, a, aa].
    cases = [
        ("aaaaa", "a", "a", ["aa", "aa", "a", END]),
        ("abab", "a", "b", ["ab", "ab", END]),
        ("aab", "a", "b", ["a", "ab", END]),
        ("banana", "a", "n", ["b", "an", "an", "a", END]),
    ]
    df = spark.createDataFrame([(w,) for w, *_ in cases], "w string")
    sym = to_symbols(F.col("w"))
    got = {}
    for w, la, lb, _want in cases:
        merged = apply_merge(sym, la, lb)
        row = df.filter(F.col("w") == w).select(
            F.regexp_extract_all(merged, F.lit("<([^<>]+)>"), 1).alias("s")
        ).head()
        got[w] = row.s
    for w, la, lb, want in cases:
        assert got[w] == want, (w, la, lb, got[w], want)


def test_bpe_train_matches_naive_reference(spark, tables):
    docs = tables["documents"].limit(60)
    merges, _vocab = bpe_train(docs, 12)

    wc = {r.w: r.cnt for r in word_counts(docs).collect()}
    want_merges, want_vocab = _naive_train(wc, 12)
    assert [(m["step"], m["la"], m["lb"], m["pair_count"]) for m in merges] \
        == want_merges

    # final vocabulary symbol forms agree word-for-word (re-derive by
    # chaining the learned merges, the same path bpe_token_counts takes)
    sym = to_symbols(F.col("w"))
    for m in merges:
        sym = apply_merge(sym, m["la"], m["lb"])
    redo = {
        r.w: r.s
        for r in docs.sparkSession.createDataFrame(
            [(w,) for w in wc], "w string"
        ).select("w", F.regexp_extract_all(sym, F.lit("<([^<>]+)>"), 1)
                 .alias("s")).collect()
    }
    for w, syms in want_vocab.items():
        assert redo[w] == syms, (w, redo[w], syms)


def test_bpe_train_deterministic(spark, tables):
    docs = tables["documents"].limit(40)
    a, _ = bpe_train(docs, 8)
    b, _ = bpe_train(docs, 8)
    assert a == b


def test_token_counts_consistency(spark, tables):
    docs = tables["documents"].limit(40)
    merges, _ = bpe_train(docs, 8)
    out = bpe_token_counts(docs, merges).collect()
    wc = {r.w: r.cnt for r in word_counts(docs).collect()}
    _, vocab = _naive_train(wc, 8)

    # zero merges → every word contributes len(word)+1 symbols
    base = {r[0]: (r.n_words, r.n_bpe_tokens)
            for r in bpe_token_counts(docs, []).collect()}
    rows = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z0-9가-힣]+")).alias("w"),
    ).filter(F.col("w") != "").collect()
    want_base: dict[str, list[int]] = {}
    want_merged: dict[str, list[int]] = {}
    for r in rows:
        want_base.setdefault(r.doc_id, [0, 0])
        want_base[r.doc_id][0] += 1
        want_base[r.doc_id][1] += len(r.w) + 1
        want_merged.setdefault(r.doc_id, [0, 0])
        want_merged[r.doc_id][0] += 1
        want_merged[r.doc_id][1] += len(vocab[r.w])
    assert base == {k: tuple(v) for k, v in want_base.items()}
    assert {r[0]: (r.n_words, r.n_bpe_tokens) for r in out} \
        == {k: tuple(v) for k, v in want_merged.items()}
    # merging never increases token count
    for k in base:
        assert dict((r[0], r.n_bpe_tokens) for r in out)[k] <= base[k][1]


def test_bpe_early_stop_on_exhausted_vocab(spark):
    # single 1-char word: symbols are [c, _]; one merge exhausts all pairs
    docs = spark.createDataFrame([("d1", "x x x")], "doc_id string, text string")
    merges, _ = bpe_train(docs, 10)
    assert [(m["la"], m["lb"]) for m in merges] == [("x", END), ]


def test_tokenizer_artifact_extend_equals_scratch(spark, tables, tmp_path):
    from ocr_vector_db_spark.operators.bpe import BPETokenizer
    from ocr_vector_db_spark.operators.index_maint import (
        committed_generations,
    )

    docs = tables["documents"].limit(50)
    path = str(tmp_path / "tok")
    tok = BPETokenizer.build(spark, docs, path, 6)
    assert len(tok.merges()) == 6
    tok.extend(6)
    got = tok.merges()
    want, _ = bpe_train(docs, 12)
    assert got == want  # build+extend ≡ one-shot training, byte-identical

    # atomic pair: one generation root, two committed generations, GC ≤ 2
    gens = committed_generations(spark, path + "/state")
    assert gens == [1, 2]
    tok.extend(2)
    assert committed_generations(spark, path + "/state") == [2, 3]

    # segmentation from the stored table ≡ segmentation from the list
    a = {r[0]: (r.n_words, r.n_bpe_tokens)
         for r in tok.token_counts(docs).collect()}
    b = {r[0]: (r.n_words, r.n_bpe_tokens)
         for r in bpe_token_counts(docs, tok.merges()).collect()}
    assert a == b


def test_cli_tokenizer_roundtrip(spark, tmp_path, capsys):
    import json

    from ocr_vector_db_spark import cli

    src = tmp_path / "tok_src"
    src.mkdir()
    store = str(tmp_path / "store")
    with open(src / "a.json", "w") as fh:
        for i in range(6):
            fh.write(json.dumps(
                {"doc_id": i,
                 "text": f"fresh distinct narrative {i} covering theme "
                         f"{i * 13} in original words {i * 7}"}) + "\n")
    assert cli.main(["stream-ingest", "--store", store, "--source",
                     str(src), "--threshold", "0.6", "--buckets", "8"]) == 0
    capsys.readouterr()
    assert cli.main(["tokenizer", "--store", store, "--train", "5"]) == 0
    assert "trained 5 merges" in capsys.readouterr().out
    assert cli.main(["tokenizer", "--store", store, "--extend", "3"]) == 0
    assert "extended to 8 merges" in capsys.readouterr().out
    batch = tmp_path / "batch.jsonl"
    with open(batch, "w") as fh:
        fh.write(json.dumps({"doc_id": 99, "text": "fresh words"}) + "\n")
    assert cli.main(["tokenizer", "--store", store,
                     "--count", str(batch)]) == 0
    out = capsys.readouterr().out
    assert "counted 1 docs" in out and out.startswith("99\t2\t")
    assert cli.main(["tokenizer", "--store", store]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 8 and lines[0].startswith("1\t")


def test_pandas_segmentation_path_equals_expression_path(spark, tables):
    """The constant-plan-size Arrow path (production merge tables past
    MAX_EXPR_MERGES) must be byte-identical to the expression chain."""
    from ocr_vector_db_spark.operators import bpe as bpe_mod
    from ocr_vector_db_spark.operators.bpe import (
        _seg_counts_expr,
        _seg_counts_pandas,
    )

    docs = tables["documents"].limit(60)
    merges, _ = bpe_train(docs, 15)
    words = docs.select(
        F.explode(F.split(F.lower("text"), "[^a-z0-9가-힣]+")).alias("w")
    ).filter(F.col("w") != "")
    a = {r.w: r.n_sym for r in _seg_counts_expr(words, merges).collect()}
    b = {r.w: r.n_sym for r in _seg_counts_pandas(words, merges).collect()}
    assert a == b

    # the dispatch itself: force the pandas path and compare end-to-end
    old = bpe_mod.MAX_EXPR_MERGES
    try:
        bpe_mod.MAX_EXPR_MERGES = 0
        via_pandas = {r[0]: (r.n_words, r.n_bpe_tokens)
                      for r in bpe_token_counts(docs, merges).collect()}
    finally:
        bpe_mod.MAX_EXPR_MERGES = old
    via_expr = {r[0]: (r.n_words, r.n_bpe_tokens)
                for r in bpe_token_counts(docs, merges).collect()}
    assert via_pandas == via_expr
