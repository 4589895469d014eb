"""Deduplication family for training-data pipelines.

Five strategies, all shuffle-aware:

- exact:      md5 fingerprint groupBy — one shuffle on the 32-hex key, keeps
              the min-id representative per group (deterministic).
- ngram jaccard: token/shingle inverted-index join — explode to (token, doc),
              self-join on token (co-occurrence counts), jaccard from per-doc
              distinct counts. Shuffles on token; hot tokens are the skew
              risk → AQE skew-join handles it, or pre-filter stop-shingles.
- minhash:    K independent md5-derived hash slots → per-doc signature → LSH
              banding → candidate pairs join on (band, band_hash). Only
              same-bucket pairs are compared: the O(n²) never materializes.
- simhash:    B-bit majority-vote signature per doc; near-dup = signature
              hamming distance ≤ r (compared on exact bucket here; split-band
              variant for r>0 at scale).
- embedding:  cosine near-dup pairs, blocked by a coarse key (IVF cluster /
              label) so the self-join is per-block, not global.

Every step is built-in expressions — md5, split, explode, groupBy — no Python
in the row path, so the whole family runs in whole-stage codegen and scales
linearly with a single shuffle per logical step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_vector_db_spark.functions.text_analysis import fingerprint_col, tokens_col

# ------------------------------------------------------------------ exact


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of exact duplicates (normalized-text md5): one row per group
    with ≥2 members: (fingerprint, n_dups, keep_id = min id)."""
    return (
        df.select(fingerprint_col(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") >= 2)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one (min-id) row per distinct normalized text."""
    w_min = (
        df.select(F.col(id_col), fingerprint_col(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w_min, id_col, "left_semi")


# ------------------------------------------------------------ ngram jaccard


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct n-gram (word-shingle) set per document.

    Two deliberate physical choices:
    - spread first (adaptive, r15): a small parquet file arrives as ONE
      input split, and the shingle explosion is the expensive stage —
      spread the (id, text) projection across the cluster before fanning
      out; on an already-parallel input the spread is a no-op, so no
      shuffle of the corpus text is ever added at scale;
    - materialize the token array behind a projection boundary: referencing
      the split() expression inside the transform lambda would re-tokenize
      the document once per shingle (O(tokens²) work)."""
    from ocr_vector_db_spark.session import spread_for_compute

    toked = spread_for_compute(df.select(id_col, text_col)).select(
        F.col(id_col).alias("doc"), tokens_col(F.lower(F.col(text_col))).alias("toks")
    )
    toks = F.col("toks")
    if n == 1:
        sh = toks
    else:
        # element_at chain instead of slice()+array_join(): O(1) lookups, no
        # per-shingle array allocation in the codegen'd loop.
        # guard: sequence(1, 0) would produce a DESCENDING [1, 0] in Spark,
        # so documents shorter than n tokens get an empty shingle set instead
        shingles = F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
            ),
        )
        sh = F.when(F.size(toks) >= n, shingles).otherwise(F.array().cast("array<string>"))
    return toked.select("doc", F.explode(sh).alias("shingle")).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All document pairs (a < b) with shingle-set Jaccard ≥ threshold.

    Inverted-index join: pairs are only generated for docs sharing ≥1 shingle,
    so complexity follows shingle co-occurrence, not n². Returns
    (doc_a, doc_b, jaccard) with jaccard rounded to 6 dp."""
    sh = _doc_shingles(df, text_col, id_col, n).cache()
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    co = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .filter(F.col("x.doc") < F.col("y.doc"))
        .groupBy(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    out = (
        co.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------- minhash


def _hash_slot(shingle_col, slot: int):
    """Deterministic hash for MinHash slot `slot`: first 15 hex chars of the
    salted md5. Kept as a STRING -- fixed-length lowercase hex compares
    lexicographically exactly like its numeric value, and md5+string-min is
    portable across engines (unlike xxhash64 seeds or hex-to-int conversions),
    so the SQL oracle can reproduce signatures bit-for-bit."""
    return F.substring(F.md5(F.concat(F.lit(str(slot)), shingle_col)), 1, 15)


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc, mh_0..mh_{K-1}) MinHash signature from n-token shingles.

    Each slot agg is ONE generated-SQL parse (the q33/q66/PQ/simhash_col
    precedent, guide §5): the per-slot `F.min(F.substring(F.md5(...)))`
    chain cost ~6 Py4J round trips per slot to BUILD; the expression
    tree and the slot definition (`_hash_slot`) are unchanged — pinned
    by the q20/q105 oracles, which recompute the signatures in SQL."""
    sh = _doc_shingles(df, text_col, id_col, n)
    aggs = [
        F.expr(
            f"min(substring(md5(concat('{i}', shingle)), 1, 15)) AS mh_{i}"
        )
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc").agg(*aggs)


def banded_of(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc, band_id, band_hash) LSH banding rows from a signature table —
    the ONE definition of the band layout, shared by the in-memory
    candidate join and the persisted MinHashIndex."""
    rows_per_band = num_hashes // bands
    # one generated-SQL parse for the whole band array (guide §5) —
    # identical structure: band_hash = md5 over the comma-joined,
    # string-cast slot values of the band's rows
    band_structs = F.expr(
        "array(" + ", ".join(
            "named_struct('band_id', {b}, 'band_hash', "
            "md5(concat_ws(',', {cols})))".format(
                b=b,
                cols=", ".join(
                    f"cast(mh_{b * rows_per_band + r} as string)"
                    for r in range(rows_per_band)
                ),
            )
            for b in range(bands)
        ) + ")"
    )
    return sig.select("doc", F.explode(band_structs).alias("band")).select(
        "doc", "band.band_id", "band.band_hash"
    )


def minhash_lsh_candidates(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding + estimated Jaccard.

    Signature split into `bands` bands of num_hashes/bands rows; docs agreeing
    on any whole band become candidates (join on (band_id, band_hash) — the
    only shuffle that touches pairs). Estimated Jaccard = fraction of agreeing
    signature slots. Returns (doc_a, doc_b, est_jaccard)."""
    assert num_hashes % bands == 0
    sig = minhash_signatures(df, num_hashes, n, text_col, id_col).cache()
    return candidates_from_signatures(sig, num_hashes, bands)


def candidates_from_signatures(
    sig: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard) candidate pairs from a signature table —
    the band self-join half of `minhash_lsh_candidates`, split out so the
    collapsed-components path can run it over representatives only."""
    # The banding join stays SLIM — (doc, band_id, band_hash) only — so the
    # pair-generating shuffle carries 3 columns, not the whole signature.
    # Signatures re-attach afterwards via two joins against the (small,
    # one-row-per-doc) signature table. At 100 TB the signature table is
    # orders of magnitude smaller than the shingle explosion, and the only
    # pair-sized data in flight is the candidate id pairs themselves.
    banded = banded_of(sig, num_hashes, bands)

    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(y, ["band_id", "band_hash"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # selectExpr / generated-SQL: the 2x16-column alias selects and the
    # 16-term agreement sum are single parses instead of ~100 Py4J
    # round trips (guide §5); same columns, same CASE-WHEN sum, same
    # double division and 6-dp round (the D suffix keeps the divisor a
    # DOUBLE literal exactly like F.lit(float(num_hashes)))
    sig_a = sig.selectExpr(
        "doc AS doc_a", *[f"mh_{i} AS a_{i}" for i in range(num_hashes)]
    )
    sig_b = sig.selectExpr(
        "doc AS doc_b", *[f"mh_{i} AS b_{i}" for i in range(num_hashes)]
    )
    agree_sql = " + ".join(
        f"(CASE WHEN a_{i} = b_{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    est = F.expr(
        f"round((0 + {agree_sql}) / {float(num_hashes)!r}D, 6)"
    )
    return (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn("est_jaccard", est)
        .select("doc_a", "doc_b", "est_jaccard")
    )


# ----------------------------------------------------------------- simhash


ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def simhash_col(text_col, bits: int = 16):
    """B-bit SimHash of the token set: bit i set iff the majority of token
    hashes have bit i set. Bit i of a token = low bit of hex digit i of
    md5(token) — engine-portable (md5 + substring only, no integer hex
    conversion), so the SQL oracle reproduces signatures exactly.

    Physical shape (optimization r15): higher-order functions are
    interpreted with NO common-subexpression elimination, so the former
    one-fold-per-bit form re-tokenized the document and re-md5'd every
    token once PER BIT (16× the dominant cost). Now the md5 array is
    materialized once (`transform`) and a SINGLE fold accumulates all
    `bits` votes in an int-array accumulator (`zip_with`); the per-token
    ±1 votes, their accumulation order and the majority comparison are
    bit-for-bit the ones the oracle reproduces — only the number of
    md5/tokenize evaluations changed (measured ~5× on the q88 signature
    pass).

    Null text coalesces to an empty token set (ADVICE r15): the r15
    rewrite let a null `hashes` array propagate NULL through
    aggregate/zip_with, silently dropping null-text docs out of the
    band equi-joins in `simhash_near_dup_pairs`/screen; the pre-r15
    per-bit form bucketed them at signature 0 — restored here."""
    assert bits <= 32
    toks = F.coalesce(
        tokens_col(F.lower(text_col)), F.array().cast("array<string>")
    )
    hashes = F.transform(toks, lambda t: F.md5(t))  # md5 ONCE per token
    per_tok = lambda h: F.transform(  # noqa: E731 - ±1 vote vector of h
        F.sequence(F.lit(1), F.lit(bits)),
        lambda i: F.when(
            F.substring(h, i, 1).isin(*ODD_HEX), 1
        ).otherwise(-1),
    )
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, per_tok(h), lambda a, v: a + v),
    )
    powers = F.array(*[F.lit(2 ** i).cast("bigint") for i in range(bits)])
    return F.aggregate(
        F.zip_with(
            votes, powers,
            lambda v, p: F.when(v > 0, p).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def simhash_duplicates(
    df: DataFrame, bits: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of docs sharing an identical SimHash signature (hamming r=0
    bucket; at scale, band the signature for r>0 in one extra explode)."""
    from ocr_vector_db_spark.session import spread_for_compute

    sigs = spread_for_compute(df.select(id_col, text_col)).select(
        F.col(id_col), simhash_col(F.col(text_col), bits).alias("simhash")
    )
    return (
        sigs.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") >= 2)
    )


def simhash_band_widths(bits: int, r: int) -> list[tuple[int, int]]:
    """(lo_bit, width) per band: the B bits split into r+1 contiguous bands
    (remainder bits spread over the leading bands)."""
    n_bands = r + 1
    widths = [bits // n_bands + (1 if i < bits % n_bands else 0) for i in range(n_bands)]
    out, lo = [], 0
    for w in widths:
        out.append((lo, w))
        lo += w
    return out


def simhash_near_dup_pairs(
    df: DataFrame,
    bits: int = 16,
    r: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs within Hamming distance r of the B-bit SimHash.

    Pigeonhole banding (the r>0 generalization of `simhash_duplicates`,
    reference analogue: approximate HNSW recall, storage/schema.py:80-85):
    split the signature into r+1 bands — two signatures differing in ≤ r
    bits must agree exactly on ≥ 1 band. Candidates come from an
    exact-match self-join per (band_idx, band_value); each candidate is
    verified with bit_count(sig_a XOR sig_b) ≤ r, so the result is exact.

    Scale shape: one explode to r+1 slim rows per doc (id, band, value),
    one shuffle on the band value, candidate pairs distinct-ed before the
    signatures are re-attached by id join (the MinHash-LSH banding
    discipline) — never an all-pairs comparison. At 100 TB use bits=64 and
    small r so band values stay selective (2^(64/(r+1)) buckets)."""
    from ocr_vector_db_spark.session import spread_for_compute

    # hash on a parallelism-floored, two-column projection, then
    # materialize the slim (id, 8-byte simhash) frame ONCE behind a lazy
    # checkpoint: the plan references it three times (bands / sig_a /
    # sig_b), and uncheckpointed each reference re-runs the whole
    # tokenize+md5 pass (optimization r15 — measured 3× the hash cost
    # on the q88 noop; the materialized frame is signature-sized, orders
    # of magnitude below the token stream it replaces)
    sigs = spread_for_compute(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"), simhash_col(F.col(text_col), bits).alias("simhash")
    ).localCheckpoint(eager=False)
    band_structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.shiftright(F.col("simhash"), lo).bitwiseAND(F.lit((1 << w) - 1)).alias("val"),
        )
        for j, (lo, w) in enumerate(simhash_band_widths(bits, r))
    ]
    bands = sigs.select("id", F.explode(F.array(*band_structs)).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.val").alias("val")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )
    sig_a = sigs.select(F.col("id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    sig_b = sigs.select(F.col("id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= r)
        .select("doc_a", "doc_b", "hamming")
    )


# --------------------------------------------------------- embedding cosine


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = None,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    allow_quadratic: bool = False,
) -> DataFrame:
    """Pairs (a < b) with cosine ≥ threshold. `block_col` (IVF cluster, label,
    LSH bucket) restricts the self-join to within-block pairs — mandatory at
    scale. Without it the plan is an O(n²) cross join, and the escape hatch
    must be opened EXPLICITLY with ``allow_quadratic=True`` (small, known-
    bounded corpora only) — an unblocked call can't be reached by accident."""
    from ocr_vector_db_spark.functions.vector import dot_col, norm_col

    if block_col is None and not allow_quadratic:
        raise ValueError(
            "embedding_near_dup_pairs without block_col is an O(n^2) "
            "cross join; pass block_col (IVF cluster / label / LSH "
            "bucket) or opt in explicitly with allow_quadratic=True"
        )

    # Precompute each vector's norm ONCE before the self-join: the pairwise
    # stage then does a single dot product per pair instead of re-deriving
    # both norms (3× the flops) inside the O(pairs) hot loop. Repartition
    # first: a small single-file corpus would otherwise run the whole
    # pair loop in ONE task (broadcast-join parallelism = left-side
    # partitions).
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(parallelism)
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(emb_col).cast("array<double>").alias("__v"),
        norm_col(F.col(emb_col)).alias("__nrm"),
        *([F.col(block_col)] if block_col else []),
    )
    left = base.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("emb_a"),
        F.col("__nrm").alias("nrm_a"), *([F.col(block_col)] if block_col else []),
    )
    right = base.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("emb_b"),
        F.col("__nrm").alias("nrm_b"), *([F.col(block_col)] if block_col else []),
    )
    joined = left.join(right, [block_col]) if block_col else left.crossJoin(right)
    denom = F.col("nrm_a") * F.col("nrm_b")
    cos = F.when(denom != 0.0, dot_col(F.col("emb_a"), F.col("emb_b")) / denom)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """Duplicate-cluster resolution: (id, comp) with comp = min id reachable
    through the near-dup pair graph. Pairs alone under-merge (A~B, B~C but
    A!~C); picking one canonical document per CLUSTER needs the transitive
    closure, which is what every production dedup pipeline runs after
    MinHash-LSH candidate generation.

    Min-label propagation: each round every node adopts the smallest label
    among itself and its neighbors — one broadcast-able-or-shuffled equi-join
    + hash agg per round, converging in O(component diameter) rounds (near-dup
    clusters are shallow: duplicates of a common source are all pairwise
    similar, so diameter is small even when clusters are huge). Lineage is
    truncated per round with localCheckpoint so the plan doesn't grow with
    iterations; the loop exits on a zero-changes fixpoint. For graphs with
    continent-sized diameters, swap in alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce", SoCC'14) — same
    join-agg primitive, fewer rounds."""
    sym = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    sym = (
        sym.unionByName(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = sym.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id"))
    for _ in range(max_iter):
        neigh = sym.join(labels, sym["dst"] == labels["id"]).select(
            sym["src"].alias("id"), F.col("comp")
        )
        new = labels.unionByName(neigh).groupBy("id").agg(F.min("comp").alias("comp"))
        new = new.localCheckpoint()
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def connected_components_star(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, comp) exactly like `connected_components`, via alternating
    large-star / small-star rounds (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14) — O(log² n) rounds regardless of
    component DIAMETER, where min-label propagation needs diameter rounds.
    This is the variant `connected_components`' docstring defers to: a
    paraphrase chain A~B~C~…~Z (each link a near-dup pair, ends unrelated)
    is one component of diameter |chain|, and min-label at its default
    round budget silently under-merges it (regression-shown in tests on a
    200-link chain); star contraction closes it in ~8 rounds.

    Each round is two groupBy+join passes over the (symmetrized) edge set:
      large-star: every node's LARGER neighbors re-attach to the minimum
                  of its neighborhood (incl. itself);
      small-star: every node and its smaller neighbors attach to that
                  minimum.
    The edge set is distinct + localCheckpoint-ed per round (lineage stays
    O(1)); convergence = the round was a no-op, at which point the graph
    is a star forest rooted at component minima and labels read off the
    edges directly."""

    def star_half(e: DataFrame, large: bool) -> DataFrame:
        nbr = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        if not large:
            nbr = nbr.filter(F.col("v") <= F.col("u"))
        mn = (
            nbr.groupBy("u").agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )
        joined = nbr.join(mn, "u")
        if large:
            out = joined.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        else:
            out = joined.select(F.col("v").alias("u"), F.col("m").alias("v")).unionByName(
                joined.select("u", F.col("m").alias("v"))
            )
        return out.filter(F.col("u") != F.col("v")).distinct()

    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    n_e = e.count()
    for _ in range(max_iter):
        new = star_half(star_half(e, large=True), large=False).localCheckpoint()
        n_new = new.count()
        stable = n_new == n_e and new.exceptAll(e).isEmpty()
        e, n_e = new, n_new
        if stable:
            break
    roots = e.select(F.col("v").alias("id")).distinct().withColumn("comp", F.col("id"))
    return (
        e.select(F.col("u").alias("id"), F.col("v").alias("comp"))
        .unionByName(roots)
        # at convergence this is already 1 row/node (star forest: children
        # point at their root, roots self-label); min() additionally keeps
        # the output well-formed if max_iter ran out mid-contraction
        .groupBy("id").agg(F.min("comp").alias("comp"))
    )


def minhash_neardup_components(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    collapse_identical: bool = True,
    cc: str = "star",
) -> DataFrame:
    """(doc_id, component_id, is_canonical) near-dup clusters, hot-group-safe.

    `cc` picks the transitive-closure engine: "star" (large-star/
    small-star contraction, O(log² n) rounds independent of component
    diameter — the DEFAULT: round-7 bench measured it at ~1.0× the
    min-label cost on shallow components while a 200-link chain exceeds
    min-label's round budget entirely) or "label" (min-label
    propagation, rounds = diameter — marginally cheaper when components
    are known-shallow). Both produce identical components
    (row-for-row, q109 ≡ q110 ≡ q56's recursive-CTE oracle).

    The q56 shape (`minhash_lsh_candidates` → `connected_components`)
    materializes m² candidate pairs inside every band bucket. At 100 TB the
    dominant bucket pathology is not hash collisions but IDENTICAL content:
    one boilerplate page duplicated 10⁶ times yields 10¹² pairs on a single
    reducer before the threshold filter can discard anything. This operator
    collapses documents with identical full signatures to one representative
    (the group's min id) BEFORE the band self-join, runs pair generation and
    the transitive closure over representatives only, then maps members back
    through their representative — pair volume drops from Σ m_g² to the
    collision structure of the DISTINCT signatures.

    Exactness (regression-tested against the uncollapsed path, and
    oracle-tied via q109 ≡ q56):
    - Members of an identical-signature group agree on every band, so in the
      uncollapsed graph they are pairwise candidates at est_jaccard = 1.0 ≥
      any threshold ≤ 1 — the group is always fully connected and lands in
      its representative's component.
    - An inter-group edge's est_jaccard depends only on the two signatures,
      so it survives collapse verbatim.
    - Min-label of a component = min doc id in it = min over its groups'
      minima = min over its representatives — the label CC computes on the
      collapsed graph.
    - Output membership: a doc appears iff it has ≥1 qualifying partner —
      i.e. its group has ≥2 members (identical partner) or its
      representative gained a CC label from an inter-group edge.
    """
    assert num_hashes % bands == 0 and threshold <= 1.0
    close = {"label": connected_components, "star": connected_components_star}[cc]
    # cached: the shingle explosion behind the signatures is the expensive
    # scan; both consumers below (group map + band join) reuse one pass
    # (MEMORY_AND_DISK, so an over-memory signature table spills, not OOMs)
    sig = minhash_signatures(df, num_hashes, n, text_col, id_col).cache()
    if not collapse_identical:
        pairs = candidates_from_signatures(sig, num_hashes, bands)
        comp = close(pairs.filter(F.col("est_jaccard") >= threshold))
        return comp.select(
            F.col("id").alias("doc_id"),
            F.col("comp").alias("component_id"),
            (F.col("id") == F.col("comp")).alias("is_canonical"),
        )

    # group on a 32-byte md5 of the 16-slot signature, not the 16 raw
    # columns: the grouping/join shuffles carry ~32 B keys instead of
    # ~240 B — at 10⁹ docs that is the difference between a 32 GB and a
    # 240 GB key shuffle (md5-keyed identity is the repo-wide id
    # convention: content_hash/doc_id derive the same way)
    sig_key = F.md5(F.concat_ws("\x1f", *[
        f"mh_{i}" for i in range(num_hashes)
    ])).alias("__sk")
    sig = sig.select("*", sig_key)
    groups = sig.groupBy("__sk").agg(
        F.min("doc").alias("rep"), F.count("*").alias("n_members")
    ).cache()
    # slim doc → (rep, group size) map; one shuffle on the 32-byte key
    member = sig.select("doc", "__sk").join(groups, "__sk").select(
        "doc", "rep", "n_members"
    )
    rep_sig = sig.join(
        groups.select(F.col("rep").alias("doc")), "doc", "left_semi"
    ).drop("__sk").cache()

    pairs = candidates_from_signatures(rep_sig, num_hashes, bands)
    return components_from_collapsed(member, pairs, threshold, cc)


def components_from_collapsed(
    member: DataFrame,
    rep_pairs: DataFrame,
    threshold: float,
    cc: str = "star",
) -> DataFrame:
    """(doc_id, component_id, is_canonical) from a COLLAPSED pair graph —
    the closure tail of `minhash_neardup_components`, split out so the
    persisted NearDupPairIndex serves the byte-identical clustering:
    `member` is the doc → representative map (doc, rep, n_members) and
    `rep_pairs` the group-level candidate pairs (doc_a, doc_b,
    est_jaccard) over representatives."""
    close = {"label": connected_components, "star": connected_components_star}[cc]
    comp = close(
        rep_pairs.filter(F.col("est_jaccard") >= threshold)
    ).withColumnRenamed("id", "rep")
    return (
        member.join(comp, "rep", "left")
        .filter(F.col("comp").isNotNull() | (F.col("n_members") >= 2))
        .select(
            F.col("doc").alias("doc_id"),
            F.coalesce(F.col("comp"), F.col("rep")).alias("component_id"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("component_id"))
    )


def minhash_dropped_ids(
    df: DataFrame | None = None,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """One column (`id_col`): ids with a LOWER-id near-dup at est_jaccard ≥
    threshold — the keep-min drop set (the doc_b side of
    `minhash_lsh_candidates`), computed hot-group-safe. Precomputed
    `sigs` (a `MinHashIndex.signatures_of` result) skip the shingle+hash
    pass — the signatures-once streaming path.

    Same collapse argument as `minhash_neardup_components`: every member of
    an identical-signature group except its min-id representative has the
    representative as a lower identical partner → dropped outright, no
    pairs materialized; a representative r has a lower partner iff some
    OTHER group with est ≥ threshold has min id < r — and a group's min id
    IS its representative, so that reduces to r being the doc_b of a
    representative-level candidate pair. Equivalence to the uncollapsed
    formulation is a regression test."""
    assert num_hashes % bands == 0 and threshold <= 1.0
    sig = sigs if sigs is not None else minhash_signatures(
        df, num_hashes, n, text_col, id_col
    )
    # md5 signature key, not the 16 raw columns — see
    # minhash_neardup_components for the shuffle-width rationale
    sig = sig.select("*", F.md5(F.concat_ws("\x1f", *[
        f"mh_{i}" for i in range(num_hashes)
    ])).alias("__sk"))
    groups = sig.groupBy("__sk").agg(F.min("doc").alias("rep")).cache()
    non_reps = (
        sig.select("doc", "__sk").join(groups, "__sk")
        .filter(F.col("doc") != F.col("rep"))
        .select("doc")
    )
    rep_sig = sig.join(
        groups.select(F.col("rep").alias("doc")), "doc", "left_semi"
    ).drop("__sk")
    doomed_reps = (
        candidates_from_signatures(rep_sig, num_hashes, bands)
        .filter(F.col("est_jaccard") >= threshold)
        .select(F.col("doc_b").alias("doc"))
    )
    out = (
        non_reps.unionByName(doomed_reps)
        .distinct()
        .select(F.col("doc").alias(id_col))
    )
    # This runs once per MICRO-BATCH inside stream_ingest_deduped: every
    # call's input differs, so the `groups` cache entry is a fresh plan the
    # cache manager can never dedup — a long-running stream would accumulate
    # cached RDDs bounded only by LRU pressure. Materialize the (slim,
    # batch-bounded id list) result eagerly, then release the cache; the
    # checkpoint blocks free themselves when the result is GC'd. (The
    # batch-side minhash_neardup_components keeps its caches: repeated calls
    # there share ONE cache entry per logical plan, so nothing accumulates.)
    out = out.localCheckpoint()
    groups.unpersist()
    return out


def kmeans_blocks(
    df: DataFrame,
    num_clusters: int,
    emb_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
    max_iter: int = 20,
    out_col: str = "sem_cluster",
) -> DataFrame:
    """Assign every row a KMeans cluster id over its embedding — the block
    key SemDeDup (Abbas et al., 2023 §3) prescribes when the corpus has no
    natural label: fit k-means on (a sample of) the embeddings, then dedup
    WITHIN each cluster only. Same fit-assign recipe as IVFIndex.build
    (operators/ann_index.py) minus the partitioned write: at 100 TB the fit
    runs on ~1M sampled vectors (`sample_fraction`) and the assignment is
    one distributed map over the corpus. Seeded, so assignments are
    deterministic run-to-run."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("__f", array_to_vector(F.col(emb_col).cast("array<double>")))
    fit_on = feat.sample(sample_fraction, seed=seed) if sample_fraction else feat
    model = KMeans(
        k=num_clusters, seed=seed, maxIter=max_iter,
        featuresCol="__f", predictionCol=out_col,
    ).fit(fit_on)
    return model.transform(feat).drop("__f")


def semantic_dedup_survivors(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = "label",
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    kmeans_clusters: int | None = None,
    seed: int = 42,
    sample_fraction: float | None = None,
    allow_quadratic: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): within each semantic cluster, drop
    every document that has a HIGHER-PRIORITY near-neighbor (cosine ≥
    threshold, priority = lower id); survivors are the cluster
    representatives. The rule is one-hop and pairwise — a doc is dropped
    iff ANY lower-id doc lies within the threshold, whether or not that
    neighbor is itself dropped — NOT transitive closure (for chains
    A~B~C with A!~C: B and C are both dropped, only A survives). One
    anti-join expresses it exactly.

    Blocking: pass ``kmeans_clusters=N`` to block by a seeded KMeans
    assignment over the embeddings (`kmeans_blocks`) — the paper's own
    clustering, and the only option on a corpus with no labels; or pass an
    existing ``block_col`` (label / IVF cluster / LSH bucket) to reuse a
    partitioning the pipeline already computed.

    Scale shape: candidate pairs come from the blocked self-join
    (`embedding_near_dup_pairs` — never all-pairs); the survivor set is a
    broadcast-able left-anti join of the corpus against the "has a better
    neighbor" id set (distinct ids on the b-side of pairs)."""
    blocked = df
    if kmeans_clusters is not None:
        block_col = "__sem_cluster"
        blocked = kmeans_blocks(
            df, kmeans_clusters, emb_col=emb_col, seed=seed,
            sample_fraction=sample_fraction, out_col=block_col,
        )
    pairs = embedding_near_dup_pairs(
        blocked, threshold=threshold, block_col=block_col, emb_col=emb_col,
        id_col=id_col, allow_quadratic=allow_quadratic,
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dropped, id_col, "left_anti")


def duplicate_ngram_coverage(
    df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicate-text signal (the shingle-set proxy for Lee et
    al. 2022's exact-substring dedup): (id, n_shingles, n_shared,
    dup_coverage) where dup_coverage = fraction of the document's DISTINCT
    word n-grams that occur in at least one OTHER document. Docs with high
    coverage are boilerplate/mirrors; pipelines drop or trim them (the
    suffix-array span surgery is the sequential refinement — this is the
    distributed screening pass that bounds where it must run).

    Scale shape: shingle explode (map-only, after a repartition spread) →
    distinct → per-shingle doc-frequency agg → join back on shingle → per-doc
    agg. The shingle-df join is the one big shuffle (both sides
    corpus-shingle-sized); counts are integers, so every aggregate is exact.
    """
    sh = _doc_shingles(df, text_col, id_col, n)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    return (
        sh.join(freq, "shingle")
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_shingles",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias("dup_coverage"),
        )
    )


def duplicate_span_excision(
    df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicate-SPAN surgery (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", at n-gram granularity):
    where `duplicate_ngram_coverage` (q93) SCREENS docs by how much of
    their distinct shingle set is shared, this removes the duplicated
    text itself — every token position covered by an n-gram that occurs
    ≥ 2 times in the corpus (all occurrences counted, within-doc repeats
    included) is excised, with overlapping/adjacent hits merged into
    maximal spans first. Per doc with ≥ 1 span:

      (id, n_tokens, n_spans, removed_tokens, kept_tokens,
       spans_digest, kept_digest)

    spans_digest fingerprints the merged [start,end) token spans in
    order; kept_digest fingerprints the surviving text (tokens outside
    every span, original order) — the actual cleaned-corpus artifact.

    Scale shape: positional shingle explode → gram-frequency agg →
    join back on gram (the one corpus-shingle-sized shuffle, q93's
    contract) → per-doc windows (partitioned by doc, never global) for
    the gaps-and-islands merge → disjoint-span explode + left-anti join
    on (doc, pos) for the kept text. Counts and positions are integers;
    every aggregate is exact, so a DuckDB oracle reproduces all seven
    columns bit-for-bit (q130). The suffix-array formulation finds
    duplicates of EVERY length ≥ threshold; fixed-n grams find exactly
    the spans whose every n-window repeats — the standard distributed
    approximation (n=13 in production; the merge step recovers long
    shared substrings as single spans)."""
    from pyspark.sql import Window

    parallelism = df.sparkSession.sparkContext.defaultParallelism
    toked = df.repartition(parallelism).select(
        F.col(id_col).alias("doc"),
        tokens_col(F.lower(F.col(text_col))).alias("toks"),
    )
    toks = F.col("toks")
    # positional n-grams: element_at chain (O(1) lookups), sequence guard
    # against Spark's DESCENDING sequence(1, 0) on short docs
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.struct(
            (i - 1).cast("int").alias("pos"),
            F.concat_ws(
                " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
            ).alias("gram"),
        ),
    )
    grams = F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<struct<pos:int,gram:string>>")
    )
    pg = toked.select("doc", F.explode(grams).alias("g")).select(
        "doc", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram")
    )
    dup = (
        pg.groupBy("gram").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2).select("gram")
    )
    cov = pg.join(dup, "gram").select("doc", "pos")

    w = Window.partitionBy("doc").orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = cov.withColumn(
        "ni", (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("int")
    ).withColumn(
        "island",
        F.sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = isl.groupBy("doc", "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + n).alias("e")
    )
    item = F.concat(
        F.lpad(F.col("s").cast("string"), 6, "0"), F.lit("-"),
        F.lpad(F.col("e").cast("string"), 6, "0"),
    )
    stat = spans.groupBy("doc").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("removed_tokens"),
        F.md5(F.concat_ws(",", F.sort_array(F.collect_list(item))))
        .alias("spans_digest"),
    )
    # kept text: positions outside the (disjoint) merged spans
    covp = spans.select(
        "doc", F.explode(F.sequence("s", F.col("e") - 1)).alias("pos")
    )
    tokpos = toked.select("doc", F.posexplode("toks").alias("pos", "tok"))
    kept = tokpos.join(covp, ["doc", "pos"], "left_anti")
    kept_agg = kept.groupBy("doc").agg(
        F.md5(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda st: st.tok,
            ),
            " ",
        )).alias("kept_digest")
    )
    lens = toked.select("doc", F.size(toks).cast("bigint").alias("n_tokens"))
    return (
        stat.join(lens, "doc").join(kept_agg, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_tokens", "n_spans", "removed_tokens",
            (F.col("n_tokens") - F.col("removed_tokens")).cast("bigint")
            .alias("kept_tokens"),
            "spans_digest",
            F.coalesce("kept_digest", F.md5(F.lit(""))).alias("kept_digest"),
        )
    )


def keep_best_by_quality(
    items: DataFrame,
    pairs: DataFrame,
    quality_col: str,
    id_col: str = "id",
) -> DataFrame:
    """The ONE keep-best selection behind the modality dedup family
    (image_keep_best / audio_keep_best / video_keep_best): `items` rows
    (id_col, quality_col) label with their near-dup family (transitive
    closure over the `pairs` (id_a, id_b) graph; singletons are their
    own), and each family keeps its highest-quality copy — max
    quality_col, min id on ties. Returns (id_col, family, quality_col,
    keep). Window-free: the closure runs over the PAIR graph only
    (near-dup families are shallow), then two slim family-keyed
    aggregates (max quality, min id among the best) select the
    survivor."""
    comp = connected_components(pairs, "id_a", "id_b")
    labeled = (
        items.select(F.col(id_col).alias("id"), F.col(quality_col))
        .join(comp.withColumnRenamed("comp", "family"), "id", "left")
        .withColumn("family", F.coalesce("family", F.col("id")))
    )
    best = labeled.groupBy("family").agg(
        F.max(quality_col).alias(quality_col)
    )
    keep = (
        labeled.join(best, ["family", quality_col], "left_semi")
        .groupBy("family")
        .agg(F.min("id").alias("keep_id"))
    )
    return (
        labeled.join(keep, "family")
        .select(
            F.col("id").alias(id_col), "family", quality_col,
            (F.col("id") == F.col("keep_id")).alias("keep"),
        )
    )
