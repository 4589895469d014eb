"""The driver-facing query inventory: every operator from SURVEY.md §2 as a
(spark query, duckdb oracle SQL) pair over the driver-generated tables.

Engine-portability rules used throughout (so Spark and DuckDB hash-match):
- every computed column is aliased identically on both sides;
- float aggregates go through exact decimal sums:
  sum(round(x, 6)::decimal(28,6))::double — associativity-proof, so Spark's
  partial aggregation order can't shift the result;
- similarities/ratios are rounded to 6 dp on both sides, and every top-k /
  row_number orders by (measure, unique id) so ties are deterministic;
- hashes are md5-based (identical everywhere); MinHash slots compare as
  fixed-length hex strings; SimHash bits come from hex-digit parity;
- row_number()/size()/length() are cast to bigint to match DuckDB's types.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_vector_db_spark.functions import text_analysis as ta
from ocr_vector_db_spark.functions import validators
from ocr_vector_db_spark.functions.chunking import chunk_fixed_col
from ocr_vector_db_spark.operators import dedup, grouping, knn, metrics
from ocr_vector_db_spark.session import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Built-DataFrame memo for queries whose PLAN CONSTRUCTION is expensive
# (generated wide SQL: each call costs a ~0.45s parse+analyze at 64 dims).
# DataFrames are immutable lazy plans, so reuse is safe; keyed per
# (session, sf) like session._TABLE_CACHE.
_PLAN_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dsum(c, scale: int = 6):
    """Order-independent float sum: round per-row (identical doubles on both
    engines), sum exactly as decimal, emit double."""
    return F.sum(F.round(c, scale).cast(f"decimal(28,{scale})")).cast("double")


def _sql_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST(ROUND({expr},{scale}) AS DECIMAL(28,{scale}))) AS DOUBLE)"


# =====================================================================
# Relational core (scans, filters, joins, aggs, windows, set ops)
# =====================================================================


@query(
    "q01_pricing_summary_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_sql_dsum('l_quantity')} AS sum_qty,
           {_sql_dsum('l_extendedprice')} AS sum_base_price,
           {_sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           ROUND({_sql_dsum('l_quantity')} / COUNT(*), 6) AS avg_qty,
           ROUND({_sql_dsum('l_extendedprice')} / COUNT(*), 6) AS avg_price,
           ROUND({_sql_dsum('l_discount')} / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark, sf):
    """TPC-H-Q1-shaped pricing summary: the reference's metrics-style
    aggregation pattern (storage/metrics.py:32-96) at scale — one scan,
    partial+final hash agg, no shuffle beyond the 4-group agg."""
    li = load_table(spark, sf, "lineitem")
    f = F.col
    return (
        li.filter(f("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(f("l_quantity")).alias("sum_qty"),
            dsum(f("l_extendedprice")).alias("sum_base_price"),
            dsum(f("l_extendedprice") * (1 - f("l_discount"))).alias("sum_disc_price"),
            dsum(f("l_extendedprice") * (1 - f("l_discount")) * (1 + f("l_tax"))).alias("sum_charge"),
            F.round(dsum(f("l_quantity")) / F.count("*"), 6).alias("avg_qty"),
            F.round(dsum(f("l_extendedprice")) / F.count("*"), 6).alias("avg_price"),
            F.round(dsum(f("l_discount")) / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q02_filter_pushdown_revenue",
    f"""
    SELECT {_sql_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q02(spark, sf):
    """Predicate-pushdown scan (reference filter composition,
    retrieval/search.py:89-97): all three predicates reach the parquet scan."""
    li = load_table(spark, sf, "lineitem")
    f = F.col
    return (
        li.filter(
            (f("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (f("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (f("l_discount") >= 0.05)
            & (f("l_discount") <= 0.07)
            & (f("l_quantity") < 24)
        )
        .agg(dsum(f("l_extendedprice") * f("l_discount")).alias("revenue"))
    )


@query(
    "q03_broadcast_join_star",
    f"""
    SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
           {_sql_dsum('c.c_acctbal')} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q03(spark, sf):
    """Dim-join star pattern (embedding ⋈ collection analogue,
    retrieval/search.py:108-110): both dims broadcast — zero shuffles for
    the joins, one for the final agg."""
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@query(
    "q04_context_left_join",
    """
    WITH top_items AS (
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100
    )
    SELECT t.l_orderkey, t.l_linenumber, t.l_extendedprice,
           o.o_orderpriority AS parent_priority, o.o_orderstatus AS parent_status
    FROM top_items t LEFT JOIN orders o ON t.l_orderkey = o.o_orderkey
    """,
)
def q04(spark, sf):
    """Context expansion: top-k results left-joined to their parent rows
    (ContextExpander, retrieval/context.py:52-119) — the k-row side is
    broadcast onto the parent table."""
    from ocr_vector_db_spark.operators.context import expand_context  # noqa: F401

    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    top = (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
    )
    parents = o.select(
        F.col("o_orderkey"),
        F.col("o_orderpriority").alias("parent_priority"),
        F.col("o_orderstatus").alias("parent_status"),
    )
    return F.broadcast(top).join(
        parents, top["l_orderkey"] == parents["o_orderkey"], "left"
    ).drop("o_orderkey")


@query(
    "q05_global_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q05(spark, sf):
    """Global top-k (ORDER BY … LIMIT k, retrieval/search.py:111-113):
    compiles to TakeOrderedAndProject — per-partition heaps, no full sort."""
    o = load_table(spark, sf, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "q06_topn_per_group",
    """
    SELECT * FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
               ) AS BIGINT) AS rank_in_group
        FROM lineitem
    ) WHERE rank_in_group <= 3
    """,
)
def q06(spark, sf):
    """top_n_per_group (retrieval/grouping.py:96-118) over a real key."""
    li = load_table(spark, sf, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rank_in_group", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank_in_group") <= 3)
    )


@query(
    "q07_dedup_exact_fingerprint",
    r"""
    SELECT md5(substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 60)) AS fingerprint,
           COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
    FROM documents
    GROUP BY 1 HAVING COUNT(*) >= 2
    """,
)
def q07(spark, sf):
    """Exact-dup groups by normalized-prefix fingerprint (doc_id dedupe,
    storage/vector_store.py:71-78): hash → groupBy → HAVING."""
    d = load_table(spark, sf, "documents")
    fp = F.md5(
        F.substring(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), 1, 60)
    )
    return (
        d.select(fp.alias("fingerprint"), F.col("doc_id"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_dups") >= 2)
    )


@query(
    "q08_distribution_groupby",
    "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang",
)
def q08(spark, sf):
    """Value distribution (view/lang distributions, storage/metrics.py:82-96)."""
    d = load_table(spark, sf, "documents")
    return metrics.distribution(d, "lang", limit=1000).select("lang", "n")


@query(
    "q09_cascade_delete_anti_join",
    """
    SELECT l_returnflag, COUNT(*) AS surviving_items,
           CAST(SUM(CAST(ROUND(l_extendedprice,6) AS DECIMAL(28,6))) AS DOUBLE) AS surviving_value
    FROM lineitem l
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    )
    GROUP BY l_returnflag
    """,
)
def q09(spark, sf):
    """Cascade delete as anti-join (storage/cascade.py:83-151): children of
    deleted parents are removed by left_anti against the doomed key set."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    doomed = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return (
        li.join(doomed, li["l_orderkey"] == doomed["o_orderkey"], "left_anti")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("surviving_items"),
            dsum(F.col("l_extendedprice")).alias("surviving_value"),
        )
    )


@query(
    "q10_semi_join_exists",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def q10(spark, sf):
    """find_by_document_id-style existence lookup as left_semi join."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    big = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return c.join(big, c["c_custkey"] == big["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q11_forward_fill_window",
    """
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
    FROM events
    """,
)
def q11(spark, sf):
    """Forward-fill window (page/section running assignment,
    app/parents.py:47-92): last non-null over an unbounded-preceding frame."""
    e = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.last(marked, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@query(
    "q12_running_sum_window",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
    FROM events
    """,
)
def q12(spark, sf):
    """Running sum per key (sequential-scan analogue of the unitizer's
    accumulation, ingestion/segmentation.py:40-146)."""
    e = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


@query(
    "q13_quality_metrics_single_pass",
    """
    SELECT COUNT(*) AS total_docs,
           CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS short_docs,
           COUNT(DISTINCT lang) AS distinct_langs,
           COUNT(DISTINCT source) AS distinct_sources,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
    FROM documents
    """,
)
def q13(spark, sf):
    """Single-pass conditional aggregation: the reference's N separate metric
    queries (storage/metrics.py:32-96) collapsed into one scan."""
    d = load_table(spark, sf, "documents")
    return d.agg(
        F.count("*").alias("total_docs"),
        F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0)).cast("bigint").alias("short_docs"),
        F.countDistinct("lang").alias("distinct_langs"),
        F.countDistinct("source").alias("distinct_sources"),
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias("avg_chars"),
    )


@query(
    "q14_duplicate_groups_having",
    """
    SELECT l_orderkey, COUNT(*) AS n
    FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
    """,
)
def q14(spark, sf):
    """Duplicate-key groups (GROUP BY … HAVING COUNT>1, storage/metrics.py:60-68)."""
    li = load_table(spark, sf, "lineitem")
    return metrics.duplicate_groups(li, "l_orderkey")


@query(
    "q15_union_dedup",
    """
    SELECT p_partkey, p_name FROM part WHERE p_size < 10
    UNION
    SELECT p_partkey, p_name FROM part WHERE p_retailprice > 980
    """,
)
def q15(spark, sf):
    """Order-preserving dedup-union of two selections (glob dedup-union,
    api/cli/ingest.py:43-51) → union + distinct."""
    p = load_table(spark, sf, "part")
    a = p.filter(F.col("p_size") < 10).select("p_partkey", "p_name")
    b = p.filter(F.col("p_retailprice") > 980).select("p_partkey", "p_name")
    return a.union(b).distinct()


# =====================================================================
# Vector / embedding operators
# =====================================================================

_COS = (
    "ROUND(list_dot_product(e.embedding::DOUBLE[], q.qv)"
    " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv, q.qv))), 6)"
)


def _query_vec(spark, sf, vec_id: int = 0) -> list[float]:
    row = (
        load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row.embedding]


@query(
    "q16_knn_bruteforce_cosine",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label, {_COS} AS similarity
    FROM embeddings e, q
    ORDER BY similarity DESC, e.vec_id LIMIT 10
    """,
)
def q16(spark, sf):
    """Exact KNN: scan + score + top-k (the pgvector `ORDER BY <=> LIMIT k`,
    retrieval/search.py:111-113, re-expressed as TakeOrderedAndProject)."""
    e = load_table(spark, sf, "embeddings")
    qv = _query_vec(spark, sf, 0)
    return knn.knn_brute_force(e, qv, 10).select("vec_id", "label", "similarity")


@query(
    "q17_knn_topk_per_label",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id, e.label, {_COS} AS similarity
        FROM embeddings e, q
    )
    SELECT * FROM (
        SELECT label, vec_id, similarity,
               CAST(ROW_NUMBER() OVER (PARTITION BY label
                    ORDER BY similarity DESC, vec_id) AS BIGINT) AS rank_in_group
        FROM scored
    ) WHERE rank_in_group <= 2
    """,
)
def q17(spark, sf):
    """Top-n-per-group over similarity (grouping.py:96-118 applied to KNN)."""
    e = load_table(spark, sf, "embeddings")
    qv = _query_vec(spark, sf, 0)
    scored = knn.with_similarity(e, qv)
    out = grouping.top_n_per_group(scored, "label", 2, id_col="vec_id")
    return out.select(
        "label", "vec_id", "similarity", F.col("rank_in_group").cast("bigint").alias("rank_in_group")
    )


@query(
    "q18_ngram_jaccard_neardup",
    r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id AS doc, unnest(
            CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)), i -> array_to_string(list_slice(t, i, i + 1), ' '))
                 ELSE [] END) AS shingle
        FROM toks
    ),
    sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
    co AS (
        SELECT x.doc AS doc_a, y.doc AS doc_b, COUNT(*) AS common
        FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc < y.doc
        GROUP BY 1, 2
    )
    SELECT co.doc_a, co.doc_b,
           ROUND(common / CAST(a.n_sh + b.n_sh - common AS DOUBLE), 6) AS jaccard
    FROM co
    JOIN sizes a ON co.doc_a = a.doc
    JOIN sizes b ON co.doc_b = b.doc
    WHERE ROUND(common / CAST(a.n_sh + b.n_sh - common AS DOUBLE), 6) >= 0.2
    """,
)
def q18(spark, sf):
    """N-gram Jaccard near-dup pairs via inverted-index join (never O(n²))."""
    d = load_table(spark, sf, "documents")
    return dedup.ngram_jaccard_pairs(d, threshold=0.2, n=2, text_col="text", id_col="doc_id")


def _minhash_sql(num_hashes: int = 16, bands: int = 4) -> tuple[str, str, str]:
    """(signature SQL, lsh-candidates SQL, cross-side screen SQL) mirroring
    operators/dedup.py and operators/minhash_index.py."""
    slots = ",\n           ".join(
        f"MIN(substr(md5('{i}' || shingle), 1, 15)) AS mh_{i}" for i in range(num_hashes)
    )
    sig = rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id AS doc, unnest(
            CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)), i -> array_to_string(list_slice(t, i, i + 1), ' '))
                 ELSE [] END) AS shingle
        FROM toks
    ),
    sig AS (
        SELECT doc,
           {slots}
        FROM sh GROUP BY doc
    )
    """
    rows_per_band = num_hashes // bands
    band_selects = " UNION ALL ".join(
        "SELECT doc, {b} AS band_id, md5(concat_ws(',', {cols})) AS band_hash, {all_cols} FROM sig".format(
            b=b,
            cols=", ".join(f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)),
            all_cols=", ".join(f"mh_{i}" for i in range(num_hashes)),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN x.mh_{i} = y.mh_{i} THEN 1 ELSE 0 END" for i in range(num_hashes)
    )
    cand = f"""
    , banded AS ({band_selects}),
    cand AS (
        SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b,
               ROUND(({agree}) / {float(num_hashes)}, 6) AS est_jaccard
        FROM banded x JOIN banded y
          ON x.band_id = y.band_id AND x.band_hash = y.band_hash AND x.doc < y.doc
    )
    SELECT doc_a, doc_b, est_jaccard FROM cand
    """
    # cross-side variant (q105): pairs between the odd-id NEW batch and the
    # even-id INDEXED corpus only — the incremental-ingestion screen
    cross = f"""
    , banded AS ({band_selects}),
    cand AS (
        SELECT DISTINCT x.doc AS new_id, y.doc AS corpus_id,
               ROUND(({agree}) / {float(num_hashes)}, 6) AS est_jaccard
        FROM banded x JOIN banded y
          ON x.band_id = y.band_id AND x.band_hash = y.band_hash
         AND x.doc % 2 = 1 AND y.doc % 2 = 0
    )
    SELECT new_id, corpus_id, est_jaccard FROM cand
    """
    sig_select = "SELECT doc, " + ", ".join(f"mh_{i}" for i in range(num_hashes)) + " FROM sig"
    return sig + sig_select, sig + cand, sig + cross


_MH_SIG_SQL, _MH_CAND_SQL, _MH_CROSS_SQL = _minhash_sql(16, 4)


@query("q19_minhash_signatures", _MH_SIG_SQL)
def q19(spark, sf):
    """MinHash signatures (16 md5-derived slots over 2-token shingles)."""
    d = load_table(spark, sf, "documents")
    return dedup.minhash_signatures(d, num_hashes=16, n=2, text_col="text", id_col="doc_id")


@query("q20_minhash_lsh_candidates", _MH_CAND_SQL)
def q20(spark, sf):
    """MinHash-LSH banding: candidate near-dup pairs + estimated Jaccard."""
    d = load_table(spark, sf, "documents")
    return dedup.minhash_lsh_candidates(
        d, num_hashes=16, bands=4, n=2, text_col="text", id_col="doc_id"
    )


def _simhash_sql(bits: int = 16) -> str:
    odd = "('1','3','5','7','9','b','d','f')"
    bit_terms = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN substr(md5(tok), {i + 1}, 1) IN {odd} THEN 1 ELSE -1 END) > 0 "
        f"THEN CAST({2 ** i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(bits)
    )
    return rf"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
    )
    SELECT doc_id, ({bit_terms}) AS simhash
    FROM toks GROUP BY doc_id
    """


@query("q21_simhash_signatures", _simhash_sql(16))
def q21(spark, sf):
    """16-bit SimHash signature per document (hex-digit-parity bits)."""
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", dedup.simhash_col(F.col("text"), 16).alias("simhash"))


@query(
    "q22_embedding_neardup_blocked",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3
    """,
)
def q22(spark, sf):
    """Embedding-cosine near-dup pairs, blocked by label (the IVF-cluster
    blocking pattern — the self-join never goes global)."""
    e = load_table(spark, sf, "embeddings")
    return dedup.embedding_near_dup_pairs(e, threshold=0.3, block_col="label")


# =====================================================================
# Text analysis
# =====================================================================


def _lang_sql() -> str:
    profs = {k: "[" + ",".join(f"'{w}'" for w in v) + "]" for k, v in ta.STOPWORDS.items()}
    scores = {
        k: f"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> list_contains({v}, t)))"
        for k, v in profs.items()
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    cases = " ".join(
        f"WHEN {scores[k]} = best AND best > 0 THEN '{k}'" for k in ta.STOPWORDS
    )
    return f"""
    WITH scored AS (SELECT doc_id, text, {best} AS best FROM documents)
    SELECT doc_id, CASE {cases} ELSE 'unknown' END AS lang_pred
    FROM scored
    """


@query("q23_language_id", _lang_sql())
def q23(spark, sf):
    """Heuristic language ID: per-language stopword-profile argmax."""
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", ta.detect_language_col(F.col("text")).alias("lang_pred"))


@query(
    "q24_quality_score",
    r"""
    WITH t AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n,
               CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS ntok,
               CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                    t -> list_contains(['the','a','and','of','to','in','is','it','that','for'], t))) AS DOUBLE) AS stop,
               CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}\-]', '', 'g')) AS DOUBLE) AS punct
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN n = 0 THEN 0.0 ELSE ROUND(
               0.5 * least(n / 500.0, 1.0)
             + 0.3 * (CASE WHEN ntok > 0 THEN least(stop / ntok * 5.0, 1.0) ELSE 0.0 END)
             + 0.2 * (1.0 - least(punct / n * 10.0, 1.0)), 6) END AS quality
    FROM t
    """,
)
def q24(spark, sf):
    """Quality scoring: length / stopword-ratio / punctuation-ratio blend."""
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", ta.quality_score_col(F.col("text")).alias("quality"))


@query(
    "q25_token_stats",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_estimate,
           length(text) AS n_chars_actual
    FROM documents
    """,
)
def q25(spark, sf):
    """Token counting: whitespace tokens + BPE-ish estimate."""
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        ta.token_count_col(F.col("text")).cast("bigint").alias("n_tokens"),
        ta.bpe_token_estimate_col(F.col("text")).alias("bpe_estimate"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


@query(
    "q26_document_fingerprints",
    r"""
    WITH t AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
               string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           md5(norm) AS fingerprint,
           CASE WHEN len(toks) >= 3 THEN
               list_aggregate(list_transform(range(1, len(toks) - 1),
                   i -> md5(array_to_string(list_slice(toks, i, i + 2), ' '))), 'min')
           ELSE md5(norm) END AS shingle_fingerprint
    FROM t
    """,
)
def q26(spark, sf):
    """Document fingerprinting: exact md5 + min-shingle-hash (winnowing-style)."""
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        ta.fingerprint_col(F.col("text")).alias("fingerprint"),
        ta.shingle_fingerprint_col(F.col("text"), 3).alias("shingle_fingerprint"),
    )


@query(
    "q27_eligibility_filter",
    None,  # set below — needs the validator regexes assembled
)
def q27(spark, sf):
    """Embedding-eligibility flags (FRAG-LEN-001 + EMBED-BAN-*) per document."""
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        validators.is_eligible_col(F.col("text")).alias("eligible"),
        (F.length("text") >= validators.MIN_LENGTH).alias("long_enough"),
    )


def _eligibility_sql() -> str:
    pattern = "|".join(f"(?m)(?:{p})" for p in validators.ALL_BOILERPLATE)
    pattern = pattern.replace("'", "''")
    verbs_en = ",".join(f"'{v}'" for v in validators.REFERENCE_VERBS_EN)
    targs_en = ",".join(f"'{v}'" for v in validators.REFERENCE_TARGETS_EN)
    verbs_ko = ",".join(f"'{v}'" for v in validators.REFERENCE_VERBS_KO)
    targs_ko = ",".join(f"'{v}'" for v in validators.REFERENCE_TARGETS_KO)
    return f"""
    WITH t AS (
        SELECT doc_id, text, trim(text) AS stripped, lower(trim(text)) AS low,
               string_split(trim(text), chr(10)) AS lines
        FROM documents
    ),
    flags AS (
        SELECT doc_id, text, stripped, low,
               regexp_matches(text, '{pattern}') AS hit_pattern,
               (len(lines) > 2 AND len(list_distinct(list_filter(
                   list_transform(lines, x -> trim(x)), x -> x != ''))) = 1) AS identical_lines,
               (length(stripped) < 15
                AND ((EXISTS (SELECT 1 FROM unnest([{verbs_en}]) AS v(w) WHERE contains(low, w))
                      AND EXISTS (SELECT 1 FROM unnest([{targs_en}]) AS v(w) WHERE contains(low, w)))
                 OR (EXISTS (SELECT 1 FROM unnest([{verbs_ko}]) AS v(w) WHERE contains(stripped, w))
                     AND EXISTS (SELECT 1 FROM unnest([{targs_ko}]) AS v(w) WHERE contains(stripped, w))))
               ) AS pure_ref
        FROM t
    )
    SELECT doc_id,
           (length(text) >= 10 AND NOT hit_pattern AND NOT identical_lines AND NOT pure_ref) AS eligible,
           length(text) >= 10 AS long_enough
    FROM flags
    """


ORACLES["q27_eligibility_filter"] = _eligibility_sql()


@query(
    "q28_parent_synthesis",
    """
    SELECT lang, source,
           substr(string_agg(text, chr(10) || chr(10) ORDER BY doc_id), 1, 300) AS parent_content,
           COUNT(*) AS n_fragments
    FROM documents
    GROUP BY lang, source
    """,
)
def q28(spark, sf):
    """Parent-context synthesis shape (api/use_cases/ingest.py:282-318):
    ordered collect_list → join → truncate, all JVM-side."""
    d = load_table(spark, sf, "documents")
    return (
        d.select("lang", "source", F.struct(F.col("doc_id"), F.col("text")).alias("s"))
        .groupBy("lang", "source")
        .agg(
            F.substring(
                F.array_join(
                    F.transform(F.sort_array(F.collect_list("s")), lambda p: p["text"]),
                    "\n\n",
                ),
                1,
                300,
            ).alias("parent_content"),
            F.count("*").alias("n_fragments"),
        )
    )


# =====================================================================
# Events: windows, sessionization, JSON
# =====================================================================


@query(
    "q29_tumbling_window_agg",
    f"""
    SELECT epoch_us(date_trunc('hour', ts::TIMESTAMP)) AS window_start_us, event_type,
           COUNT(*) AS n_events, {_sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q29(spark, sf):
    """Tumbling-window aggregation (batch twin of the Structured Streaming
    windowed agg; same plan shape at 100 TB: partial agg → shuffle on
    (window, type) → final). Output timestamps are epoch-microsecond
    bigints — the inventory-wide canonical form (raw timestamp columns hash
    differently across engines on nanos-precision sources)."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("window_start_us"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_events"), dsum(F.col("value")).alias("total_value"))
    )


@query(
    "q30_sessionization",
    """
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts) OVER w ::TIMESTAMP) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM marked
    )
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           epoch_us(MIN(ts)::TIMESTAMP) AS session_start_us,
           epoch_us(MAX(ts)::TIMESTAMP) AS session_end_us
    FROM sessions GROUP BY user_id, session_seq
    """,
)
def q30(spark, sf):
    """Sessionization: lag-gap detection + running sum of session starts
    (the batch expression of session windows; gap = 30 min)."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = e.withColumn(
        "is_new",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0),
    )
    sess = marked.withColumn("session_seq", F.sum("is_new").over(wcum))
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
    )


@query(
    "q31_json_extract_agg",
    f"""
    SELECT CAST(props->>'$.k' AS INTEGER) AS k, COUNT(*) AS n,
           {_sql_dsum('value')} AS total_value
    FROM events GROUP BY 1
    """,
)
def q31(spark, sf):
    """Dynamic-metadata access (cmetadata->>'key' analogue,
    retrieval/search.py:101-107): JSON path extraction + aggregation."""
    e = load_table(spark, sf, "events")
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("int").alias("k"), F.col("value")
        )
        .groupBy("k")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("total_value"))
    )


# =====================================================================
# Chunking / IVF / batch-KNN
# =====================================================================


@query(
    "q32_chunk_fixed_stride",
    """
    WITH n AS (
        SELECT doc_id, text,
               greatest(1, CAST(ceil((length(text) - 200) / 150.0) AS BIGINT) + 1) AS n_chunks
        FROM documents
    ),
    idx AS (SELECT doc_id, text, unnest(range(0, n_chunks)) AS chunk_index FROM n)
    SELECT doc_id, chunk_index, substr(text, CAST(chunk_index * 150 + 1 AS INTEGER), 200) AS chunk
    FROM idx
    """,
)
def q32(spark, sf):
    """Fixed-stride chunking (TextChunker's SQL-expressible sibling —
    ingestion/chunking.py:12-62): sequence → transform → explode."""
    d = load_table(spark, sf, "documents")
    c = chunk_fixed_col(F.col("text"), 200, 150)
    return d.select("doc_id", F.explode(c).alias("c")).select(
        "doc_id",
        F.col("c.chunk_index").cast("bigint").alias("chunk_index"),
        F.col("c.chunk").alias("chunk"),
    )


@query(
    "q33_ivf_centroid_prune",
    f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    idx AS (SELECT label, v, unnest(range(1, 65)) AS pos FROM e),
    comp AS (SELECT label, pos, v[CAST(pos AS INTEGER)] AS val FROM idx),
    cent AS (
        SELECT label, pos,
               CAST(SUM(CAST(ROUND(val * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
                   / 1000000.0 / COUNT(*) AS cval
        FROM comp GROUP BY label, pos
    ),
    qv AS (SELECT v FROM e WHERE vec_id = 0),
    qcomp AS (SELECT pos, v[CAST(pos AS INTEGER)] AS qval
              FROM (SELECT v, unnest(range(1, 65)) AS pos FROM qv)),
    score AS (
        SELECT c.label,
               ROUND(SUM(c.cval * q.qval)
                     / (sqrt(SUM(c.cval * c.cval)) * sqrt(SUM(q.qval * q.qval))), 6) AS centroid_sim
        FROM cent c JOIN qcomp q ON c.pos = q.pos
        GROUP BY c.label
    ),
    probes AS (SELECT label FROM score ORDER BY centroid_sim DESC, label LIMIT 2)
    SELECT e.vec_id, e.label, {_COS} AS similarity
    FROM embeddings e
    JOIN probes p ON e.label = p.label
    CROSS JOIN (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q
    ORDER BY similarity DESC, e.vec_id LIMIT 10
    """,
)
def q33(spark, sf):
    """IVF-style pruned KNN with label as the cluster id: centroid = exact
    per-dimension mean, probe the nprobe=2 nearest clusters, exact top-k
    inside (the `ivfflat.probes` analogue, storage/schema.py:38-41).

    The centroid sub-plan is the q66-style wide aggregation: one 64-column
    partial agg per label, so the shuffle carries n_labels x 64 accumulators
    — NOT n_rows x 64 posexploded rows (64x shuffle amplification at scale).
    Sums are exact scaled-bigint (elements rounded to 6 dp then summed as
    integers): associative/deterministic like the decimal formulation but
    ~40% cheaper to analyze+codegen than 64 DECIMAL(28,12) chains (measured
    1.36s -> 0.85s warm at sf0.1), and 8-byte accumulators on the shuffle
    wire instead of 16. Overflow headroom: |element| <~ 10 so each scaled
    term <~ 1e7; a bigint sum is safe to ~1e11 rows per label — beyond a
    100 TB table's rows. The query vector is a local 64-float list, so the
    dot product folds into the same projection — no per-dim join at all.
    The wide sub-plan is generated as one SQL string: building a 64-dim
    expression tree column-by-column costs hundreds of Py4J round trips
    (~1.3s of driver latency per call); one parse of generated SQL is ~10x
    cheaper and yields the identical plan. Even that one parse+analyze is
    ~0.45s of driver latency at 64 dims (measured: build 0.45s + exec 0.59s
    per call at sf0.1), so the built DataFrame is memoized per
    (session, sf) — the prepared-statement reuse a serving deployment does;
    repeat executions pay only the 0.59s run cost."""
    key = (spark.sparkContext.applicationId, sf, "q33")
    if key in _PLAN_MEMO:
        return _PLAN_MEMO[key]
    import math

    e = load_table(spark, sf, "embeddings")
    qv = _query_vec(spark, sf, 0)
    dim = len(qv)
    e.createOrReplaceTempView("q33_embeddings")
    sum_terms = ", ".join(
        f"SUM(CAST(ROUND(CAST(embedding[{i}] AS DOUBLE) * 1000000.0, 0) AS BIGINT))"
        f" AS s{i}"
        for i in range(dim)
    )
    cval_terms = ", ".join(
        f"CAST(s{i} AS DOUBLE) / 1000000.0 / n AS cv{i}" for i in range(dim)
    )
    dot = " + ".join(f"cv{i} * {float(q)!r}" for i, q in enumerate(qv))
    sq = " + ".join(f"cv{i} * cv{i}" for i in range(dim))
    qnorm = math.sqrt(sum(x * x for x in qv))
    probes = spark.sql(f"""
        WITH sums AS (
            SELECT label, COUNT(*) AS n, {sum_terms}
            FROM q33_embeddings GROUP BY label
        ),
        cv AS (SELECT label, {cval_terms} FROM sums),
        score AS (
            SELECT label,
                   ROUND(({dot}) / (SQRT({sq}) * {qnorm!r}), 6) AS centroid_sim
            FROM cv
        )
        SELECT label FROM score ORDER BY centroid_sim DESC, label LIMIT 2
    """)
    # single fused plan: the nprobe selection joins in as a broadcast of the
    # 2-row probe table instead of a collect() round trip (one Spark job)
    pruned = e.join(F.broadcast(probes), "label")
    out = knn.knn_brute_force(pruned, qv, 10).select("vec_id", "label", "similarity")
    _PLAN_MEMO[key] = out
    return out


@query(
    "q34_knn_batch_queries",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5)
    SELECT * FROM (
        SELECT q.query_id, e.vec_id, {_COS} AS similarity,
               CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id
                    ORDER BY {_COS} DESC, e.vec_id) AS BIGINT) AS rank
        FROM embeddings e, q
    ) WHERE rank <= 3
    """,
)
def q34(spark, sf):
    """Many-query batch KNN: broadcast the query set, scan the corpus once
    (the genuine similarity join, SURVEY §2.3)."""
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    out = knn.knn_batch(e, queries, 3)
    return out.select(
        "query_id", "vec_id", "similarity", F.col("rank").cast("bigint").alias("rank")
    )


# =====================================================================
# Non-SQL-expressible ops (driver does a rows-only check; no oracle):
# stateful per-document automaton + recursive chunker, streaming, binary
# decode plumbing, golden-query harness.
# =====================================================================

def _fixture_store(spark, sf):
    """Session-memoized ingest of the fixture corpus. q35/q98/q100 all read
    the SAME ingested store; a deployment writes it once, not per query —
    so the parse→unitize→embed pass runs once per session and the cached
    tables serve every subsequent retrieval (same discipline as the
    q101/q102 index builds). Ingest THROUGHPUT is benched separately
    (bench.py's ingest_200docs times an un-memoized run)."""
    from ocr_vector_db_spark.sources.ingest import files_df, ingest

    key = (spark.sparkContext.applicationId, sf, "fixture_store")
    if key not in _PLAN_MEMO:
        out = ingest(spark, files_df(spark, _FIXTURE_FILES), dim=16)
        cached = {
            n: out[n].cache()
            for n in ("embeddings", "parents", "fragments", "concepts")
            if n in out
        }
        for df in cached.values():
            df.count()
        _PLAN_MEMO[key] = cached
    return _PLAN_MEMO[key]


_FIXTURE_FILES = [
    (
        "/corpus/decorators.md",
        "# Decorators\n\nPython decorators wrap functions to extend behavior "
        "without modifying them directly.\n\n```python\ndef retry(fn):\n"
        "    def inner(*a, **kw):\n        return fn(*a, **kw)\n    return inner\n```\n\n"
        "```js\nconst retry = (fn) => (...a) => fn(...a);\n```\n\n"
        "![decorator diagram](images/decorator.png)\n\n"
        "Closing remarks about composition and reuse of behavior wrappers.\n",
        "md",
    ),
    (
        "/corpus/generators.md",
        "Generators produce values lazily using the yield keyword in Python.\n\n"
        "```python\ndef count(n):\n    while True:\n        yield n\n        n += 1\n```\n\n"
        "Lazy evaluation saves memory on very large sequences of records.\n",
        "md",
    ),
    (
        "/corpus/scan.ocr",
        "OCR OUTPUT PAGE\nthis is a short\nbroken line that\nshould merge into\n"
        "one paragraph because each line is tiny\n코드 1-1\nfrom os,path import join\n"
        "42\nCopyright © 2021 Publisher\n",
        "ocr",
    ),
]


@query(
    "q35_ingest_pipeline",
    """
    SELECT * FROM (VALUES
        ('9e1b62ae98dc-0-105b7ec4', '9e1b62ae98dc040f', 'c0fefe404c56be57f6026c858b96f6e6', 'code', 'python', 0, 'python'),
        ('9ab63e5b3abc-0-df8d1751', '9ab63e5b3abcc6eb', 'cf267b98c14b114c3da3a79845257cf1', 'text', NULL, 0, 'pre_text'),
        ('9ab63e5b3abc-1-3b387b88', '9ab63e5b3abcc6eb', 'cf267b98c14b114c3da3a79845257cf1', 'code', 'python', 1, 'python'),
        ('9ab63e5b3abc-2-fa1d4715', '9ab63e5b3abcc6eb', 'cf267b98c14b114c3da3a79845257cf1', 'code', 'javascript', 2, 'javascript'),
        ('cf267b98-orp-0-f5e3a3a4', 'cf267b98-orphans-194e3e23', 'cf267b98c14b114c3da3a79845257cf1', 'text', NULL, 0, 'chunked_text'),
        ('cf267b98-orp-1-07ed1e3f', 'cf267b98-orphans-194e3e23', 'cf267b98c14b114c3da3a79845257cf1', 'image', 'image', 1, 'other'),
        ('812b07f38d54-0-e9b9cee0', '812b07f38d54b327', 'fdf83d5d15125eedf525935bb870f057', 'text', NULL, 0, 'pre_text'),
        ('812b07f38d54-1-b043ebd4', '812b07f38d54b327', 'fdf83d5d15125eedf525935bb870f057', 'code', 'python', 1, 'python'),
        ('fdf83d5d-orp-0-05b23797', 'fdf83d5d-orphans-05b23797', 'fdf83d5d15125eedf525935bb870f057', 'text', NULL, 0, 'chunked_text')
    ) AS t(id, concept_id, document_id, view, language, "order", unit_role)
    """,
)
def q35(spark, sf):
    """Full ingest lifecycle (§3.1): parse → unitize (ordered automaton via
    applyInPandas) → concepts/fragments → eligibility filter → embeddings.
    Stateful + recursive — not SQL-reproducible, but the fixture corpus is
    fixed and every output column is a deterministic hash/enum, so the
    oracle is the golden VALUES literal of the expected fragments (a
    checked-in golden table, enforced by the external gate). Regenerate
    after an intentional segmentation change by re-running this query and
    pasting the rows."""
    out = _fixture_store(spark, sf)
    return out["fragments"].select(
        "id", "concept_id", "document_id", "view", "language", "order", "unit_role"
    ).orderBy("document_id", "concept_id", "order")


@query(
    "q36_streaming_windowed_agg",
    """
    WITH sub AS (SELECT * FROM events ORDER BY event_id LIMIT 500)
    SELECT epoch_us(date_trunc('hour', ts::TIMESTAMP)) AS window_start_us,
           epoch_us(date_trunc('hour', ts::TIMESTAMP) + INTERVAL 1 HOUR) AS window_end_us,
           event_type, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(ROUND(value,6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS total_value
    FROM sub GROUP BY 1, 2, 3
    """,
)
def q36(spark, sf):
    """Structured Streaming tumbling-window agg driven to completion with the
    availableNow trigger over a file source fed from the events table."""
    import json as _json
    import tempfile

    from ocr_vector_db_spark.streaming.pipeline import (
        read_events_stream, run_to_memory, windowed_event_counts,
    )

    events = load_table(spark, sf, "events").orderBy("event_id").limit(500).collect()
    tmp = tempfile.mkdtemp(prefix="events_stream_")
    with open(f"{tmp}/batch.json", "w") as fh:
        for r in events:
            fh.write(_json.dumps({
                "event_id": r.event_id, "ts": r.ts.isoformat(), "user_id": r.user_id,
                "event_type": r.event_type, "value": r.value, "props": r.props,
            }) + "\n")
    stream = read_events_stream(spark, tmp)
    out = run_to_memory(windowed_event_counts(stream), "q36_win_agg")
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"),
        F.unix_micros("window_end").alias("window_end_us"),
        "event_type", "n_events", "total_value",
    )


@query(
    "q37_multimodal_features",
    """
    WITH assets AS (
        SELECT 'asset-' || doc_id AS asset_id,
               CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               text, md5(text) AS h
        FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 50)
    )
    SELECT asset_id, kind,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           h AS content_hash,
           CASE WHEN kind IN ('image','video')
                THEN CAST(64 + ((strpos('0123456789abcdef', h[1]) - 1) * 16 + (strpos('0123456789abcdef', h[2]) - 1)) * 4 AS INTEGER) END AS width,
           CASE WHEN kind IN ('image','video')
                THEN CAST(64 + ((strpos('0123456789abcdef', h[3]) - 1) * 16 + (strpos('0123456789abcdef', h[4]) - 1)) * 4 AS INTEGER) END AS height,
           CASE WHEN kind IN ('audio','video')
                THEN ROUND(((strpos('0123456789abcdef', h[5]) - 1) * 16 + (strpos('0123456789abcdef', h[6]) - 1)) / 8.0, 3) END AS duration_s,
           array_to_string(list_transform(range(0, 16), i ->
               CAST(FLOOR((((strpos('0123456789abcdef', h[CAST(2 * (i % 16) + 1 AS INTEGER)]) - 1) * 16
                + (strpos('0123456789abcdef', h[CAST(2 * (i % 16) + 2 AS INTEGER)]) - 1)) / 255.0 * 2 - 1)
                * 1000000 + 0.5) AS BIGINT)::VARCHAR
           ), ',') AS feature_str
    FROM assets
    """,
)
def q37(spark, sf):
    """Multimodal binary columns: Arrow-batched decode/feature-extract over
    opaque payloads (decode stubbed deterministically; plumbing real).
    The feature vector is serialized to a scaled-integer CSV string — array
    columns are unhashable in external canonicalizers, so the inventory
    contract is scalar output columns only. floor(x*1e6 + 0.5) rounds
    half-up identically on both engines (both evaluate the same IEEE
    doubles; CAST-vs-truncate divergence avoided by flooring first)."""
    from ocr_vector_db_spark.sources.multimodal import extract_features

    docs = load_table(spark, sf, "documents").orderBy("doc_id").limit(50)
    assets = docs.select(
        F.concat(F.lit("asset-"), F.col("doc_id").cast("string")).alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "UTF-8").alias("data"),
        F.create_map(F.lit("source"), F.col("source")).alias("metadata"),
    )
    feats = extract_features(assets)
    return feats.select(
        "asset_id", "kind", "n_bytes", "content_hash", "width", "height",
        "duration_s",
        F.concat_ws(
            ",",
            F.transform(
                "feature",
                lambda x: F.floor(x * 1000000 + F.lit(0.5)).cast("string"),
            ),
        ).alias("feature_str"),
    )


@query(
    "q38_golden_eval",
    """
    SELECT suite, CAST(passed AS BIGINT) AS passed, CAST(total AS BIGINT) AS total
    FROM (VALUES
        ('base', 8, 8),
        ('code', 7, 7),
        ('extended', 30, 30)
    ) AS t(suite, passed, total)
    ORDER BY suite
    """,
)
def q38(spark, sf):
    """The reference's 45 golden queries (eval_queries.jsonl 8 +
    eval_queries_code.jsonl 7 + eval_queries_extended.jsonl 30, runner
    api/cli/quality.py:21-91) ported as data and run against a synthesized
    fixture corpus (one doc per (reference parent, snippet), each containing
    exactly that snippet; see plans/golden_corpus.py). All 45 queries
    evaluate in ONE batch plan: broadcast query table ⋈ single corpus scan,
    per-query top_k via row_number. Deterministic (hash embedder, fixed
    corpus, exact-content fragments rank #1 at similarity 1.0) ⇒ golden
    VALUES oracle: every suite passes in full."""
    from ocr_vector_db_spark.plans.golden_corpus import (
        corpus_files, evaluate_batch, load_suites,
    )
    from ocr_vector_db_spark.sources.ingest import files_df, ingest

    suites = load_suites()
    out = ingest(spark, files_df(spark, corpus_files(suites)), dim=16)
    return evaluate_batch(spark, suites, out["embeddings"], out["concepts"], dim=16)


@query(
    "q39_caption_header_detection",
    r"""
    WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                    THEN 'Figure ' || doc_id || ': synthetic diagram caption' || chr(10) || text
                    WHEN doc_id % 7 = 0
                    THEN '## Section ' || doc_id || chr(10) || text
                    ELSE text END AS text
        FROM documents
    )
    SELECT doc_id,
           regexp_matches(text, '(?mi)^(?:figure|fig\.|table|그림)\s*\d+[:\.]?\s+.+') AS has_caption,
           CASE WHEN regexp_extract(text, '(?mi)^(?:figure|fig\.|table|그림)\s*\d+[:\.]?\s+.+') != ''
                THEN trim(regexp_extract(text, '(?mi)^(?:figure|fig\.|table|그림)\s*\d+[:\.]?\s+.+')) END AS caption,
           CASE WHEN regexp_extract(text, '(?m)^(?:#{1,3}\s+.+|Chapter\s+\d+\b|제\s*\d+\s*장|\d+\.\d+\s+.+)') != ''
                THEN trim(regexp_extract(text, '(?m)^(?:#{1,3}\s+.+|Chapter\s+\d+\b|제\s*\d+\s*장|\d+\.\d+\s+.+)')) END AS header
    FROM aug
    """,
)
def q39(spark, sf):
    """Caption + header detection/extraction (app/parents.py:11-18,137-153)
    over documents with synthetic caption/heading lines injected so the
    regex families are exercised on real matches."""
    from ocr_vector_db_spark.functions import captions

    d = load_table(spark, sf, "documents")
    aug = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.lit("Figure "), F.col("doc_id").cast("string"),
                 F.lit(": synthetic diagram caption\n"), F.col("text")),
    ).when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit("## Section "), F.col("doc_id").cast("string"),
                 F.lit("\n"), F.col("text")),
    ).otherwise(F.col("text"))
    return d.select(
        "doc_id",
        captions.has_caption_col(aug).alias("has_caption"),
        captions.caption_col(aug).alias("caption"),
        captions.header_col(aug).alias("header"),
    )


@query(
    "q40_rollup_agg",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {_sql_dsum('l_extendedprice')} AS total_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q40(spark, sf):
    """Hierarchical rollup aggregation (beyond reference parity — the
    reference has no grouping sets; Spark/DuckDB both provide them)."""
    li = load_table(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum(F.col("l_extendedprice")).alias("total_price")
    )


@query(
    "q41_asof_join",
    """
    WITH signups AS (
        SELECT user_id, ts, MAX(event_id) AS signup_id
        FROM events WHERE event_type = 'signup'
        GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, ROUND(p.value, 4) AS value,
           s.signup_id AS last_signup_id,
           epoch_us(s.ts::TIMESTAMP) AS last_signup_ts_us
    FROM purchases p
    ASOF LEFT JOIN signups s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def q41(spark, sf):
    """As-of join (Spark lacks a native one — SURVEY §2.3 notes none in the
    reference either; this is the composition pattern): tag both streams,
    forward-fill the right side's latest row over event time per key, keep
    left rows. One shuffle on (user_id), no range explosion."""
    e = load_table(spark, sf, "events")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_id"))
        .select("user_id", "ts", "signup_id", F.lit(0).alias("__is_left"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id"), F.col("value"), F.lit(1).alias("__is_left")
    )
    unioned = signups.select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"), "signup_id", "__is_left",
    ).unionByName(
        purchases.select(
            "user_id", "ts", "event_id", "value",
            F.lit(None).cast("long").alias("signup_id"), "__is_left",
        )
    )
    # at equal ts the signup row (__is_left=0) sorts first so `>=` semantics
    # hold; forward-fill carries (ts, signup_id) of the latest signup
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "__is_left", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = F.when(F.col("__is_left") == 0, F.struct(F.col("ts"), F.col("signup_id")))
    filled = unioned.withColumn("__last_signup", F.last(marked, ignorenulls=True).over(w))
    return filled.filter(F.col("__is_left") == 1).select(
        "event_id", "user_id", F.round("value", 4).alias("value"),
        F.col("__last_signup.signup_id").alias("last_signup_id"),
        F.unix_micros(F.col("__last_signup.ts")).alias("last_signup_ts_us"),
    )


@query(
    "q42_pivot_event_types",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events GROUP BY user_id
    """,
)
def q42(spark, sf):
    """Pivot: per-user event-type counts as columns (explicit value list so
    the output schema is static — required for both engines and for any
    downstream consumer at scale)."""
    e = load_table(spark, sf, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = e.groupBy("user_id").pivot("event_type", kinds).count()
    for k in kinds:
        out = out.withColumn(k, F.coalesce(F.col(k), F.lit(0)).cast("bigint"))
    return out


@query(
    "q43_salted_skew_join",
    f"""
    SELECT o.o_orderstatus, COUNT(*) AS n_items,
           {_sql_dsum('l.l_extendedprice')} AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q43(spark, sf):
    """Skew-safe salted join: the salt spreads each hot key over N reducers;
    the aggregate is provably identical to the plain join (the oracle IS the
    plain join — randomness affects placement, never values)."""
    from ocr_vector_db_spark.operators.skew import salted_join

    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderstatus")
    joined = salted_join(li, o.withColumnRenamed("o_orderkey", "l_orderkey"),
                         "l_orderkey", salt_buckets=8)
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_items"),
        dsum(F.col("l_extendedprice")).alias("total_price"),
    )


@query(
    "q44_repetition_ratio",
    r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents
    ),
    g AS (
        SELECT doc_id, toks,
               CASE WHEN len(toks) >= 3
                    THEN list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                    ELSE [] END AS grams
        FROM t
    )
    SELECT doc_id,
           CASE WHEN len(toks) >= 3
                THEN ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
                ELSE 0.0 END AS repetition
    FROM g
    """,
)
def q44(spark, sf):
    """Repetition ratio: duplicated-trigram fraction — the C4-style
    boilerplate/spam signal for corpus filtering."""
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", ta.repetition_ratio_col(F.col("text"), 3).alias("repetition"))


@query(
    "q45_pii_scrub",
    r"""
    WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 4 = 0
                    THEN text || ' contact user' || doc_id || '@example.com or https://ex.org/p/' || doc_id
                    ELSE text END AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
           md5(regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^\s]+', '<URL>', 'g')) AS scrubbed_hash
    FROM aug
    """,
)
def q45(spark, sf):
    """PII scrubbing: count + mask emails/URLs (synthetic PII injected on a
    quarter of documents so the masking is exercised on real matches)."""
    d = load_table(spark, sf, "documents")
    aug = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
                 F.lit("@example.com or https://ex.org/p/"), F.col("doc_id").cast("string")),
    ).otherwise(F.col("text"))
    n_emails, n_urls = ta.pii_counts_col(aug)
    return d.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        F.md5(ta.scrub_pii_col(aug)).alias("scrubbed_hash"),
    )


_ANN_INVARIANT_ORACLE = """
    SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_results,
           CAST(0 AS BIGINT) AS top1_vec_id, CAST(1.0 AS DOUBLE) AS top1_similarity,
           1 AS recall_ok, true AS sorted_ok
"""


def _ann_invariants(results, exact, k: int = 10, recall_floor: float = 0.4):
    """Driver-checkable invariant summary for approximate-ANN queries whose
    codebooks aren't SQL-reproducible: instead of a rows-only record, emit
    (top-1 identity, recall@k >= floor vs the exact scan, sorted order) and
    compare against a constant oracle row. A broken quantizer, a lost
    shortlist, or an unsorted output all flip a column and fail the gate.
    The floor sits below the measured deterministic recall (0.5–0.7 on the
    synthetic corpus at sf0.001/sf0.01; seeded KMeans, so reproducible)."""
    from ocr_vector_db_spark.operators.retrieval import bounded_window

    w = bounded_window(F.col("similarity"), F.desc("similarity"), F.asc("vec_id"))
    ranked = results.select(
        "vec_id", "similarity", F.row_number().over(w).alias("rank")
    )
    wprev = bounded_window(F.col("rank"), F.asc("rank"))
    flagged = ranked.withColumn(
        "non_increasing",
        F.coalesce(F.col("similarity") <= F.lag("similarity").over(wprev), F.lit(True)),
    )
    hits = flagged.join(
        exact.select(F.col("vec_id").alias("exact_vec_id")),
        flagged.vec_id == F.col("exact_vec_id"),
        "left",
    )
    return hits.agg(
        F.lit(k).cast("bigint").alias("k"),
        F.count("*").alias("n_results"),
        F.max(F.when(F.col("rank") == 1, F.col("vec_id"))).alias("top1_vec_id"),
        F.round(F.max(F.when(F.col("rank") == 1, F.col("similarity"))), 6).alias(
            "top1_similarity"
        ),
        F.when(
            F.count("exact_vec_id") >= F.lit(int(recall_floor * k)), 1
        ).otherwise(0).alias("recall_ok"),
        F.bool_and("non_increasing").alias("sorted_ok"),
    )


@query("q46_pq_compression_search", _ANN_INVARIANT_ORACLE)
def q46(spark, sf):
    """Product quantization lifecycle: train codebooks (M KMeans fits),
    encode the corpus to M-byte codes, ADC top-k with exact refine.
    KMeans codebooks aren't SQL-reproducible, so the gate checks invariants
    (see _ann_invariants): top-1 must be the query vector itself at
    similarity 1.0, recall@10 vs the exact scan >= 0.4, output sorted."""
    from ocr_vector_db_spark.operators.pq import PQIndex

    e = load_table(spark, sf, "embeddings")
    pq = PQIndex.train(e, dim=64, m=8, k=16)
    encoded = pq.encode(e)
    qv = _query_vec(spark, sf, 0)
    results = pq.search(encoded, qv, 10).select("vec_id", "label", "similarity")
    exact = knn.knn_brute_force(e, qv, 10)
    return _ann_invariants(results, exact)


@query("q53_ivfpq_search", _ANN_INVARIANT_ORACLE)
def q53(spark, sf):
    """IVF-PQ (FAISS IndexIVFPQ, the columnar way): KMeans coarse quantizer
    partitions PQ-compressed RESIDUAL codes by cluster_id; search is a
    union of nprobe partition-pruned code scans (literal ADC distance
    tables, whole-stage codegen) + exact re-rank of the candidate heads.
    KMeans clustering isn't SQL-reproducible, so the gate checks invariants
    (see _ann_invariants)."""
    import tempfile

    from ocr_vector_db_spark.operators.ivfpq import IVFPQIndex

    e = load_table(spark, sf, "embeddings")
    idx = IVFPQIndex.build(
        spark, e, tempfile.mkdtemp(prefix="ivfpq_q53_"), dim=64,
        num_clusters=8, m=8, k=16,
    )
    qv = _query_vec(spark, sf, 0)
    results = idx.search(qv, 10, nprobe=3, corpus=e).select(
        "vec_id", "label", "similarity"
    )
    exact = knn.knn_brute_force(e, qv, 10)
    return _ann_invariants(results, exact)


@query(
    "q57_deterministic_split",
    """
    WITH assigned AS (
        SELECT lang, n_chars,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY split, lang
    """,
)
def q57(spark, sf):
    """Reproducible train/val/test assignment: hash-mod split on md5(id)
    (first hex byte < 0xcc ≈ 80% / < 0xe6 ≈ 90%). Unlike seeded random
    sampling, the assignment is a pure function of the row key — stable
    across engines, re-runs, repartitions, and incremental appends, which
    is what a training pipeline needs for split integrity at 100 TB. The
    per-(split, lang) rollup doubles as the stratification check."""
    d = load_table(spark, sf, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@query(
    "q58_event_gaps_lag",
    """
    WITH ordered AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    gaps AS (
        SELECT user_id,
               date_diff('millisecond', prev_ts, ts) AS gap_ms
        FROM ordered WHERE prev_ts IS NOT NULL
    )
    SELECT user_id, COUNT(*) AS n_gaps,
           CAST(MAX(gap_ms) AS BIGINT) AS max_gap_ms,
           ROUND(AVG(gap_ms), 4) AS avg_gap_ms
    FROM gaps GROUP BY user_id ORDER BY user_id LIMIT 200
    """,
)
def q58(spark, sf):
    """Inter-event gap analysis via lag(): per-user deterministic ordering
    (ts, event_id), exact integer millisecond gaps, one window shuffle on
    user_id then per-partition sorted streaming — the idle-time /
    bot-detection signal behind sessionization thresholds."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .withColumn(
            "gap_ms",
            (F.unix_millis(F.col("ts")) - F.unix_millis(F.col("prev_ts"))),
        )
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.max("gap_ms").cast("bigint").alias("max_gap_ms"),
            F.round(F.avg("gap_ms"), 4).alias("avg_gap_ms"),
        )
        .orderBy("user_id")
        .limit(200)
    )


@query(
    "q59_intersect_except",
    """
    WITH made AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                  WHERE o_orderstatus = 'F'),
    big AS (SELECT DISTINCT o_custkey AS custkey FROM orders
            WHERE o_totalprice > 150000),
    both_sets AS (SELECT custkey FROM made INTERSECT SELECT custkey FROM big),
    only_f AS (SELECT custkey FROM made EXCEPT SELECT custkey FROM big)
    SELECT 'intersect' AS set_op, COUNT(*) AS n FROM both_sets
    UNION ALL
    SELECT 'except' AS set_op, COUNT(*) AS n FROM only_f
    """,
)
def q59(spark, sf):
    """Set operations (SURVEY §2.7 had only union-dedup): INTERSECT and
    EXCEPT compile to left-semi / left-anti hash joins over the distinct
    key sets — no row explosion, one shuffle each."""
    o = load_table(spark, sf, "orders")
    made = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    big = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    inter = made.intersect(big).agg(F.count("*").alias("n")).select(
        F.lit("intersect").alias("set_op"), "n"
    )
    exc = made.exceptAll(big).agg(F.count("*").alias("n")).select(
        F.lit("except").alias("set_op"), "n"
    )
    return inter.unionByName(exc)


@query(
    "q60_price_histogram",
    """
    SELECT CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
    FROM lineitem GROUP BY 1
    """,
)
def q60(spark, sf):
    """Fixed-width histogram: binning is a projection (codegen), the agg
    carries #buckets partials — the profile-a-column primitive that stays
    one scan + one tiny shuffle at any scale."""
    l = load_table(spark, sf, "lineitem")
    return (
        l.withColumn(
            "bucket", F.floor(F.col("l_extendedprice") / 5000.0).cast("bigint")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("l_extendedprice").cast("double").alias("lo"),
            F.max("l_extendedprice").cast("double").alias("hi"),
        )
    )


@query(
    "q61_ntile_deciles",
    """
    WITH ranked AS (
        SELECT o_custkey, o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    SELECT decile, COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM ranked GROUP BY decile
    """,
)
def q61(spark, sf):
    """Decile assignment over a deterministic total order — the
    quantile-bucketing used for quality-score stratification.  Identical
    output to ``ntile(10) OVER (ORDER BY ...)`` (the oracle), but computed
    with the cutpoint pattern (operators/ranking.py): ONE hash shuffle on a
    derived range-bucket id (recomputed deterministically per branch — no
    exchange reuse) + broadcast per-bucket offsets instead of an Exchange
    SinglePartition — the last global-sort plan in the inventory, now
    scale-safe."""
    from ocr_vector_db_spark.operators.ranking import exact_ntile

    o = load_table(spark, sf, "orders")
    return (
        exact_ntile(o, ["o_totalprice", "o_orderkey"], 10, out_col="decile")
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


_SHINGLE_CTE = r"""
    toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id AS doc, unnest(
            CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)), i -> array_to_string(list_slice(t, i, i + 1), ' '))
                 ELSE [] END) AS shingle
        FROM toks
    )
"""


@query(
    "q62_decontamination",
    f"""
    WITH {_SHINGLE_CTE},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc < 5),
    corpus AS (SELECT doc, shingle FROM sh WHERE doc >= 5),
    totals AS (SELECT doc, COUNT(*) AS n_shingles FROM corpus GROUP BY doc),
    overlap AS (
        SELECT c.doc, COUNT(*) AS n_overlap
        FROM corpus c JOIN bench b ON c.shingle = b.shingle
        GROUP BY c.doc
    )
    SELECT t.doc AS doc_id, t.n_shingles,
           COALESCE(o.n_overlap, 0) AS n_overlap,
           ROUND(COALESCE(o.n_overlap, 0) / CAST(t.n_shingles AS DOUBLE), 6)
               AS contamination,
           (COALESCE(o.n_overlap, 0) / CAST(t.n_shingles AS DOUBLE)) >= 0.3
               AS contaminated
    FROM totals t LEFT JOIN overlap o ON t.doc = o.doc
    """,
)
def q62(spark, sf):
    """Benchmark decontamination: flag training documents whose 2-gram sets
    overlap a held-out benchmark set (docs 0-4 stand in for the eval
    corpus). The benchmark shingle set is DISTINCT and benchmark-sized →
    broadcast inner join against the exploded corpus shingles; totals come
    from the same exploded pass. The standard eval-leak scrub at corpus
    scale (cf. GPT-3 appendix C / The Pile §6.3 methodology)."""
    from ocr_vector_db_spark.operators.dedup import _doc_shingles

    d = load_table(spark, sf, "documents")
    sh = _doc_shingles(d, "text", "doc_id", 2)
    bench = F.broadcast(
        sh.filter(F.col("doc") < 5).select("shingle").distinct()
    )
    corpus = sh.filter(F.col("doc") >= 5)
    totals = corpus.groupBy("doc").agg(F.count("*").alias("n_shingles"))
    overlap = corpus.join(bench, "shingle").groupBy("doc").agg(
        F.count("*").alias("n_overlap")
    )
    ratio = F.col("n_overlap") / F.col("n_shingles").cast("double")
    return (
        totals.join(overlap, "doc", "left")
        .withColumn("n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)))
        .select(
            F.col("doc").alias("doc_id"),
            "n_shingles",
            "n_overlap",
            F.round(ratio, 6).alias("contamination"),
            (ratio >= 0.3).alias("contaminated"),
        )
    )


def _quality_gate_sql() -> str:
    return f"""
    WITH q AS ({{q24}}),
    r AS ({{q44}}),
    l AS ({{q23}})
    SELECT d.doc_id, q.quality, r.repetition, l.lang_pred,
           (q.quality >= 0.5 AND r.repetition <= 0.5
            AND l.lang_pred <> 'unknown') AS keep,
           concat_ws(',',
               CASE WHEN q.quality < 0.5 THEN 'low_quality' END,
               CASE WHEN r.repetition > 0.5 THEN 'repetitive' END,
               CASE WHEN l.lang_pred = 'unknown' THEN 'unknown_lang' END)
               AS reasons
    FROM documents d
    JOIN q ON d.doc_id = q.doc_id
    JOIN r ON d.doc_id = r.doc_id
    JOIN l ON d.doc_id = l.doc_id
    """


@query("q63_quality_gate")
def q63(spark, sf):
    """Composite C4/Gopher-style quality gate: length/stopword/punctuation
    score + 3-gram repetition + language-ID combine into a keep/drop
    verdict with machine-readable reasons — one scan, all codegen
    expressions, the fan-in filter a training pipeline runs before
    tokenization. Oracle = the q23/q24/q44 oracles composed as CTEs."""
    d = load_table(spark, sf, "documents")
    quality = ta.quality_score_col(F.col("text"))
    repetition = ta.repetition_ratio_col(F.col("text"))
    lang = ta.detect_language_col(F.col("text"))
    scored = d.select(
        "doc_id",
        quality.alias("quality"),
        repetition.alias("repetition"),
        lang.alias("lang_pred"),
    )
    keep = (
        (F.col("quality") >= 0.5)
        & (F.col("repetition") <= 0.5)
        & (F.col("lang_pred") != "unknown")
    )
    reasons = F.concat_ws(
        ",",
        F.when(F.col("quality") < 0.5, "low_quality"),
        F.when(F.col("repetition") > 0.5, "repetitive"),
        F.when(F.col("lang_pred") == "unknown", "unknown_lang"),
    )
    return scored.select(
        "doc_id", "quality", "repetition", "lang_pred",
        keep.alias("keep"), reasons.alias("reasons"),
    )


ORACLES["q63_quality_gate"] = (
    _quality_gate_sql()
    .replace("{q24}", ORACLES["q24_quality_score"])
    .replace("{q44}", ORACLES["q44_repetition_ratio"])
    .replace("{q23}", ORACLES["q23_language_id"])
)


_COMPONENTS_SQL = f"""
    WITH RECURSIVE pairs AS ({_MH_CAND_SQL}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE est_jaccard >= 0.5
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs WHERE est_jaccard >= 0.5
    ),
    reach(id, comp) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
    )
    SELECT id AS doc_id, MIN(comp) AS component_id,
           (id = MIN(comp)) AS is_canonical
    FROM reach GROUP BY id
    """


_KEEP_BEST_SQL = f"""
    WITH RECURSIVE pairs AS ({_MH_CAND_SQL}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE est_jaccard >= 0.5
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs WHERE est_jaccard >= 0.5
    ),
    reach(id, comp) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (SELECT id AS doc_id, MIN(comp) AS component_id FROM reach GROUP BY id),
    q AS ({{q24}}),
    ranked AS (
        SELECT c.component_id, c.doc_id, q.quality,
               CAST(row_number() OVER (
                   PARTITION BY c.component_id
                   ORDER BY q.quality DESC, c.doc_id) AS BIGINT) AS rk,
               COUNT(*) OVER (PARTITION BY c.component_id) AS n_members
        FROM comp c JOIN q ON c.doc_id = q.doc_id
    )
    SELECT component_id, doc_id AS kept_doc_id, quality AS kept_quality,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rk = 1
    """


@query("q64_dedup_keep_best")
def q64(spark, sf):
    """Keep-best dedup: per near-dup cluster (q56's transitive closure),
    retain the highest-quality member (q24's score, ties on id) — what a
    production pipeline actually keeps, vs. min-id canonicalization. One
    window over the tiny (clustered-docs × 1) frame after the closure."""
    from ocr_vector_db_spark.operators.dedup import connected_components, minhash_lsh_candidates

    d = load_table(spark, sf, "documents")
    pairs = minhash_lsh_candidates(
        d, num_hashes=16, bands=4, n=2, text_col="text", id_col="doc_id"
    )
    comp = connected_components(pairs.filter(F.col("est_jaccard") >= 0.5)).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component_id")
    )
    quality = d.select("doc_id", ta.quality_score_col(F.col("text")).alias("quality"))
    joined = comp.join(quality, "doc_id")
    w = Window.partitionBy("component_id").orderBy(F.desc("quality"), "doc_id")
    wc = Window.partitionBy("component_id")
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc).cast("bigint"))
        .filter(F.col("rk") == 1)
        .select(
            "component_id",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("quality").alias("kept_quality"),
            "n_members",
        )
    )


ORACLES["q64_dedup_keep_best"] = _KEEP_BEST_SQL.replace(
    "{q24}", ORACLES["q24_quality_score"]
)


@query("q56_neardup_components", _COMPONENTS_SQL)
def q56(spark, sf):
    """Duplicate-cluster connected components over the MinHash-LSH pair
    graph (est_jaccard >= 0.5): transitive closure via min-label
    propagation, canonical doc = min id per cluster. The oracle computes
    the same closure with a recursive CTE."""
    d = load_table(spark, sf, "documents")
    pairs = dedup.minhash_lsh_candidates(
        d, num_hashes=16, bands=4, n=2, text_col="text", id_col="doc_id"
    )
    comp = dedup.connected_components(pairs.filter(F.col("est_jaccard") >= 0.5))
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("component_id"),
        (F.col("id") == F.col("comp")).alias("is_canonical"),
    )


@query(
    "q54_tfidf_top_terms",
    """
    WITH w AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
        FROM documents
    ),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w WHERE word <> ''
           GROUP BY doc_id, word),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    s AS (
        SELECT tf.doc_id, tf.word, tf.tf, df.df,
               ROUND(tf.tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0), 6) AS tfidf
        FROM tf JOIN df USING (word) CROSS JOIN n
    ),
    r AS (SELECT *, CAST(row_number() OVER (
              PARTITION BY doc_id ORDER BY tfidf DESC, word) AS BIGINT) AS rank
          FROM s)
    SELECT doc_id, rank, word, tf, df, tfidf FROM r WHERE rank <= 3
    """,
)
def q54(spark, sf):
    """Corpus TF-IDF with top-3 characteristic terms per document — the
    vocabulary/keyword-extraction staple of an LLM data pipeline. Integer
    tf/df aggregates are exact; the word→df join broadcasts (Heaps'-law
    small vocab); per-doc top-k is a window, no global sort."""
    from ocr_vector_db_spark.operators.tfidf import top_terms_per_doc

    return top_terms_per_doc(load_table(spark, sf, "documents"), k=3)


@query(
    "q55_int8_quantized_knn",
    """
    WITH e AS (
        SELECT vec_id, label,
               list_transform(
                   embedding::DOUBLE[],
                   x -> ROUND(x * (127.0 / list_max(
                            list_transform(embedding::DOUBLE[], y -> abs(y)))))
               ) AS codes
        FROM embeddings
    ),
    q AS (SELECT codes AS qc FROM e WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           ROUND(list_dot_product(e.codes, q.qc)
                 / (sqrt(list_dot_product(e.codes, e.codes))
                    * sqrt(list_dot_product(q.qc, q.qc))), 6) AS sim_q
    FROM e CROSS JOIN q
    ORDER BY sim_q DESC, e.vec_id LIMIT 10
    """,
)
def q55(spark, sf):
    """Int8 scalar-quantized KNN: symmetric per-vector quantization (4×
    smaller scannable state), cosine over integer codes — exact bigint
    sums make the approximate scores bit-reproducible across partition
    orders, so even the quantized path is oracle-checkable."""
    from ocr_vector_db_spark.functions.vector import int8_cosine_col, quantize_int8_col

    e = load_table(spark, sf, "embeddings").withColumn(
        "codes", quantize_int8_col(F.col("embedding"))
    )
    qc = [
        int(x)
        for x in e.filter(F.col("vec_id") == 0).select("codes").head().codes
    ]
    qcol = F.array(*[F.lit(c) for c in qc])
    return (
        e.select(
            "vec_id",
            "label",
            F.round(int8_cosine_col(F.col("codes"), qcol), 6).alias("sim_q"),
        )
        .orderBy(F.desc("sim_q"), "vec_id")
        .limit(10)
    )


@query(
    "q47_stats_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q47(spark, sf):
    """Statistical aggregates: exact interpolated percentiles (the sort-based
    path — percentile_approx is the at-scale variant with the same call
    shape), correlation and sample stddev."""
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.count("*").alias("n"),
    )


@query(
    "q48_cube_agg",
    f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {_sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q48(spark, sf):
    """CUBE aggregation across order status × priority (grouping-sets
    family, complements q40's rollup)."""
    o = load_table(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum(F.col("o_totalprice")).alias("total")
    )


@query(
    "q49_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {_sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           epoch_us(o.o_orderdate::TIMESTAMP) AS o_orderdate_us, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
)
def q49(spark, sf):
    """TPC-H-Q3-shaped: selective fact-fact join + grouped revenue + top-k.
    Customer filter broadcasts; AQE picks the lineitem⋈orders strategy."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    cut = F.lit("1998-03-15").cast("timestamp")
    sel_c = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    sel_o = o.filter(F.col("o_orderdate") < cut)
    sel_l = li.filter(F.col("l_shipdate") > cut)
    return (
        sel_o.join(F.broadcast(sel_c), sel_o["o_custkey"] == sel_c["c_custkey"])
        .join(sel_l, sel_l["l_orderkey"] == sel_o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q50_regional_supplier_volume",
    f"""
    SELECT n.n_name,
           {_sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q50(spark, sf):
    """TPC-H-Q5-shaped 5-way join: dims broadcast down onto the fact scan,
    one agg shuffle total."""
    r = load_table(spark, sf, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    n = load_table(spark, sf, "nation")
    s = load_table(spark, sf, "supplier")
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey")
    dims = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(F.broadcast(dims), li["l_suppkey"] == dims["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q51_range_join_binned",
    f"""
    SELECT e.event_id,
           CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks,
           {_sql_dsum('c.value')} AS click_value
    FROM events e
    LEFT JOIN events c
      ON c.user_id = e.user_id AND c.event_type = 'click'
     AND c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts < e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def q51(spark, sf):
    """Time-range join done the scale-safe way: binned equi-join on
    (user_id, time-bucket) + exact filter instead of an inequality join
    (which Catalyst would plan as a broadcast-nested-loop). For every error
    event: clicks by the same user in the preceding 10 minutes."""
    from ocr_vector_db_spark.operators.range_join import range_join_binned

    e = load_table(spark, sf, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts",
        F.col("value").alias("click_val"),
    )
    pairs = range_join_binned(errors, clicks, ["user_id"], -600.0, 0.0)
    hit = pairs.groupBy("event_id").agg(
        F.count("click_id").alias("__n"), dsum(F.col("click_val")).alias("__v")
    )
    return (
        errors.select("event_id")
        .join(hit, "event_id", "left")
        .select(
            "event_id",
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_clicks"),
            F.col("__v").alias("click_value"),
        )
    )


@query(
    "q52_parent_synthesis_legacy",
    """
    SELECT * FROM (VALUES
        ('/corpus/chapters.md',   '6642d5b79abbc5a3f77b9e988ff6431a'),
        ('/corpus/decorators.md', '0ca1ef53bdfa9cd014056770f37dc924'),
        ('/corpus/generators.md', '3087c04c9e94447999e26ce8687c065b'),
        ('/corpus/korean.md',     'bb6a078b8ab2751724993898817d43a1'),
        ('/corpus/scan.ocr',      'ea2dbb53b07cc299abc8b3f9d4e99dcb')
    ) AS t(id, content_hash)
    """,
)
def q52(spark, sf):
    """Legacy parent synthesis (app/parents.py:94-182): header detection +
    first caption + sentence-truncated body per parent group. The regex
    header-fallback and sentence-boundary truncation are per-group
    sequential logic (applyInPandas), not SQL-expressible — so the check is
    a golden VALUES oracle over a deterministic fixture corpus (same
    contract as q35/q98; was rows-only before round 4). The extra fixtures
    exercise the 'Chapter N' and Korean '제 N 장' header fallbacks and the
    caption extractor."""
    from ocr_vector_db_spark.operators.parents import synthesize_parents_legacy

    extra = [
        ("/corpus/chapters.md",
         "Chapter 3\nThe shuffle boundary splits stages. Wide ops shuffle. "
         "Narrow ops do not. Extra trailing sentence for truncation checks.",
         "md"),
        ("/corpus/korean.md",
         "제 2 장\n분산 처리 엔진은 셔플 경계를 기준으로 스테이지를 나눈다. "
         "그림 1: 스테이지 경계 다이어그램",
         "md"),
    ]
    rows = [
        (p, t, "text", "pre_text", 0)
        for p, t, _k in list(_FIXTURE_FILES) + extra
    ]
    frags = spark.createDataFrame(
        rows,
        "concept_id string, content string, view string, unit_role string, "
        "`order` int",
    )
    out = synthesize_parents_legacy(frags)
    return out.select("id", F.md5("content").alias("content_hash"))


# =====================================================================
# Round-1 batch 2: corpus statistics, vector aggregation, time series
# =====================================================================


@query(
    "q65_token_zipf_topk",
    """
    WITH w AS (
        SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
        FROM documents
    )
    SELECT token, COUNT(*) AS cnt
    FROM w WHERE token <> ''
    GROUP BY token ORDER BY cnt DESC, token LIMIT 50
    """,
)
def q65(spark, sf):
    """Global token-frequency top-k (Zipf head): the corpus vocabulary scan
    behind TF-IDF / BPE tokenizer training. explode -> hash agg relies on
    map-side partial aggregation so the shuffle carries one row per distinct
    token per partition (vocabulary-sized, ~1e6), not one per token
    occurrence (~1e11 at 100 TB); top-k is TakeOrderedAndProject."""
    d = load_table(spark, sf, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(50)
    )


_DIM = 64


@query(
    "q66_label_centroids",
    f"""
    SELECT label, CAST(r.i AS BIGINT) AS dim,
           ROUND(CAST(SUM(CAST(ROUND(CAST(embedding[CAST(r.i + 1 AS INT)] AS DOUBLE) * 1000000.0, 0)
                              AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*), 6)
               AS centroid
    FROM embeddings CROSS JOIN range({_DIM}) r(i)
    GROUP BY label, r.i
    """,
)
def q66(spark, sf):
    """Per-label centroid (elementwise mean embedding) — the class-prototype /
    KMeans-update aggregation. One pass, one {_DIM}-column partial agg per
    group (exact scaled-bigint sums: elements rounded to 6 dp then summed as
    integers — order-independent like decimal but ~40% cheaper to
    analyze+codegen and 8-byte accumulators on the wire; overflow-safe to
    ~1e11 rows per label, see q33): the shuffle carries
    n_labels x {_DIM} accumulators, NOT n_rows x dim exploded rows — at 100 TB
    the posexplode formulation would shuffle 64x the table; this shuffles KB.
    Built plan memoized per (session, sf) like q33 — the wide generated SQL
    costs ~0.4s to parse+analyze per construction."""
    key = (spark.sparkContext.applicationId, sf, "q66")
    if key in _PLAN_MEMO:
        return _PLAN_MEMO[key]
    e = load_table(spark, sf, "embeddings")
    e.createOrReplaceTempView("q66_embeddings")
    # Generated-SQL construction: a 64-dim expression tree built column by
    # column costs hundreds of Py4J round trips (~1.3s driver latency); one
    # parse of generated SQL yields the identical plan (see q33).
    sum_terms = ", ".join(
        f"SUM(CAST(ROUND(CAST(embedding[{i}] AS DOUBLE) * 1000000.0, 0) AS BIGINT))"
        f" AS s{i}"
        for i in range(_DIM)
    )
    mean_terms = ", ".join(
        f"ROUND(CAST(s{i} AS DOUBLE) / 1000000.0 / n, 6)" for i in range(_DIM)
    )
    # the posexplode here runs over n_labels pre-aggregated rows (KB-scale),
    # not the input table — input rows never explode
    out = spark.sql(f"""
        WITH sums AS (
            SELECT label, COUNT(*) AS n, {sum_terms}
            FROM q66_embeddings GROUP BY label
        ),
        m AS (SELECT label, posexplode(array({mean_terms})) AS (dim, centroid)
              FROM sums)
        SELECT label, CAST(dim AS BIGINT) AS dim, centroid FROM m
    """)
    _PLAN_MEMO[key] = out
    return out


@query(
    "q67_user_moving_avg",
    """
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS mov_avg
    FROM events
    """,
)
def q67(spark, sf):
    """Trailing moving average (4-event frame) per user: the smoothing window
    behind rate/engagement time series. One shuffle on user_id, then
    per-partition sorted streaming frames; deterministic (ts, event_id)
    order makes the 4-element IEEE sum identical on both engines."""
    e = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("mov_avg")
    )


@query(
    "q68_zscore_outliers",
    """
    WITH stats AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s,
               CAST(SUM(CAST(ROUND(value * value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS ss
        FROM events GROUP BY event_type
    ),
    z AS (
        SELECT e.event_type, e.value, s.s / s.n AS mean,
               sqrt((s.ss - s.s * s.s / s.n) / (s.n - 1)) AS std
        FROM events e JOIN stats s USING (event_type)
    )
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE abs((value - mean) / std) > 2.0)
                AS BIGINT) AS n_outliers,
           COUNT(*) AS n_total,
           ROUND(COUNT(*) FILTER (WHERE abs((value - mean) / std) > 2.0)
                 * 1.0 / COUNT(*), 6) AS outlier_rate
    FROM z GROUP BY event_type
    """,
)
def q68(spark, sf):
    """Z-score outlier rates per event type. Moments (n, sum, sum-of-squares)
    come from one exact decimal-sum pass — associativity-proof, unlike
    stddev_samp's float partials — then mean/std derive identically on both
    engines. Stats frame is tiny -> broadcast back onto the fact scan: two
    scans, zero wide shuffles beyond the 5-group agg."""
    e = load_table(spark, sf, "events")
    stats = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        dsum(F.col("value")).alias("s"),
        dsum(F.col("value") * F.col("value")).alias("ss"),
    )
    z = e.join(F.broadcast(stats), "event_type").select(
        "event_type",
        (
            F.abs(
                (F.col("value") - F.col("s") / F.col("n"))
                / F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1))
            )
            > 2.0
        ).alias("is_outlier"),
    )
    return z.groupBy("event_type").agg(
        F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).cast("bigint").alias("n_outliers"),
        F.count("*").alias("n_total"),
        F.round(
            F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)) / F.count("*"), 6
        ).alias("outlier_rate"),
    )


@query(
    "q69_funnel_full_outer",
    """
    WITH c AS (
        SELECT user_id, COUNT(*) AS n_clicks FROM events
        WHERE event_type = 'click' GROUP BY user_id
    ),
    p AS (
        SELECT user_id, COUNT(*) AS n_purchases FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    f AS (
        SELECT COALESCE(c.user_id, p.user_id) AS user_id,
               COALESCE(c.n_clicks, 0) AS n_clicks,
               COALESCE(p.n_purchases, 0) AS n_purchases
        FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    )
    SELECT CASE WHEN n_clicks > 0 AND n_purchases > 0 THEN 'both'
                WHEN n_clicks > 0 THEN 'click_only'
                ELSE 'purchase_only' END AS segment,
           COUNT(*) AS n_users,
           CAST(SUM(n_clicks) AS BIGINT) AS total_clicks,
           CAST(SUM(n_purchases) AS BIGINT) AS total_purchases
    FROM f GROUP BY 1
    """,
)
def q69(spark, sf):
    """Funnel reconciliation via FULL OUTER join of two per-user aggregates
    (clicks vs purchases) — the classic activity-overlap segmentation. Both
    sides pre-aggregate before the join, so the full-outer shuffle carries
    one row per user, not per event; same-key (user_id) partitioning is
    reused across agg and join (one exchange, AQE-coalesced)."""
    e = load_table(spark, sf, "events")
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id").agg(F.count("*").alias("n_clicks"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id").agg(F.count("*").alias("n_purchases"))
    )
    f = (
        c.join(p, "user_id", "full_outer")
        .select(
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
            F.coalesce(F.col("n_purchases"), F.lit(0)).alias("n_purchases"),
        )
    )
    seg = (
        F.when((F.col("n_clicks") > 0) & (F.col("n_purchases") > 0), "both")
        .when(F.col("n_clicks") > 0, "click_only")
        .otherwise("purchase_only")
    )
    return f.groupBy(seg.alias("segment")).agg(
        F.count("*").alias("n_users"),
        F.sum("n_clicks").alias("total_clicks"),
        F.sum("n_purchases").alias("total_purchases"),
    )


def _corr_sql(x: str, y: str, name: str) -> str:
    return f"""
        SELECT '{name}' AS pair,
               ROUND((n * sxy - sx * sy)
                     / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                   AS corr
        FROM (
            SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(ROUND({x}, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(ROUND({y}, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(ROUND({x} * {y}, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(ROUND({x} * {x}, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(ROUND({y} * {y}, 6) AS DECIMAL(38,6))) AS DOUBLE) AS syy
            FROM lineitem
        )
    """


@query(
    "q70_column_correlations",
    " UNION ALL ".join(
        [
            _corr_sql("l_quantity", "l_extendedprice", "qty_price"),
            _corr_sql("l_extendedprice", "l_discount", "price_discount"),
            _corr_sql("l_quantity", "l_tax", "qty_tax"),
        ]
    ),
)
def q70(spark, sf):
    """Pearson correlation matrix from exact moments: one scan computes all
    five decimal sums per pair (single multi-aggregate pass — Spark's corr()
    uses float partials whose order shifts results; moments are
    associativity-proof). 3 pairs derive from ONE 1-row aggregate, then a
    driver-side literal union — no second scan."""
    li = load_table(spark, sf, "lineitem")

    def moments(x, y):
        return [
            dsum(F.col(x)).alias(f"sx_{x}_{y}"),
            dsum(F.col(y)).alias(f"sy_{x}_{y}"),
            dsum(F.col(x) * F.col(y), 6).alias(f"sxy_{x}_{y}"),
            dsum(F.col(x) * F.col(x), 6).alias(f"sxx_{x}_{y}"),
            dsum(F.col(y) * F.col(y), 6).alias(f"syy_{x}_{y}"),
        ]

    pairs = [
        ("l_quantity", "l_extendedprice", "qty_price"),
        ("l_extendedprice", "l_discount", "price_discount"),
        ("l_quantity", "l_tax", "qty_tax"),
    ]
    aggs = [F.count("*").alias("n")]
    for x, y, _ in pairs:
        aggs += moments(x, y)
    m = li.agg(*aggs)

    def corr_col(x, y, name):
        n = F.col("n")
        sx, sy = F.col(f"sx_{x}_{y}"), F.col(f"sy_{x}_{y}")
        sxy, sxx, syy = (
            F.col(f"sxy_{x}_{y}"), F.col(f"sxx_{x}_{y}"), F.col(f"syy_{x}_{y}")
        )
        return F.struct(
            F.lit(name).alias("pair"),
            F.round(
                (n * sxy - sx * sy)
                / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                6,
            ).alias("corr"),
        )

    rows = F.array(*[corr_col(x, y, nm) for x, y, nm in pairs])
    return m.select(F.explode(rows).alias("r")).select("r.pair", "r.corr")


@query(
    "q71_weekday_hour_profile",
    """
    SELECT CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hod,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q71(spark, sf):
    """Weekday x hour activity heatmap: calendar-function extraction
    (ISO weekday parity between engines: Spark weekday()+1 == DuckDB isodow)
    feeding a tiny 7x24-group agg — pure map-side combine, the shuffle
    carries at most 168 rows per partition."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(
            (F.expr("weekday(ts)") + 1).cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hod"),
        )
        .agg(F.count("*").alias("n_events"), dsum(F.col("value")).alias("total_value"))
    )


@query(
    "q72_rank_function_suite",
    """
    SELECT user_id,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           ROUND(percent_rank() OVER w, 6) AS prnk,
           ROUND(cume_dist() OVER w, 6) AS cdist,
           lead(event_id) OVER w AS next_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
    """,
)
def q72(spark, sf):
    """Full ranking-function suite (rank / dense_rank / percent_rank /
    cume_dist / lead) in ONE window spec — one shuffle on user_id, one
    per-partition sort serves all five functions; deterministic
    (value DESC, event_id) ordering."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return e.select(
        "user_id",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@query(
    "q73_levenshtein_neardup",
    """
    WITH k AS (
        SELECT doc_id, lang, CAST(n_chars / 200 AS BIGINT) AS size_bucket,
               substr(text, 1, 40) AS head
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
    FROM k a JOIN k b
      ON a.lang = b.lang AND a.size_bucket = b.size_bucket
     AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 12
    """,
)
def q73(spark, sf):
    """Edit-distance near-dup candidates with blocking: the O(n^2) distance
    join is confined to (lang, size-bucket) blocks — an equi-join, NOT a
    cross join — so at 100 TB each shuffle bucket holds one block's worth
    of rows and the quadratic term is bounded per block. levenshtein() is
    JVM whole-stage-codegen on both engines."""
    d = load_table(spark, sf, "documents")
    k = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 200).cast("bigint").alias("size_bucket"),
        F.substring("text", 1, 40).alias("head"),
    )
    a, b = k.alias("a"), k.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.size_bucket") == F.col("b.size_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("a.head"), F.col("b.head")).cast("bigint"),
        )
        .filter(F.col("edit_dist") <= 12)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "edit_dist",
        )
    )


@query(
    "q74_time_spine_gapfill",
    """
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
        FROM bounds
    ),
    agg AS (
        SELECT date_trunc('hour', ts) AS hour_ts, COUNT(*) AS n
        FROM events GROUP BY 1
    )
    SELECT epoch_us(s.hour_ts::TIMESTAMP) AS hour_ts_us, COALESCE(a.n, 0) AS n_events,
           (a.n IS NULL) AS is_gap
    FROM spine s LEFT JOIN agg a ON s.hour_ts = a.hour_ts
    """,
)
def q74(spark, sf):
    """Dense hourly time spine with gap filling: sequence() generates the
    spine from the global min/max (1-row agg), left-joins the hourly
    pre-aggregate, and flags empty hours. Both join sides are hour-count
    sized (the event side is already reduced by its group-by), so the
    pre-agg is broadcast — the only wide shuffle is the hourly agg itself."""
    e = load_table(spark, sf, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts")
    )
    agg = e.groupBy(F.date_trunc("hour", "ts").alias("hour_ts")).agg(
        F.count("*").alias("n")
    )
    return (
        spine.join(F.broadcast(agg), "hour_ts", "left")
        .select(
            F.unix_micros("hour_ts").alias("hour_ts_us"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.col("n").isNull().alias("is_gap"),
        )
    )


def _pagerank_sql(iterations: int = 5, scale: int = 9) -> str:
    """Unrolled fixed-iteration PageRank: no recursive aggregation needed —
    each iteration is a plain (ranks ⋈ edges) group-by CTE, mirroring
    operators/graph.py::pagerank's decimal-sum determinism contract."""
    step = (
        "pr{k} AS (\n"
        "        SELECT e.dst AS id,\n"
        "               ROUND(CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)\n"
        "                     + CAST(0.85 AS DOUBLE) * CAST(SUM(CAST(\n"
        "                         ROUND(p.rank / d.deg, {s}) AS DECIMAL(28,{s})))\n"
        "                       AS DOUBLE), {s}) AS rank\n"
        "        FROM pr{j} p JOIN deg d ON p.id = d.id\n"
        "        JOIN edges e ON e.src = p.id\n"
        "        GROUP BY e.dst\n"
        "    )"
    )
    steps = ",\n    ".join(
        step.format(k=i + 1, j=i, s=scale) for i in range(iterations)
    )
    return f"""
    WITH pairs AS MATERIALIZED ({_MH_CAND_SQL}),
    edges AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE est_jaccard >= 0.5
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs WHERE est_jaccard >= 0.5
    ),
    deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    pr0 AS (
        SELECT id, ROUND(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), {scale}) AS rank
        FROM deg
    ),
    {steps}
    SELECT id AS doc_id, ROUND(rank, 6) AS pagerank FROM pr{iterations}
    """


@query("q75_pagerank_neardup_graph", _pagerank_sql(5))
def q75(spark, sf):
    """PageRank (5 iterations, damping 0.85) over the symmetrized MinHash-
    LSH near-dup graph: ranks the most-connected member of each duplicate
    cluster. Iterative driver loop; per-iteration determinism via round-9 +
    decimal sums lets a non-recursive unrolled-CTE oracle reproduce it
    exactly. Edges are cached and hash-partitioned once; only the
    nodes-sized rank table moves each iteration."""
    from ocr_vector_db_spark.operators.graph import pagerank

    d = load_table(spark, sf, "documents")
    pairs = dedup.minhash_lsh_candidates(
        d, num_hashes=16, bands=4, n=2, text_col="text", id_col="doc_id"
    ).filter(F.col("est_jaccard") >= 0.5)
    # materialize the LSH pipeline once: both union branches and every
    # pagerank iteration read the tiny pair list, not the shingle join
    pairs = pairs.localCheckpoint(eager=False)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    pr = pagerank(edges, iterations=5)
    return pr.select(
        F.col("id").alias("doc_id"), F.round("rank", 6).alias("pagerank")
    )


def _pagerank_dangling_sql(iterations: int = 5, scale: int = 9) -> str:
    """Unrolled PageRank WITH dangling-mass redistribution: the DIRECTED
    (doc_a → doc_b) near-dup pairs leave every max-id-only node with
    out-degree 0; each iteration their decimal-summed rank is shared to
    the whole node universe as share = dangling_mass/n, mirroring
    graph.py::pagerank(dangling='redistribute') float-op for float-op."""
    s = scale
    step = (
        "dm{j} AS (\n"
        "        SELECT ROUND(COALESCE(CAST(SUM(CAST(p.rank AS\n"
        "                   DECIMAL(28,{s}))) AS DOUBLE), CAST(0.0 AS DOUBLE))\n"
        "                 / (SELECT n FROM nn), {s}) AS share\n"
        "        FROM pr{j} p LEFT JOIN deg d ON p.id = d.id\n"
        "        WHERE d.id IS NULL\n"
        "    ),\n"
        "    pr{k} AS (\n"
        "        SELECT nd.id,\n"
        "               ROUND(CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)\n"
        "                     + CAST(0.85 AS DOUBLE)\n"
        "                       * (COALESCE(agg.s, CAST(0.0 AS DOUBLE))\n"
        "                          + (SELECT share FROM dm{j})), {s}) AS rank\n"
        "        FROM nodes nd LEFT JOIN (\n"
        "            SELECT e.dst AS id,\n"
        "                   CAST(SUM(CAST(ROUND(p.rank / d.deg, {s})\n"
        "                       AS DECIMAL(28,{s}))) AS DOUBLE) AS s\n"
        "            FROM pr{j} p JOIN deg d ON p.id = d.id\n"
        "            JOIN edges e ON e.src = p.id\n"
        "            GROUP BY e.dst\n"
        "        ) agg ON nd.id = agg.id\n"
        "    )"
    )
    steps = ",\n    ".join(
        step.format(k=i + 1, j=i, s=s) for i in range(iterations)
    )
    return f"""
    WITH pairs AS MATERIALIZED ({_MH_CAND_SQL}),
    edges AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE est_jaccard >= 0.5
    ),
    deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg FROM edges GROUP BY src),
    nodes AS MATERIALIZED (
        SELECT DISTINCT id FROM (
            SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
        )
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    pr0 AS (
        SELECT id, ROUND(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), {s}) AS rank
        FROM nodes
    ),
    {steps}
    SELECT id AS doc_id, ROUND(rank, 6) AS pagerank FROM pr{iterations}
    """


@query("q113_pagerank_dangling_redistribute", _pagerank_dangling_sql(5))
def q113(spark, sf):
    """q75's PageRank on the DIRECTED (unsymmetrized) near-dup pair list —
    every node that only ever appears as doc_b has out-degree 0, so this
    exercises `pagerank(dangling='redistribute')`: per iteration the
    dangling nodes' decimal-summed rank is spread to every node as
    dangling_mass/n (Brin & Page's handling), keeping total mass at ~1
    instead of leaking it. The default mode refuses dangling graphs
    loudly (unit-tested); this query pins the redistribution arithmetic
    to a 5-iteration unrolled-CTE oracle. Scale shape: unchanged from
    q75 — the dangling share is a 1-row aggregate crossJoined broadcast,
    no extra wide shuffle per iteration."""
    from ocr_vector_db_spark.operators.graph import pagerank

    d = load_table(spark, sf, "documents")
    pairs = dedup.minhash_lsh_candidates(
        d, num_hashes=16, bands=4, n=2, text_col="text", id_col="doc_id"
    ).filter(F.col("est_jaccard") >= 0.5)
    pairs = pairs.localCheckpoint(eager=False)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    pr = pagerank(edges, iterations=5, dangling="redistribute")
    return pr.select(
        F.col("id").alias("doc_id"), F.round("rank", 6).alias("pagerank")
    )


def _zorder_sql() -> str:
    from ocr_vector_db_spark.operators.layout import bucketize_expr, morton_expr

    xb = bucketize_expr(
        "l_quantity",
        "(SELECT MIN(l_quantity) FROM lineitem)",
        "(SELECT MAX(l_quantity) FROM lineitem)",
    )
    yb = bucketize_expr(
        "l_extendedprice",
        "(SELECT MIN(l_extendedprice) FROM lineitem)",
        "(SELECT MAX(l_extendedprice) FROM lineitem)",
    )
    z = morton_expr(xb, yb)
    return f"""
    WITH keyed AS (SELECT l_quantity, l_extendedprice, {z} AS z_key FROM lineitem)
    SELECT CAST(FLOOR(z_key / 4096.0) AS BIGINT) AS z_tile,
           COUNT(*) AS n,
           ROUND(MIN(l_quantity), 6) AS min_qty, ROUND(MAX(l_quantity), 6) AS max_qty,
           ROUND(MIN(l_extendedprice), 6) AS min_price,
           ROUND(MAX(l_extendedprice), 6) AS max_price
    FROM keyed GROUP BY 1
    """


@query("q76_zorder_tiles", _zorder_sql())
def q76(spark, sf):
    """Z-order (Morton) layout keys over (l_quantity, l_extendedprice),
    aggregated per 4096-key tile: each tile's min/max spans a narrow window
    of BOTH columns — the file-statistics pruning this layout buys at 100 TB
    (write path: operators/layout.py::write_zordered, range-partitioned +
    sorted by z_key). Key arithmetic is the same shifts/ands expression
    string Spark and DuckDB both compile."""
    from ocr_vector_db_spark.operators.layout import zorder_key

    li = load_table(spark, sf, "lineitem")
    r = li.agg(
        F.min("l_quantity"), F.max("l_quantity"),
        F.min("l_extendedprice"), F.max("l_extendedprice"),
    ).head()
    bounds = {
        "l_quantity": (float(r[0]), float(r[1])),
        "l_extendedprice": (float(r[2]), float(r[3])),
    }
    keyed = zorder_key(li, "l_quantity", "l_extendedprice", bounds=bounds)
    return (
        keyed.groupBy(F.floor(F.col("z_key") / 4096.0).cast("bigint").alias("z_tile"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_quantity"), 6).alias("min_qty"),
            F.round(F.max("l_quantity"), 6).alias("max_qty"),
            F.round(F.min("l_extendedprice"), 6).alias("min_price"),
            F.round(F.max("l_extendedprice"), 6).alias("max_price"),
        )
    )


@query(
    "q77_grouping_sets",
    """
    SELECT event_type,
           CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(GROUPING(event_type, isodow(ts)) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type, isodow(ts)), (event_type), (isodow(ts)), ())
    """,
)
def q77(spark, sf):
    """Explicit GROUPING SETS (finer than q40's rollup / q48's cube): four
    simultaneous granularities in ONE pass — Spark expands the sets during
    partial aggregation, so the scan happens once and the shuffle carries
    per-set group partials; grouping_id disambiguates the NULL-keyed
    subtotal rows exactly as GROUPING() does in the oracle."""
    e = load_table(spark, sf, "events").select(
        "event_type",
        (F.expr("weekday(ts)") + 1).cast("bigint").alias("dow"),
        "value",
    )
    return (
        e.groupingSets(
            [["event_type", "dow"], ["event_type"], ["dow"], []],
            "event_type",
            "dow",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").alias("n"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select("event_type", "dow", "gid", "n", "total_value")
    )


@query(
    "q78_from_json_struct",
    """
    SELECT CAST(FLOOR(CAST(props->>'$.k' AS INTEGER) / 10.0) AS BIGINT) AS k_bucket,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_value
    FROM events
    WHERE CAST(props->>'$.k' AS INTEGER) >= 20
    GROUP BY 1
    """,
)
def q78(spark, sf):
    """Schema-projected JSON parse: from_json with an explicit struct schema
    (vs q31's per-path get_json_object) — one parse materializes every
    needed field, the struct is pruned by Catalyst (OptimizeJsonExprs
    collapses unused fields), and the nested value feeds filter + bucket +
    agg entirely in codegen."""
    e = load_table(spark, sf, "events")
    parsed = e.select(
        F.from_json("props", "k INT").alias("p"), "value"
    ).filter(F.col("p.k") >= 20)
    return (
        parsed.groupBy(
            F.floor(F.col("p.k") / 10.0).cast("bigint").alias("k_bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(dsum(F.col("value")) / F.count("*"), 6).alias("avg_value"),
        )
    )


@query(
    "q79_array_hof_suite",
    """
    SELECT vec_id,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0.1)) AS BIGINT)
               AS n_above,
           ROUND(list_max(embedding::DOUBLE[]), 6) AS max_val,
           ROUND(list_min(embedding::DOUBLE[]), 6) AS min_val,
           CAST(len(embedding) AS BIGINT) AS dim
    FROM embeddings
    """,
)
def q79(spark, sf):
    """Array higher-order-function suite over the embedding column: filter
    (predicate HOF), array_max/min, size — all JVM codegen expressions, the
    per-element work never leaves the scan stage (the pattern the vector
    functions build on: functions/vector.py)."""
    e = load_table(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0.1)).cast("bigint").alias("n_above"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        F.size("embedding").cast("bigint").alias("dim"),
    )


@query(
    "q80_interval_range_window",
    """
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY epoch(ts)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS events_last_hour
    FROM events
    """,
)
def q80(spark, sf):
    """Time-interval RANGE window: per event, how many events the same user
    fired in the trailing hour — the rate-limit / burst-detection primitive.
    RANGE frames bound by VALUE (epoch seconds), not row count, so ties and
    gaps are handled exactly; one shuffle on user_id, then sorted streaming
    with a sliding frame pointer (O(n) per partition, no per-row rescan)."""
    e = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("events_last_hour"),
    )


@query(
    "q81_ordered_string_agg",
    """
    SELECT lang,
           string_agg(source, ',' ORDER BY doc_id) AS sources,
           COUNT(*) AS n
    FROM (
        SELECT lang, doc_id, source,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
        FROM documents
    ) WHERE rk <= 5
    GROUP BY lang
    """,
)
def q81(spark, sf):
    """Deterministic ordered string aggregation (string_agg ... ORDER BY):
    top-5 doc sources per language concatenated in id order. Spark composes
    it from collect_list(struct) + array_sort + transform + concat_ws — the
    collect stays bounded (5 rows/group) because the window filter runs
    FIRST; an unbounded listagg over a hot group is the thing to avoid at
    scale."""
    d = load_table(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    top = d.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
    pairs = F.array_sort(F.collect_list(F.struct("doc_id", "source")))
    return top.groupBy("lang").agg(
        F.concat_ws(",", F.transform(pairs, lambda x: x.source)).alias("sources"),
        F.count("*").alias("n"),
    )


@query(
    "q82_unigram_cross_entropy",
    r"""
    WITH tk AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
            FROM documents
        ) WHERE tok <> ''
    ),
    vocab AS MATERIALIZED (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
    n AS (SELECT COUNT(*) AS n FROM tk),
    scored AS (
        SELECT t.doc_id,
               ROUND(-ln(CAST(v.cnt AS DOUBLE) / n.n), 6) AS nlp
        FROM tk t JOIN vocab v USING (tok) CROSS JOIN n
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(CAST(SUM(CAST(nlp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
               AS avg_neg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def q82(spark, sf):
    """Unigram cross-entropy per document (CCNet-style perplexity filter):
    fit the corpus unigram LM in one token agg, broadcast the vocabulary
    (Heaps'-law sized) back onto the token stream, and average -ln p(tok)
    per doc. Low entropy ≈ boilerplate/repetition, high ≈ noise — the
    standard mid-band keep rule for training data. Two shuffles total
    (vocab agg, per-doc agg); the LM join is broadcast, the token stream is
    never re-shuffled."""
    d = load_table(spark, sf, "documents")
    tk = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    vocab = tk.groupBy("tok").agg(F.count("*").alias("cnt")).cache()
    # total tokens from the (vocab-sized, cached) counts — avoids a second
    # full tokenization pass over the corpus just for the scalar
    n = vocab.agg(F.sum("cnt")).head()[0]
    scored = tk.join(F.broadcast(vocab), "tok").select(
        "doc_id",
        F.round(-F.log(F.col("cnt").cast("double") / F.lit(n)), 6).alias("nlp"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(
            F.sum(F.col("nlp").cast("decimal(28,6)")).cast("double") / F.count("*"),
            6,
        ).alias("avg_neg_logprob"),
    )


@query(
    "q83_scd2_versioning",
    """
    SELECT user_id, event_type AS state,
           epoch_us(ts::TIMESTAMP) AS valid_from_us,
           epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               ::TIMESTAMP) AS valid_to_us,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL) AS is_current
    FROM events
    """,
)
def q83(spark, sf):
    """Slowly-changing-dimension (type 2) versioning: each user's event
    stream becomes contiguous validity intervals — valid_from = change ts,
    valid_to = next change (NULL ⇒ current row). One shuffle on the entity
    key, then lead() over the sorted partition; the as-of join (q41) is the
    read-side companion for point-in-time lookups against this shape."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "q84_readability_stats",
    r"""
    WITH s AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(text, '[.!?]+'),
                               x -> trim(x) <> '')) AS n_sentences,
               len(list_filter(string_split_regex(text, '\s+'),
                               x -> x <> '')) AS n_words,
               length(replace(text, ' ', '')) AS n_nonspace_chars
        FROM documents
    )
    SELECT doc_id,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_words AS BIGINT) AS n_words,
           ROUND(CASE WHEN n_sentences > 0
                      THEN CAST(n_words AS DOUBLE) / n_sentences END, 6)
               AS words_per_sentence,
           ROUND(CASE WHEN n_words > 0
                      THEN CAST(n_nonspace_chars AS DOUBLE) / n_words END, 6)
               AS chars_per_word
    FROM s
    """,
)
def q84(spark, sf):
    """Readability / surface statistics per document (sentence length, word
    length) — the cheap quality signals next to q24's composite score. Pure
    per-row string expressions: map-only, zero shuffles, whole-stage
    codegen; the CASE guards keep ANSI division safe on degenerate docs."""
    d = load_table(spark, sf, "documents")
    n_sent = F.size(
        F.filter(
            F.split("text", r"[.!?]+"), lambda x: F.trim(x) != ""
        )
    )
    n_words = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    n_chars = F.length(F.regexp_replace("text", " ", ""))
    return d.select(
        "doc_id",
        n_sent.cast("bigint").alias("n_sentences"),
        n_words.cast("bigint").alias("n_words"),
        F.round(
            F.when(n_sent > 0, n_words.cast("double") / n_sent), 6
        ).alias("words_per_sentence"),
        F.round(
            F.when(n_words > 0, n_chars.cast("double") / n_words), 6
        ).alias("chars_per_word"),
    )


@query(
    "q85_temperature_source_remix",
    """
    WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_n FROM counts),
    weighted AS (
        SELECT source, n, total_n,
               ROUND(POW(CAST(n AS DOUBLE) / total_n, 0.7), 6) AS w
        FROM counts CROSS JOIN tot
    ),
    z AS (SELECT CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS Z FROM weighted),
    rates AS (
        SELECT source, n,
               ROUND(LEAST(CAST(1.0 AS DOUBLE),
                           CAST(0.5 AS DOUBLE) * total_n * w / Z / n), 6) AS rate
        FROM weighted CROSS JOIN z
    ),
    kept AS (
        SELECT d.source
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
              / CAST(4294967296.0 AS DOUBLE) < r.rate
    )
    SELECT r.source, r.n AS n_orig, k.n_kept, r.rate
    FROM rates r JOIN (SELECT source, COUNT(*) AS n_kept FROM kept GROUP BY source) k
      ON r.source = k.source
    """,
)
def q85(spark, sf):
    """Temperature-based source re-mixing (alpha=0.7, half-corpus budget):
    the training-mix construction step — up-weight tail sources, cap head
    sources, then keep rows by a DETERMINISTIC md5-uniform draw against each
    source's rate (a pure function of the row key: stable across engines,
    re-runs, repartitions — q57's split-integrity property, with data-driven
    rates). Rate computation touches only the source dimension (tiny);
    the corpus pays one broadcast join + map-side filter, no shuffle."""
    d = load_table(spark, sf, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").cast("bigint").alias("total_n"))
    weighted = counts.crossJoin(F.broadcast(tot)).withColumn(
        "w", F.round(F.pow(F.col("n").cast("double") / F.col("total_n"), 0.7), 6)
    )
    z = weighted.agg(
        F.sum(F.col("w").cast("decimal(28,6)")).cast("double").alias("Z")
    )
    rates = weighted.crossJoin(F.broadcast(z)).withColumn(
        "rate",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(0.5) * F.col("total_n") * F.col("w") / F.col("Z") / F.col("n"),
            ),
            6,
        ),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") / F.lit(4294967296.0)
    )
    kept = (
        d.join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(u < F.col("rate"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        rates.select("source", F.col("n").alias("n_orig"), "rate")
        .join(kept, "source")
        .select("source", "n_orig", "n_kept", "rate")
    )


# =====================================================================
# PDF ingestion + OCR-invocation policy
# =====================================================================


def _pdf_fixture_files() -> list[tuple[str, bytes]]:
    """Three deterministic fixture PDFs (pure-Python writer, no library):
    text-rich (policy: sufficient, no OCR), code-bearing (policy: preserve
    deterministic), sparse junk (policy: vision allowed — but no provider
    is wired in this query, so deterministic output is preserved)."""
    from ocr_vector_db_spark.sources.pdf_decode import build_simple_pdf

    report = build_simple_pdf([
        [
            {"kind": "text", "x": 72, "y": 720, "size": 12,
             "text": "Quarterly Retrieval System Report\n"
                     "This report details the ingestion volumes and latency "
                     "profiles across all collections."},
            {"kind": "text", "x": 72, "y": 560, "size": 12,
             "text": "Latency stayed below the target envelope for every "
                     "percentile tracked during the quarter."},
            {"kind": "image", "x": 72, "y": 300, "w": 240, "h": 160,
             "width": 480, "height": 320},
        ],
        [
            {"kind": "text", "x": 72, "y": 700, "size": 12,
             "text": "Appendix with methodology notes and the complete "
                     "measurement protocol for reproducibility."},
        ],
    ])
    snippets = build_simple_pdf([[
        {"kind": "text", "x": 72, "y": 700, "size": 10,
         "text": "def retry(fn):\n    return fn\nimport os"},
    ]])
    scanned = build_simple_pdf([[
        {"kind": "text", "x": 72, "y": 700, "size": 12,
         "text": "|| -- .. ~~ :: || -- .. ~~ :: || -- .. ~~ ::"},
    ]])
    return [
        ("/corpus/report.pdf", report),
        ("/corpus/snippets.pdf", snippets),
        ("/corpus/scanned.pdf", scanned),
    ]


@query(
    "q86_pdf_ingest",
    """
    SELECT * FROM (VALUES
        ('/corpus/report.pdf', 'text', 'none', 0, 0, 210, 'Quarterly Retrieval System Rep'),
        ('/corpus/report.pdf', 'text', 'none', 2, 1, 90, 'Appendix with methodology note'),
        ('/corpus/scanned.pdf', 'code', 'python', 0, 0, 44, '|| -- .. ~~ :: || -- .. ~~ :: '),
        ('/corpus/snippets.pdf', 'code', 'python', 0, 0, 36, e'def retry(fn):\\n\\nreturn fn\\n\\nimp')
    ) AS t(source_path, kind, language, seg_order, page, n_chars, prefix)
    """,
)
def q86(spark, sf):
    """PDF ingestion end-to-end with zero native dependencies: fixture PDFs
    (Flate-compressed, multi-page, image XObjects) → pure-Python
    content-stream decode (sources/pdf_decode.py) → block merge + min-length
    filter → Vision Invocation Policy → code re-classification — all inside
    mapInPandas, one document per row (parsers.parse_pdf; reference
    pymupdf_parser.py:180-242). Deterministic fixtures ⇒ golden VALUES
    oracle, like q35."""
    from ocr_vector_db_spark.sources.ingest import parse_pdf_segments, pdf_files_df

    files = pdf_files_df(spark, _pdf_fixture_files())
    segs = parse_pdf_segments(files)
    return segs.select(
        "source_path", "kind",
        F.coalesce("language", F.lit("none")).alias("language"),
        F.col("order").alias("seg_order"), "page",
        F.length("content").alias("n_chars"),
        F.substring("content", 1, 30).alias("prefix"),
    ).orderBy("source_path", "seg_order")


@query(
    "q87_ocr_policy_gate",
    r"""
    WITH m AS (
        SELECT doc_id,
               length(text) AS n_chars,
               length(trim(text)) AS n_trimmed,
               CASE WHEN length(text) > 0
                    THEN length(regexp_replace(text, '[^A-Za-z0-9가-힣]', '', 'g'))::DOUBLE
                         / length(text)
                    ELSE 0.0 END AS ratio,
               (CASE WHEN regexp_matches(text, '\bdef\s+\w+') THEN 1 ELSE 0 END
                + CASE WHEN regexp_matches(text, '\bclass\s+\w+') THEN 1 ELSE 0 END
                + CASE WHEN regexp_matches(text, '\bimport\s+\w+') THEN 1 ELSE 0 END
                + CASE WHEN regexp_matches(text, '\bfrom\s+\w+\s+import') THEN 1 ELSE 0 END
                + CASE WHEN regexp_matches(text, '\bfunction\s+\w+') THEN 1 ELSE 0 END
                + CASE WHEN regexp_matches(text, '\bconst\s+\w+') THEN 1 ELSE 0 END
                + CASE WHEN regexp_matches(text, '\blet\s+\w+') THEN 1 ELSE 0 END
                + CASE WHEN regexp_matches(text, '\bvar\s+\w+') THEN 1 ELSE 0 END
                + CASE WHEN regexp_matches(text, '\basync\s+') THEN 1 ELSE 0 END
                + CASE WHEN regexp_matches(text, '\bawait\s+') THEN 1 ELSE 0 END
               ) AS code_hits
        FROM documents
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           ROUND(ratio, 6) AS alnum_ratio,
           code_hits,
           (NOT (n_trimmed >= 100 AND ratio >= 0.3)) AND code_hits < 2
               AS vision_allowed
    FROM m
    """,
)
def q87(spark, sf):
    """Vision-OCR invocation policy as a corpus-wide column predicate
    (sources/ocr_policy.py; reference thresholds pymupdf_parser.py:675-759):
    text sufficiency (>=100 trimmed chars AND alnum ratio >= 0.3), >=2 code
    patterns, and the resulting gate decision per document. Pure per-row
    expressions — map-only, zero shuffles; composed upstream of
    ocr_with_cache so only admitted rows ever reach the provider."""
    from ocr_vector_db_spark.sources.ocr_policy import (
        alnum_ratio_col, code_pattern_count_col, vision_allowed_col,
    )

    d = load_table(spark, sf, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).cast("bigint").alias("n_chars"),
        F.round(alnum_ratio_col(t), 6).alias("alnum_ratio"),
        code_pattern_count_col(t).alias("code_hits"),
        vision_allowed_col(t).alias("vision_allowed"),
    )


def _simhash_pairs_sql(bits: int = 16, r: int = 2) -> str:
    band_union = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {j} AS band, (simhash >> {lo}) & {(1 << w) - 1} AS val FROM sig"
        for j, (lo, w) in enumerate(dedup.simhash_band_widths(bits, r))
    )
    return f"""
    WITH sig AS ({_simhash_sql(bits)}),
    bands AS (
        {band_union}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {r}
    """


@query("q88_simhash_banded_pairs", _simhash_pairs_sql(16, 2))
def q88(spark, sf):
    """SimHash near-dup pairs within Hamming distance 2 via pigeonhole
    banding (r+1 bands, exact-match band join, bit_count verify) — the r>0
    generalization of q21's r=0 bucket; see operators/dedup.py
    simhash_near_dup_pairs for the scale shape. Reference analogue:
    approximate HNSW recall (storage/schema.py:80-85)."""
    d = load_table(spark, sf, "documents")
    return dedup.simhash_near_dup_pairs(d, bits=16, r=2)


# =====================================================================
# Hybrid retrieval, sequence packing, semantic dedup
# =====================================================================

_BM25_TERMS = ["vector", "hash", "spark"]


def _bm25_scored_sql(terms: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB twin of operators/retrieval.bm25_scores — literals emitted with
    repr() so both engines evaluate the exact same doubles, and the per-term
    contribution is rounded+decimal-summed like the Spark side."""
    in_list = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    c1 = repr(k1 + 1.0)
    c2 = repr(1.0 - b)
    idf = "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
    tf_part = f"(tf * {c1}) / (tf + {k1!r} * ({c2} + {b!r} * dl / avgdl))"
    return f"""
    base AS (
        SELECT doc_id AS id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           w -> w <> '') AS ws
        FROM documents
    ),
    d AS (SELECT id, CAST(len(ws) AS BIGINT) AS dl, ws FROM base),
    posting AS (
        SELECT id, dl, unnest(list_filter(ws, w -> w IN ({in_list}))) AS term
        FROM d
    ),
    tf AS (SELECT id, dl, term, COUNT(*) AS tf FROM posting GROUP BY id, dl, term),
    dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d),
    scored AS (
        SELECT tf.id,
               ROUND({_sql_dsum(f'({idf}) * ({tf_part})')}, 6) AS bm25
        FROM tf JOIN dfx USING (term) CROSS JOIN stats
        GROUP BY tf.id
    )"""


@query(
    "q89_bm25_topk",
    f"""
    WITH {_bm25_scored_sql(_BM25_TERMS)}
    SELECT id, bm25,
           CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, id) AS BIGINT) AS rank
    FROM scored ORDER BY bm25 DESC, id LIMIT 10
    """,
)
def q89(spark, sf):
    """BM25 lexical top-k — the sparse half of hybrid search (the reference
    retrieves dense-only, retrieval/search.py:89-116; its keyword optimizer
    retrieval/query_optimizer.py rewrites queries but still searches by
    embedding). Postings are pre-filtered to the query's terms BEFORE the
    explode, corpus stats ride a 1-row broadcast cross join, per-term df a
    ≤|query|-row broadcast join: one corpus-wide shuffle (the (doc,term) tf
    agg), top-k is TakeOrderedAndProject."""
    from ocr_vector_db_spark.operators import retrieval

    d = load_table(spark, sf, "documents")
    return retrieval.bm25_topk(d, _BM25_TERMS, k=10)


@query(
    "q101_bm25_lexical_index",
    f"""
    WITH {_bm25_scored_sql(_BM25_TERMS)}
    SELECT id, bm25,
           CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, id) AS BIGINT) AS rank
    FROM scored ORDER BY bm25 DESC, id LIMIT 10
    """,
)
def q101(spark, sf):
    """Indexed BM25 — q89's scoring served from a PERSISTED bucketed
    postings layout (operators/lexical_index.py, the sparse twin of
    IVFIndex): build writes (term, id, tf, dl) partitioned by
    pmod(xxhash64(term), n_buckets) + a 1-row stats table; search
    partition-prunes to the query terms' buckets, so per-query work is
    O(matching postings) instead of a corpus rescan. Same oracle as q89 —
    the indexed and scan formulations must score identically."""
    return _lexical_index_for(spark, sf).search(_BM25_TERMS, k=10)


# Shared by q90 (scan-path) and q102 (persisted-index path): the two
# formulations must fuse byte-identically, like q101 ≡ q89.
_HYBRID_ORACLE_SQL = f"""
    WITH {_bm25_scored_sql(_BM25_TERMS)},
    lex AS (
        SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, id) AS BIGINT) AS rank
        FROM scored QUALIFY rank <= 20
    ),
    dense AS (
        SELECT e.vec_id AS id,
               CAST(ROW_NUMBER() OVER (ORDER BY {_COS} DESC, e.vec_id) AS BIGINT) AS rank
        FROM embeddings e
        CROSS JOIN (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q
        QUALIFY rank <= 20
    ),
    u AS (
        SELECT id, CAST(rank AS DOUBLE) AS rank FROM dense
        UNION ALL
        SELECT id, CAST(rank AS DOUBLE) AS rank FROM lex
    ),
    fused AS (
        SELECT id, ROUND({_sql_dsum('1.0 / (60.0 + rank)')}, 6) AS rrf,
               COUNT(*) AS n_systems
        FROM u GROUP BY id
    )
    SELECT id, rrf, n_systems,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, id) AS BIGINT) AS fused_rank
    FROM fused
    """


@query("q90_hybrid_rrf_fusion", _HYBRID_ORACLE_SQL)
def q90(spark, sf):
    """Hybrid search: BM25 (sparse) top-20 + cosine (dense) top-20 fused by
    reciprocal-rank fusion, rrf = Σ 1/(60+rank) (Cormack et al., SIGIR'09) —
    the Elasticsearch/Vespa/Weaviate hybrid recipe the reference's dense-only
    retriever (retrieval/search.py) is one half of. The fusion input is two
    driver-bounded top-k lists, so the union+agg is KB-scale no matter the
    corpus; the dense half is TakeOrderedAndProject over one scan, the
    sparse half is q89's plan."""
    from ocr_vector_db_spark.functions.vector import cosine_similarity_col
    from ocr_vector_db_spark.operators import retrieval

    d = load_table(spark, sf, "documents")
    e = load_table(spark, sf, "embeddings")
    qv = _query_vec(spark, sf, 0)
    sim = F.round(
        cosine_similarity_col(
            F.col("embedding"), F.lit(qv).cast("array<double>")
        ),
        6,
    )
    dense = (
        e.select(F.col("vec_id").alias("id"), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("id"))
        .limit(20)
        .withColumn(
            "rank",
            F.row_number()
            .over(retrieval.bounded_window(F.col("sim"), F.desc("sim"), F.asc("id")))
            .cast("bigint"),
        )
    )
    lex = retrieval.bm25_topk(d, _BM25_TERMS, k=20)
    return retrieval.rrf_fuse({"dense": dense, "lex": lex}, k=60)


def _lexical_index_for(spark, sf):
    """Session-memoized LexicalIndex over `documents` (shared q101/q102)."""
    import tempfile

    from ocr_vector_db_spark.operators.lexical_index import LexicalIndex

    key = (spark.sparkContext.applicationId, sf, "q101_index_path")
    if key not in _PLAN_MEMO:
        d = load_table(spark, sf, "documents")
        path = tempfile.mkdtemp(prefix="lexidx_")
        LexicalIndex.build(spark, d, path, n_buckets=16)
        _PLAN_MEMO[key] = path  # build once per session, like a real index
    return LexicalIndex.load(spark, _PLAN_MEMO[key])


def _ivf_index_for(spark, sf, num_clusters: int = 8):
    """Session-memoized persisted IVFIndex over `embeddings` (q102)."""
    import tempfile

    from ocr_vector_db_spark.operators.ann_index import IVFIndex

    key = (spark.sparkContext.applicationId, sf, "q102_ivf_path")
    if key not in _PLAN_MEMO:
        e = load_table(spark, sf, "embeddings")
        path = tempfile.mkdtemp(prefix="ivfidx_")
        IVFIndex.build(spark, e, path, num_clusters=num_clusters)
        _PLAN_MEMO[key] = path
    return IVFIndex.load(spark, _PLAN_MEMO[key])


@query("q102_hybrid_indexed", _HYBRID_ORACLE_SQL)
def q102(spark, sf):
    """q90's hybrid retrieval served from the PERSISTED indexes instead of
    corpus rescans — the reference's production serving shape (GIN + HNSW
    behind one query, storage/schema.py:80-118). Sparse half: LexicalIndex
    postings buckets (partition-pruned to the query's terms); dense half:
    IVFIndex cluster partitions with a full probe (exactly equal to brute
    force, served from the partitioned layout; production sets
    nprobe « num_clusters). Same oracle as q90, byte-identical — the
    indexed and scan paths must fuse identically, like q101 ≡ q89."""
    from ocr_vector_db_spark.operators import retrieval

    lex_idx = _lexical_index_for(spark, sf)
    ivf_idx = _ivf_index_for(spark, sf)
    qv = _query_vec(spark, sf, 0)
    return retrieval.hybrid_indexed(
        lex_idx, ivf_idx, _BM25_TERMS, qv, k_each=20, fuse_k=60
    )


@query(
    "q103_ivf_incremental_add",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label, {_COS} AS similarity
    FROM embeddings e, q
    ORDER BY similarity DESC, e.vec_id LIMIT 10
    """,
)
def q103(spark, sf):
    """Incremental dense index update: IVFIndex.build on HALF the corpus,
    IVFIndex.add on the rest (new vectors assigned to their nearest
    EXISTING centroid, appended into the partitioned layout — pgvector's
    ivfflat lists-don't-move contract), then a full-probe search. Oracle =
    exact brute-force KNN over the WHOLE corpus (q16's SQL): the updated
    index must serve every added vector exactly, proving the append landed
    in the cluster layout and the search sees both halves."""
    import tempfile

    from ocr_vector_db_spark.operators.ann_index import IVFIndex

    key = (spark.sparkContext.applicationId, sf, "q103_ivf_inc_path")
    if key not in _PLAN_MEMO:
        e = load_table(spark, sf, "embeddings")
        path = tempfile.mkdtemp(prefix="ivfinc_")
        idx = IVFIndex.build(
            spark, e.filter(F.col("vec_id") % 2 == 0), path, num_clusters=8
        )
        idx.add(e.filter(F.col("vec_id") % 2 == 1))
        _PLAN_MEMO[key] = path
    idx = IVFIndex.load(spark, _PLAN_MEMO[key])
    qv = _query_vec(spark, sf, 0)
    return idx.search(qv, 10, nprobe=len(idx.centroids)).select(
        "vec_id", "label", "similarity"
    )


@query(
    "q104_lexical_incremental_add",
    f"""
    WITH {_bm25_scored_sql(_BM25_TERMS)}
    SELECT id, bm25,
           CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, id) AS BIGINT) AS rank
    FROM scored ORDER BY bm25 DESC, id LIMIT 10
    """,
)
def q104(spark, sf):
    """Incremental sparse index update: LexicalIndex.build on HALF the
    corpus, LexicalIndex.add on the rest (bucketed postings append + exact
    integer stats fold), then search. Oracle = q89's scan-path BM25 over
    the WHOLE corpus: build(A)+add(B) must score byte-identically to
    build(A∪B) — df derives at query time, N folds as a count, and avgdl
    is one double division of exact integer totals on both paths."""
    import tempfile

    from ocr_vector_db_spark.operators.lexical_index import LexicalIndex

    key = (spark.sparkContext.applicationId, sf, "q104_lex_inc_path")
    if key not in _PLAN_MEMO:
        d = load_table(spark, sf, "documents")
        path = tempfile.mkdtemp(prefix="lexinc_")
        idx = LexicalIndex.build(
            spark, d.filter(F.col("doc_id") % 2 == 0), path, n_buckets=16
        )
        idx.add(d.filter(F.col("doc_id") % 2 == 1))
        _PLAN_MEMO[key] = path
    idx = LexicalIndex.load(spark, _PLAN_MEMO[key])
    return idx.search(_BM25_TERMS, k=10)


@query("q105_minhash_incremental_screen", _MH_CROSS_SQL)
def q105(spark, sf):
    """Incremental ingestion dedup: a NEW batch (odd doc ids) screens
    against a PERSISTED MinHash index of the corpus (even doc ids) —
    operators/minhash_index.py, the dedup sibling of q101/q103's index
    family. Only the batch is shingled/hashed; the corpus side is an
    equi-join against the stored bucketed band layout plus a candidates-
    only signature join — O(batch + matches), never a corpus rescan or an
    all-pairs term. Oracle = q20's SQL machinery restricted to cross-side
    (new x indexed) pairs: the persisted screen must reproduce the scan
    formulation exactly."""
    from ocr_vector_db_spark.operators.minhash_index import MinHashIndex

    import tempfile

    d = load_table(spark, sf, "documents")
    key = (spark.sparkContext.applicationId, sf, "q105_mh_path")
    if key not in _PLAN_MEMO:
        path = tempfile.mkdtemp(prefix="mhidx_")
        MinHashIndex.build(
            spark, d.filter(F.col("doc_id") % 2 == 0), path,
            num_hashes=16, bands=4, n=2, n_buckets=16,
        )
        _PLAN_MEMO[key] = path
    idx = MinHashIndex.load(spark, _PLAN_MEMO[key])
    return idx.screen(d.filter(F.col("doc_id") % 2 == 1))


@query(
    "q107_pdf_modern_structures",
    """
    SELECT * FROM (VALUES
        ('/corpus/lzw.pdf', 'text', 75, 'LZW compressed content streams'),
        ('/corpus/objstm.pdf', 'text', 73, 'Object streams pack the catalo'),
        ('/corpus/predicted.pdf', 'image_raw', 72,
         'c52a38cfc40938e9693950ba8eed4a83'),
        ('/corpus/scan.pdf', 'image_jpeg', 70,
         '79b61015c194082562e6c006c5d005df')
    ) AS t(source_path, item, n, detail)
    """,
)
def q107(spark, sf):
    """The PDF 1.5-era structures real-world files use, end-to-end and
    distributed (golden VALUES oracle, like q86): an /ObjStm-packed page
    tree and an /LZWDecode content stream through the full parse path
    (mapInPandas, parsers.parse_pdf), plus a /Predictor 12 Flate raster
    (decoded to exact pixels — md5 is the literal of the input buffer)
    and a /DCTDecode image (verbatim JPEG passthrough) through the
    distributed asset extractor `ingest.pdf_image_assets`. Reference
    parity: PyMuPDF handles all four transparently
    (ingestion/parsers/pymupdf_parser.py:180-242,518-569)."""
    from ocr_vector_db_spark.sources.ingest import (
        parse_pdf_segments,
        pdf_files_df,
        pdf_image_assets,
    )
    from ocr_vector_db_spark.sources.pdf_decode import (
        build_objstm_pdf,
        build_simple_pdf,
    )

    objstm = build_objstm_pdf(
        "Object streams pack the catalog and page tree into one "
        "compressed stream."
    )
    lzw = build_simple_pdf([[
        {"kind": "text", "x": 72, "y": 700, "size": 12,
         "text": "LZW compressed content streams decode through the pure "
                 "Python inflate path."},
    ]], compress="lzw")
    w, h = 6, 4
    pixels = bytes((i * 11) % 256 for i in range(w * h * 3))
    predicted = build_simple_pdf([[
        {"kind": "image", "x": 0, "y": 400, "w": 120, "h": 80,
         "width": w, "height": h, "channels": 3,
         "pixels": pixels, "predictor": 12},
    ]])
    jpeg = (b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01"
            b"\x00\x00" + bytes(range(48)) + b"\xff\xd9")
    scan = build_simple_pdf([[
        {"kind": "image", "x": 0, "y": 300, "w": 200, "h": 150,
         "width": 20, "height": 15, "jpeg": jpeg},
    ]])

    texts = parse_pdf_segments(pdf_files_df(spark, [
        ("/corpus/objstm.pdf", objstm), ("/corpus/lzw.pdf", lzw),
    ])).select(
        "source_path", F.lit("text").alias("item"),
        F.length("content").cast("int").alias("n"),
        F.substring("content", 1, 30).alias("detail"),
    )
    assets = pdf_image_assets(pdf_files_df(spark, [
        ("/corpus/predicted.pdf", predicted), ("/corpus/scan.pdf", scan),
    ])).select(
        "source_path",
        F.concat(F.lit("image_"), F.col("metadata")["format"]).alias("item"),
        F.length("data").cast("int").alias("n"),
        F.md5("data").alias("detail"),
    )
    return texts.unionByName(assets).orderBy("source_path")


@query(
    "q125_pdf_ccitt_raster",
    """
    SELECT * FROM (VALUES
        ('/corpus/fax.pdf', 'image_raw', 4800,
         'd1464215e65acab691e7959f55dd1e2e'),
        ('/corpus/fax.pdf', 'text', 67, 'CCITT Group 4 fax rasters deco')
    ) AS t(source_path, item, n, detail)
    ORDER BY item
    """,
)
def q125(spark, sf):
    """The scanned-fax raster codec, end-to-end and distributed (golden
    VALUES oracle, q107's pattern): a /CCITTFaxDecode K -1 (Group 4 MMR)
    bilevel image decodes through the pure-Python ITU-T T.6 codec
    (`sources/ccitt.py`) inside the distributed asset extractor
    `ingest.pdf_image_assets` — pixel-exact (md5 is the literal of the
    semantic gray buffer, black=0) — while the same page's text rides the
    normal parse path. Reference parity: PyMuPDF decodes CCITT rasters
    transparently (ingestion/parsers/pymupdf_parser.py:518-569); this
    closes the last real-world raster codec on the pure-Python path."""
    from ocr_vector_db_spark.sources.ingest import (
        parse_pdf_segments,
        pdf_files_df,
        pdf_image_assets,
    )
    from ocr_vector_db_spark.sources.pdf_decode import build_simple_pdf

    w, h = 120, 40
    pix = bytes(
        1 if (x % 7 == 0 or y == 20) else 0
        for y in range(h) for x in range(w)
    )
    fax = build_simple_pdf([[
        {"kind": "text", "x": 50, "y": 700, "size": 12,
         "text": "CCITT Group 4 fax rasters decode through the pure "
                 "Python T.6 codec."},
        {"kind": "image", "x": 50, "y": 300, "w": 240, "h": 80,
         "width": w, "height": h, "ccitt": True, "pixels": pix},
    ]])
    files = pdf_files_df(spark, [("/corpus/fax.pdf", fax)])
    texts = parse_pdf_segments(files).select(
        "source_path", F.lit("text").alias("item"),
        F.length("content").cast("int").alias("n"),
        F.substring("content", 1, 30).alias("detail"),
    )
    assets = pdf_image_assets(files).select(
        "source_path",
        F.concat(F.lit("image_"), F.col("metadata")["format"]).alias("item"),
        F.length("data").cast("int").alias("n"),
        F.md5("data").alias("detail"),
    )
    return assets.unionByName(texts).orderBy("item")


@query(
    "q108_ivfpq_incremental_add",
    """
    SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_results,
           CAST(1 AS BIGINT) AS top1_vec_id,
           CAST(1.0 AS DOUBLE) AS top1_similarity,
           1 AS recall_ok, true AS sorted_ok,
           (SELECT COUNT(*) FROM embeddings) AS n_codes,
           CAST(0 AS BIGINT) AS readd_added
    """,
)
def q108(spark, sf):
    """Incremental compressed-index update: IVFPQIndex.build on HALF the
    corpus (even vec_ids), IVFPQIndex.add on the rest — new vectors
    assigned to their nearest FROZEN centroid and their residuals encoded
    with the FROZEN codebooks (the ivfflat lists-don't-move contract
    applied to both quantizer levels; q103's dense sibling). The quantizers
    aren't SQL-reproducible, so the gate checks invariants: the query is
    the exact embedding of vec 1 — an ADDED (odd) vector — so top-1 must
    be vec 1 at similarity 1.0 (proving the append landed in the cluster
    layout AND is served), recall@10 vs the exact scan >= floor, output
    sorted, code count == corpus count (conservation), and a re-submitted
    batch adds 0 (re-add guard)."""
    import tempfile

    from ocr_vector_db_spark.operators.ivfpq import IVFPQIndex

    e = load_table(spark, sf, "embeddings")
    key = (spark.sparkContext.applicationId, sf, "q108_ivfpq_inc_path")
    if key not in _PLAN_MEMO:
        path = tempfile.mkdtemp(prefix="ivfpqinc_")
        idx = IVFPQIndex.build(
            spark, e.filter(F.col("vec_id") % 2 == 0), path, dim=64,
            num_clusters=8, m=8, k=16,
        )
        idx.add(e.filter(F.col("vec_id") % 2 == 1))
        # one-time maintenance facts of this memoized index — the code
        # count after the add and the guard's no-op result are properties
        # of the persisted layout, identical on every re-execution, so
        # they join the memo instead of re-running a guarded add per call
        n_codes = idx.codes().count()
        readd = idx.add(e.filter(F.col("vec_id") % 2 == 1))  # guard no-op
        _PLAN_MEMO[key] = (path, n_codes, readd)
    path, n_codes, readd = _PLAN_MEMO[key]
    idx = IVFPQIndex.load(spark, path)
    qv = _query_vec(spark, sf, 1)
    results = idx.search(
        qv, 10, nprobe=len(idx.centroids), corpus=e, refine=8
    ).select("vec_id", "label", "similarity")
    exact = knn.knn_brute_force(e, qv, 10)
    inv = _ann_invariants(results, exact)
    return inv.withColumn(
        "n_codes", F.lit(n_codes).cast("bigint")
    ).withColumn("readd_added", F.lit(readd).cast("bigint"))


@query(
    "q114_ivfpq_batch_serving",
    """
    SELECT (SELECT COUNT(*) FROM embeddings
            WHERE vec_id IN (0, 7, 23, 42)) AS n_queries,
           true AS k_rows_each, true AS self_top1, true AS batch_eq_serving
    """,
)
def q114(spark, sf):
    """Batched IVF-PQ serving: `search_batch` answers MANY queries in ONE
    plan — executor-side probe ranking (broadcast centroid crossJoin +
    window), executor-side ADC tables (residuals against the literal
    codebook, never driver-computed per query), one pruned codes scan
    joined on cluster_id, per-query two-phase top-k, batched exact refine.
    The quantizers aren't SQL-reproducible, so the gate checks invariants
    over q108's incrementally-built index (build evens + add odds):
      n_queries         grounded: the query vectors must exist
      k_rows_each       every query returns exactly k rows
      self_top1         each corpus-drawn query ranks ITSELF first at
                        similarity 1.0 through full probe + refine
      batch_eq_serving  the batched rows (id, similarity, rank) equal the
                        per-query `search` loop's, query for query — the
                        strongest check: both paths share distance math
                        bit-for-bit, so any probe/table/window divergence
                        flips this column."""
    import tempfile

    from ocr_vector_db_spark.operators.ivfpq import IVFPQIndex

    e = load_table(spark, sf, "embeddings")
    key = (spark.sparkContext.applicationId, sf, "q108_ivfpq_inc_path")
    if key not in _PLAN_MEMO:
        path = tempfile.mkdtemp(prefix="ivfpqinc_")
        idx = IVFPQIndex.build(
            spark, e.filter(F.col("vec_id") % 2 == 0), path, dim=64,
            num_clusters=8, m=8, k=16,
        )
        idx.add(e.filter(F.col("vec_id") % 2 == 1))
        n_codes = idx.codes().count()
        readd = idx.add(e.filter(F.col("vec_id") % 2 == 1))
        _PLAN_MEMO[key] = (path, n_codes, readd)
    idx = IVFPQIndex.load(spark, _PLAN_MEMO[key][0])

    qids = [0, 7, 23, 42]
    qdf = e.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    full = len(idx.centroids)
    batch = idx.search_batch(
        qdf, 10, nprobe=full, corpus=e, refine=8
    ).select("query_id", "vec_id", "similarity", "rank")
    got = {(r.query_id, r.rank): (r.vec_id, r.similarity)
           for r in batch.collect()}  # bounded: |Q|·k = 40 rows
    qvecs = {r.query_id: list(r.embedding) for r in qdf.collect()}
    eq = True
    for qid in qids:
        single = idx.search(
            qvecs[qid], 10, nprobe=full, corpus=e, refine=8
        ).collect()
        for rk, r in enumerate(single, start=1):
            if got.get((qid, rk)) != (r.vec_id, r.similarity):
                eq = False
    per_q = {}
    for (qid, _rk) in got:
        per_q[qid] = per_q.get(qid, 0) + 1
    return spark.createDataFrame(
        [(
            len(qvecs),
            all(per_q.get(qid) == 10 for qid in qids),
            all(got.get((qid, 1)) == (qid, 1.0) for qid in qids),
            eq,
        )],
        "n_queries bigint, k_rows_each boolean, self_top1 boolean, "
        "batch_eq_serving boolean",
    )


@query(
    "q115_ivf_hierarchical_quantizer",
    """
    SELECT (SELECT COUNT(*) FROM embeddings
            WHERE vec_id IN (0, 7, 23, 42)) AS n_queries,
           true AS probes_eq_flat, true AS assign_eq_flat,
           true AS served_self_top1
    """,
)
def q115(spark, sf):
    """Two-level (hierarchical) coarse quantizer — the shape that clears
    the LAST flat-IVF ceiling at 100 TB (SCALING.md: 180k clusters ≈
    1.1 GB of centroids — too big to broadcast to executors or rank
    per-query on the driver). `build(l1_branches=…)` fits a tiny L1 layer
    over the cluster centroids and persists the L2 centroids as parquet
    PARTITIONED BY l1_id; probe ranking costs |L1| + branches·(k2/|L1|)
    comparisons and distributed assignment becomes broadcast-L1 + an
    equi-join against the centroid table — nothing num_clusters-sized
    ships anywhere. KMeans isn't SQL-reproducible, so the gate checks
    invariants:
      n_queries        grounded: the probe vectors exist
      probes_eq_flat   probing ALL branches reproduces the flat ranking
                       exactly for every sample query and nprobe ∈ {1,5,32}
      assign_eq_flat   the distributed two-level assignment at all
                       branches ≡ the flat broadcast-argmin, row for row
                       (a 10% corpus slice, compared distributed)
      served_self_top1 a vector ADDED through the branch-pruned hier
                       assignment is served back at similarity 1.0."""
    import tempfile

    from ocr_vector_db_spark.operators.ann_index import (
        IVFIndex,
        assign_nearest_centroid,
    )

    e = load_table(spark, sf, "embeddings")
    key = (spark.sparkContext.applicationId, sf, "q115_hier_path")
    if key not in _PLAN_MEMO:
        path = tempfile.mkdtemp(prefix="ivfhier_")
        idx = IVFIndex.build(
            spark, e.filter(F.col("vec_id") % 2 == 0), path,
            num_clusters=32, l1_branches=6,
        )
        # one-time facts of the memoized layout: the hier-routed add and
        # its serving check (added under branches=2, served at full probe)
        probe = e.filter(F.col("vec_id") % 2 == 1).limit(1)
        idx.add(
            probe.select("vec_id", "embedding"),
            assume_new=True, branches=2,
        )
        pid, pvec = probe.select("vec_id", "embedding").head()
        top = idx.search(list(pvec), 1, nprobe=32, branches=6).head()
        served = bool(top.vec_id == pid and top.similarity == 1.0)
        _PLAN_MEMO[key] = (path, served)
    path, served = _PLAN_MEMO[key]
    idx = IVFIndex.load(spark, path)

    qids = [0, 7, 23, 42]
    qvecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id").isin(qids)).collect()
    }
    probes_eq = all(
        idx.probe_clusters(qv, np_, branches=len(idx.l1))
        == idx.probe_clusters(qv, np_)
        for qv in qvecs.values() for np_ in (1, 5, 32)
    )
    batch = e.filter(F.col("vec_id") % 10 == 3).select("vec_id", "embedding")
    flat = assign_nearest_centroid(batch, idx.centroids).select(
        "vec_id", F.col("cluster_id").alias("flat_cid")
    )
    hier = idx.assign_clusters_hier(batch, branches=len(idx.l1)).select(
        "vec_id", F.col("cluster_id").alias("hier_cid")
    )
    mismatches = (
        flat.join(hier, "vec_id", "full_outer")
        .filter(
            ~(F.col("flat_cid").eqNullSafe(F.col("hier_cid")))
        ).count()
    )
    return spark.createDataFrame(
        [(len(qvecs), probes_eq, mismatches == 0, served)],
        "n_queries bigint, probes_eq_flat boolean, assign_eq_flat boolean, "
        "served_self_top1 boolean",
    )


def _hier_index_for(spark, sf):
    """Session-memoized hierarchical IVFIndex over the FULL embeddings
    table (q116) — distinct from q115's layout, which routes an odd-id
    probe vector through the hier add and so no longer mirrors the
    corpus the recall baseline scans."""
    import tempfile

    from ocr_vector_db_spark.operators.ann_index import IVFIndex

    key = (spark.sparkContext.applicationId, sf, "q116_hier_path")
    if key not in _PLAN_MEMO:
        e = load_table(spark, sf, "embeddings")
        path = tempfile.mkdtemp(prefix="ivfhier_full_")
        IVFIndex.build(spark, e, path, num_clusters=24, l1_branches=6)
        _PLAN_MEMO[key] = path
    return IVFIndex.load(spark, _PLAN_MEMO[key])


@query(
    "q116_hier_branch_recall",
    """
    SELECT (SELECT COUNT(*) FROM embeddings
            WHERE vec_id IN (0, 7, 23, 42)) AS n_queries,
           true AS full_branch_exact, true AS monotone_ok,
           true AS flat_parity
    """,
)
def q116(spark, sf):
    """The tuning sweep for the SECOND recall/latency knob the two-level
    quantizer adds above nprobe (q106's): how many L1 branches to descend.
    `branch_recall_sweep` measures recall@10 for every branches setting in
    the same two-job batched shape as `recall_sweep` (one exact baseline,
    one multi-setting pruned pass — settings encoded into query ids, never
    a per-setting driver loop). KMeans isn't SQL-reproducible, so — like
    q106/q115 — the driver checks an invariant row:
      n_queries          grounded: the probe vectors exist
      full_branch_exact  recall == 1.0 at branches = |L1| with a full
                         probe (every cluster reachable → brute force
                         over the layout by construction)
      monotone_ok        recall(1) ≤ recall(half) ≤ recall(full):
                         descending more branches only adds candidates
      flat_parity        recall_sweep(branches=|L1|) ≡ the flat
                         recall_sweep dict — the hier probe restriction
                         at all branches is the identity."""
    idx = _hier_index_for(spark, sf)
    e = load_table(spark, sf, "embeddings")
    qvs = [
        [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id").isin([0, 7, 23, 42]))
        .orderBy("vec_id").collect()
    ]
    nb = len(idx.l1)
    half = max(nb // 2, 1)
    full = len(idx.centroids)
    # ALL seven (nprobe, branches) settings through ONE _settings_recall
    # call — one exact baseline + one multi-setting pruned pass (2 jobs
    # for the whole gate, vs 6 when the three public sweeps run apart)
    rec = idx._settings_recall(
        e, qvs, 10,
        [(full, 1), (full, half), (full, nb),
         (1, None), (full, None), (1, nb)],
        "vec_id", False,
    )
    sweep = {1: rec[0], half: rec[1], nb: rec[2]}
    flat = {1: rec[3], full: rec[4]}
    hier = {1: rec[5], full: rec[2]}  # (full, nb) already at index 2
    return spark.createDataFrame(
        [(len(qvs), sweep[nb] == 1.0,
          sweep[1] <= sweep[half] <= sweep[nb], hier == flat)],
        "n_queries bigint, full_branch_exact boolean, monotone_ok boolean, "
        "flat_parity boolean",
    )


_NGRAM_TOKS_CTE = r"""
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> t <> '') AS tk
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               struct_extract(u.p, 1) AS tok_a,
               struct_extract(u.p, 2) AS tok_b
        FROM toks, LATERAL unnest(list_zip(tk[1:len(tk)-1], tk[2:])) AS u(p)
    ),
    uni AS MATERIALIZED (
        SELECT u.t AS tok, COUNT(*) AS cnt
        FROM toks, LATERAL unnest(tk) AS u(t) GROUP BY u.t
    )
"""


@query(
    "q119_weighted_sample",
    r"""
    WITH t AS (
        SELECT doc_id, n_chars AS weight,
               ln((('0x' || substr(md5('es#' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                   + 0.5) / 4503599627370496.0)
                   / CAST(n_chars AS DOUBLE) AS k
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, weight, ROUND(k, 6) AS es_key
    FROM t ORDER BY k DESC, doc_id LIMIT 50
    """,
)
def q119(spark, sf):
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis A-ES as a top-k): key = ln(u)/w with a salted-md5 uniform,
    the 50 largest keys are a sample with inclusion ∝ n_chars — the
    training-mix draw that stays IDENTICAL across engines, re-runs, and
    repartitions because the randomness is a pure function of the row
    key. No reservoir state, no corpus shuffle: one scored scan +
    TakeOrderedAndProject."""
    from ocr_vector_db_spark.operators import sampling

    d = load_table(spark, sf, "documents")
    return sampling.weighted_sample(d, 50, "n_chars")


@query(
    "q120_standardized_embeddings",
    r"""
    WITH vals AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               unnest(embedding::DOUBLE[]) AS v
        FROM embeddings
    ),
    stats AS (
        SELECT i,
               CAST(SUM(CAST(ROUND(v, 9) AS DECIMAL(28,9))) AS DOUBLE)
                   / COUNT(*) AS mu,
               CAST(SUM(CAST(ROUND(v * v, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   / COUNT(*) AS m2
        FROM vals GROUP BY i
    ),
    z AS (
        SELECT vec_id, i, (v - mu) / sqrt(m2 - mu * mu) AS z
        FROM vals JOIN stats USING (i)
    ),
    arr AS (SELECT vec_id, list(z ORDER BY i) AS zs FROM z GROUP BY vec_id),
    n AS (SELECT vec_id, zs,
                 CASE WHEN list_dot_product(zs, zs) = 0 THEN 1.0
                      ELSE sqrt(list_dot_product(zs, zs)) END AS nrm
          FROM arr)
    SELECT vec_id, generate_subscripts(zs, 1) AS i,
           ROUND(unnest(zs) / nrm, 6) AS zval
    FROM n
    """,
)
def q120(spark, sf):
    """Per-dimension corpus standardization + unit re-normalization of
    the embedding table (diagonal whitening — the cheap fix for
    anisotropic dimensions dominating cosine). Stats are ONE
    posexplode+agg with exact decimal sums (dim rows out); applying is
    map-side zip_with/transform against 2×dim literal vectors — no
    second shuffle, no join, constant plan at any corpus size. (The
    operator returns (vec_id, unit_std array); the gate explodes to
    1-based (vec_id, i, zval) rows because the driver compare hashes
    scalars, not float arrays.)"""
    from ocr_vector_db_spark.operators import embedding_prep

    e = load_table(spark, sf, "embeddings")
    # the stats profile of a static corpus is a fit artifact — memoize it
    # like the index builds so repeated serving pays only the apply pass
    key = (spark.sparkContext.applicationId, sf, "q120_stats")
    if key not in _PLAN_MEMO:
        _PLAN_MEMO[key] = embedding_prep.dim_stats(e)
    return embedding_prep.standardize_embeddings(
        e, stats=_PLAN_MEMO[key]
    ).select(
        "vec_id", F.posexplode("unit_std").alias("i", "zval")
    ).select("vec_id", (F.col("i") + 1).alias("i"), "zval")


@query(
    "q121_pdf_encrypted",
    """
    SELECT * FROM (VALUES
        ('/corpus/enc_aes.pdf', 'text', 89,
         'Modern V4 AESV2 files carry AE'),
        ('/corpus/enc_aes256.pdf', 'text', 78,
         'PDF 2.0 files wrap an AES-256 '),
        ('/corpus/enc_r2.pdf', 'text', 104,
         'Legacy 40 bit RC4 encryption d'),
        ('/corpus/enc_r3.pdf', 'text', 41,
         '한국어 스캔 문서는 128비트 RC4 표준 암호화를 사'),
        ('/corpus/enc_img.pdf', 'image_raw', 72,
         '3ae0ee5c1c6faec7545384df0f844b0f')
    ) AS t(source_path, item, n, detail)
    """,
)
def q121(spark, sf):
    """Encrypted PDFs (ISO 32000-1 §7.6.2-7.6.4 Standard security
    handler — together the schemes that dominate scanned/OCR corpora)
    end-to-end and distributed, golden VALUES oracle like q86/q107:
    a revision-2 40-bit RC4 file, a revision-3 128-bit RC4
    Flate+CID-Korean file, a V4/R4 /AESV2 file (AES-128-CBC streams
    through the pure-Python FIPS-197 core), and a V5/R6 /AESV3 file
    (PDF 2.0: Algorithm-2.B password hash validated against /U, file
    key unwrapped from /UE, AES-256-CBC streams) through the full
    parse path
    (mapInPandas, parsers.parse_pdf → per-object keys derived from the
    empty user password, validated against /U before any stream is
    touched), plus an encrypted raw raster through
    `ingest.pdf_image_assets` (md5 pins the decrypted pixel buffer).
    Reference parity: PyMuPDF opens these transparently (and is
    preferred when importable, as on every PDF path); the pure-Python
    twin is `pdf_decode._maybe_decrypt`."""
    from ocr_vector_db_spark.sources.ingest import (
        parse_pdf_segments,
        pdf_files_df,
        pdf_image_assets,
    )
    from ocr_vector_db_spark.sources.pdf_decode import (
        build_simple_pdf,
        encrypt_pdf_aes,
        encrypt_pdf_aes256,
        encrypt_pdf_rc4,
    )

    aes = encrypt_pdf_aes(build_simple_pdf([[
        {"kind": "text", "x": 72, "y": 700, "size": 12,
         "text": "Modern V4 AESV2 files carry AES-128-CBC streams "
                 "decoded by the pure Python FIPS-197 core."},
    ]]))
    aes256 = encrypt_pdf_aes256(build_simple_pdf([[
        {"kind": "text", "x": 72, "y": 700, "size": 12,
         "text": "PDF 2.0 files wrap an AES-256 file key behind the "
                 "Algorithm 2.B password hash."},
    ]]))
    r2 = encrypt_pdf_rc4(build_simple_pdf([[
        {"kind": "text", "x": 72, "y": 700, "size": 12,
         "text": "Legacy 40 bit RC4 encryption decodes through the "
                 "standard security handler with the empty user "
                 "password."},
    ]]), r=2, nbits=40)
    r3 = encrypt_pdf_rc4(build_simple_pdf([[
        {"kind": "text", "x": 72, "y": 700, "size": 12,
         "text": "한국어 스캔 문서는 128비트 RC4 표준 암호화를 "
                 "사용하는 경우가 많다."},
    ]], compress=True), r=3, nbits=128)
    w, h = 6, 4
    pixels = bytes((i * 7) % 256 for i in range(w * h * 3))
    img = encrypt_pdf_rc4(build_simple_pdf([[
        {"kind": "image", "x": 0, "y": 400, "w": 120, "h": 80,
         "width": w, "height": h, "channels": 3, "pixels": pixels},
    ]]))

    texts = parse_pdf_segments(pdf_files_df(spark, [
        ("/corpus/enc_aes.pdf", aes), ("/corpus/enc_aes256.pdf", aes256),
        ("/corpus/enc_r2.pdf", r2), ("/corpus/enc_r3.pdf", r3),
    ])).select(
        "source_path", F.lit("text").alias("item"),
        F.length("content").cast("int").alias("n"),
        F.substring("content", 1, 30).alias("detail"),
    )
    assets = pdf_image_assets(pdf_files_df(spark, [
        ("/corpus/enc_img.pdf", img),
    ])).select(
        "source_path",
        F.concat(F.lit("image_"), F.col("metadata")["format"]).alias("item"),
        F.length("data").cast("int").alias("n"),
        F.md5("data").alias("detail"),
    )
    return texts.unionByName(assets).orderBy("source_path")


@query(
    "q122_ivfpq_hierarchical",
    """
    SELECT (SELECT COUNT(*) FROM embeddings
            WHERE vec_id IN (0, 8, 24, 42)) AS n_queries,
           true AS probes_eq_flat, true AS codes_eq_flat,
           true AS batch_eq_flat, true AS served_self_top1
    """,
)
def q122(spark, sf):
    """The two-level coarse quantizer on the COMPRESSED tier (q115's
    IVF-PQ sibling): `IVFPQIndex.build(l1_branches=…)` shares the raw
    tier's hier layout (hier.json + L2 parquet partitioned by l1_id), so
    neither probe ranking nor the residual assignment ever touches a
    num_clusters-sized broadcast. Quantizers aren't SQL-reproducible —
    invariant gate like q108/q115:
      n_queries        grounded: the probe vectors exist
      probes_eq_flat   branch ranking at branches = |L1| reproduces the
                       flat probe ranking for every sample query and
                       nprobe ∈ {1, 3, full}
      codes_eq_flat    hier residual assignment (L1 broadcast + L2
                       parquet join, squared-L2 both levels) encodes a
                       held-out batch to EXACTLY the flat path's
                       (cluster_id, pq_codes), row for row
      batch_eq_flat    `search_batch(branches=|L1|)` ≡ the flat batched
                       serving, bit-identical distances
      served_self_top1 a vector ADDED through the branch-pruned hier
                       assignment is served back at similarity 1.0 by
                       the refined search."""
    import tempfile

    from ocr_vector_db_spark.operators.ivfpq import IVFPQIndex

    e = load_table(spark, sf, "embeddings")
    key = (spark.sparkContext.applicationId, sf, "q122_ivfpqh_path")
    if key not in _PLAN_MEMO:
        path = tempfile.mkdtemp(prefix="ivfpqh_")
        idx = IVFPQIndex.build(
            spark, e.filter(F.col("vec_id") % 2 == 0), path,
            dim=64, num_clusters=8, m=8, k=16, l1_branches=3,
        )
        # one-time facts of the memoized layout: the hier-routed add and
        # its serving check (added under branches=2, refined full probe)
        probe = (e.filter(F.col("vec_id") % 2 == 1)
                 .select("vec_id", "embedding").limit(1))
        idx.add(probe, assume_new=True, branches=2)
        pid, pvec = probe.head()
        top = idx.search(list(pvec), 1, nprobe=8, branches=3,
                         corpus=e, refine=4).head()
        served = bool(top.vec_id == pid and top.similarity == 1.0)
        _PLAN_MEMO[key] = (path, served)
    path, served = _PLAN_MEMO[key]
    idx = IVFPQIndex.load(spark, path)

    qids = [0, 8, 24, 42]
    qvecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id").isin(qids)).collect()
    }
    probes_eq = all(
        idx.probe_clusters(qv, np_, branches=len(idx.l1))
        == idx.probe_clusters(qv, np_)
        for qv in qvecs.values() for np_ in (1, 3, 8)
    )
    held_out = (e.filter(F.col("vec_id") % 10 == 3)
                .select("vec_id", "embedding"))
    flat_codes = {
        (r.vec_id, r.cluster_id, tuple(r.pq_codes))
        for r in idx._residual_codes(
            held_out, "embedding", "vec_id").collect()
    }
    hier_codes = {
        (r.vec_id, r.cluster_id, tuple(r.pq_codes))
        for r in idx._residual_codes(
            held_out, "embedding", "vec_id", branches=len(idx.l1)
        ).collect()
    }
    qdf = e.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    flat_b = sorted(
        tuple(r) for r in idx.search_batch(qdf, 5, nprobe=8).collect()
    )
    hier_b = sorted(
        tuple(r)
        for r in idx.search_batch(qdf, 5, nprobe=8,
                                  branches=len(idx.l1)).collect()
    )
    return spark.createDataFrame(
        [(len(qvecs), probes_eq, hier_codes == flat_codes,
          hier_b == flat_b, served)],
        "n_queries bigint, probes_eq_flat boolean, codes_eq_flat boolean, "
        "batch_eq_flat boolean, served_self_top1 boolean",
    )


@query(
    "q117_pmi_collocations",
    f"""
    WITH {_NGRAM_TOKS_CTE},
    bgc AS (
        SELECT tok_a, tok_b, COUNT(*) AS pair_count
        FROM bg GROUP BY tok_a, tok_b
    ),
    tot AS (
        SELECT CAST((SELECT SUM(cnt) FROM uni) AS DOUBLE) AS n_tok,
               CAST((SELECT COUNT(*) FROM bg) AS DOUBLE) AS n_pairs
    )
    SELECT tok_a, tok_b, pair_count,
           ROUND(ln(CAST(pair_count AS DOUBLE)) - ln(n_pairs)
                 - ln(CAST(ua.cnt AS DOUBLE)) - ln(CAST(ub.cnt AS DOUBLE))
                 + 2.0 * ln(n_tok), 6) AS pmi
    FROM bgc JOIN uni ua ON bgc.tok_a = ua.tok
             JOIN uni ub ON bgc.tok_b = ub.tok
             CROSS JOIN tot
    WHERE pair_count >= 5
    ORDER BY pmi DESC, tok_a, tok_b
    LIMIT 100
    """,
)
def q117(spark, sf):
    """PMI collocation mining (Church & Hanks, 1990): the corpus's
    strongest adjacent token pairs by pointwise mutual information —
    phrase-vocabulary induction for tokenizer training. Bigrams come from
    zipping each doc's filtered token array against itself shifted by one
    (per-row, shuffle-free — no window, no positional self-join); counts
    are two aggs; the Heaps'-sized unigram table broadcasts onto the
    already-aggregated bigram counts; top-k is TakeOrderedAndProject.
    min_count=5 floors the hapax-pair PMI explosion."""
    from ocr_vector_db_spark.operators import ngram_lm

    d = load_table(spark, sf, "documents")
    return ngram_lm.pmi_collocations(d, min_count=5, top_k=100)


@query(
    "q118_bigram_cross_entropy",
    f"""
    WITH {_NGRAM_TOKS_CTE},
    v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
    bgc AS (
        SELECT tok_a, tok_b, COUNT(*) AS cab
        FROM bg GROUP BY tok_a, tok_b
    ),
    scored AS (
        SELECT bg.doc_id,
               ROUND(-ln(CAST(bgc.cab + 1 AS DOUBLE)
                         / (CAST(ua.cnt AS DOUBLE) + v.v)), 6) AS nlp
        FROM bg JOIN bgc USING (tok_a, tok_b)
                JOIN uni ua ON bg.tok_a = ua.tok
                CROSS JOIN v
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(CAST(SUM(CAST(nlp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
               AS avg_neg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def q118(spark, sf):
    """Per-document cross-entropy under the corpus's add-one-smoothed
    BIGRAM LM, p(b|a) = (c(ab)+1)/(c(a)+V) — the distributed stand-in
    for CCNet's KenLM perplexity filter (Wenzek et al., 2020), one rung
    above q82's unigram model: word-order-aware, so shuffled boilerplate
    that fools a unigram LM scores high here. The per-doc scoring join
    is a shuffle equi-join on the pair key (bigram vocab is NOT
    broadcastable at corpus scale; stopword-pair skew is AQE's job);
    unigram context counts broadcast; per-row -ln p rounds to 6 dp
    before the decimal sum so the average is order-independent."""
    from ocr_vector_db_spark.operators import ngram_lm

    d = load_table(spark, sf, "documents")
    return ngram_lm.bigram_cross_entropy(d)


@query(
    "q123_ngram_lm_incremental",
    # the oracle is q118's refit SQL verbatim: an incrementally-built
    # persisted LM must score byte-identically to a full refit
    f"""
    WITH {_NGRAM_TOKS_CTE},
    v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
    bgc AS (
        SELECT tok_a, tok_b, COUNT(*) AS cab
        FROM bg GROUP BY tok_a, tok_b
    ),
    scored AS (
        SELECT bg.doc_id,
               ROUND(-ln(CAST(bgc.cab + 1 AS DOUBLE)
                         / (CAST(ua.cnt AS DOUBLE) + v.v)), 6) AS nlp
        FROM bg JOIN bgc USING (tok_a, tok_b)
                JOIN uni ua ON bg.tok_a = ua.tok
                CROSS JOIN v
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(CAST(SUM(CAST(nlp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
               AS avg_neg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def q123(spark, sf):
    """Incremental LM index (operators/ngram_lm_index.py, the LM sibling
    of q104's LexicalIndex): build the persisted bigram LM on HALF the
    corpus, add() the rest (bucketed count-row appends + exact integer
    vocab/total folds), compact() once (count folding is read-time, so
    compaction must not change a single score), then score the whole
    corpus against the PERSISTED counts — only the batch's own buckets of
    the pair/unigram tables are read (partition-pruned scans). Oracle =
    q118's refit SQL over the full corpus: build(A)+add(B) must score
    byte-identically to a refit on A∪B — CCNet-style LM filtering served
    from a stable index instead of a per-batch re-count."""
    import tempfile

    from ocr_vector_db_spark.operators.ngram_lm_index import NgramLMIndex

    d = load_table(spark, sf, "documents")
    key = (spark.sparkContext.applicationId, sf, "q123_lm_path")
    if key not in _PLAN_MEMO:
        path = tempfile.mkdtemp(prefix="lmidx_")
        idx = NgramLMIndex.build(
            spark, d.filter(F.col("doc_id") % 2 == 0), path, n_buckets=16
        )
        idx.add(d.filter(F.col("doc_id") % 2 == 1))
        idx.compact()
        _PLAN_MEMO[key] = path
    idx = NgramLMIndex.load(spark, _PLAN_MEMO[key])
    return idx.score_batch(d)


@query(
    "q124_ivf_standardized",
    """
    SELECT (SELECT COUNT(*) FROM embeddings) AS n_vectors,
           true AS layout_matches_q120,
           true AS full_probe_exact,
           true AS self_served_at_one
    """,
)
def q124(spark, sf):
    """Whitened-space ANN serving: `IVFIndex.build(standardize=True)`
    persists q120's (mu, sd) profile WITH the index and applies it to
    layout, queries, adds and screens symmetrically. Quantizers aren't
    SQL-reproducible — invariant row like q106/q115:
      n_vectors            grounded: the whole corpus is indexed
      layout_matches_q120  the stored vectors equal the q120 operator's
                           output row-for-row (one profile, one transform
                           definition — `embedding_prep.standardize_col`)
      full_probe_exact     recall@10 == 1.0 at nprobe = num_clusters:
                           both recall sides move into index space, so
                           probing every partition IS brute force over
                           the whitened layout
      self_served_at_one   a corpus member queried RAW returns itself at
                           similarity exactly 1.0 — the driver-side query
                           transform (`standardize_vec`) bit-matches the
                           distributed layout transform."""
    import tempfile

    from ocr_vector_db_spark.operators.ann_index import IVFIndex
    from ocr_vector_db_spark.operators.embedding_prep import (
        standardize_embeddings,
    )

    e = load_table(spark, sf, "embeddings")
    key = (spark.sparkContext.applicationId, sf, "q124_std_path")
    if key not in _PLAN_MEMO:
        path = tempfile.mkdtemp(prefix="ivfstd_")
        IVFIndex.build(spark, e, path, num_clusters=8, standardize=True)
        _PLAN_MEMO[key] = path
    idx = IVFIndex.load(spark, _PLAN_MEMO[key])

    n_vectors = e.count()
    want = standardize_embeddings(e).select(
        F.col("vec_id"), F.col("unit_std").alias("embedding")
    )
    layout_ok = (
        idx.vectors().select("vec_id", "embedding")
        .exceptAll(want).count() == 0
        and idx.vectors().count() == n_vectors
    )
    qids = [0, 7, 23, 42]
    qvs = [
        [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id").isin(qids)).orderBy("vec_id").collect()
    ]
    rec = idx.recall_sweep(e, qvs, k=10, nprobes=[len(idx.centroids)])
    full_ok = rec[len(idx.centroids)] == 1.0
    top = idx.search(qvs[1], 1, nprobe=len(idx.centroids)).head()
    self_ok = bool(top.vec_id == 7 and top.similarity == 1.0)
    return spark.createDataFrame(
        [(n_vectors, layout_ok, full_ok, self_ok)],
        "n_vectors bigint, layout_matches_q120 boolean, "
        "full_probe_exact boolean, self_served_at_one boolean",
    )


_Q106_QUERY_IDS = [0, 7, 23, 42]


@query(
    "q106_ivf_recall_tradeoff",
    f"""
    SELECT (SELECT COUNT(*) FROM embeddings
            WHERE vec_id IN ({', '.join(str(i) for i in _Q106_QUERY_IDS)}))
           AS n_queries,
           true AS full_probe_exact,
           true AS monotone_ok,
           true AS nprobe1_positive
    """,
)
def q106(spark, sf):
    """The recall/nprobe tradeoff that mirrors pgvector's `ivfflat.probes`
    knob (reference storage/schema.py:38-41): measured recall@10 of the
    persisted IVF index vs exact brute force at nprobe = 1, half, full.
    The cluster assignment isn't SQL-reproducible, so — like q99/q46 —
    the driver checks an invariant row:
      n_queries          grounded in the data: the probe set must exist
      full_probe_exact   recall == 1.0 at nprobe = num_clusters (probing
                         every partition IS brute force over the layout;
                         an assignment or pruning bug breaks equality)
      monotone_ok        recall(1) ≤ recall(half) ≤ recall(full): probing
                         more clusters can only add candidates — a probe-
                         ranking bug flips this
      nprobe1_positive   each query vector is itself a corpus member, so
                         its own cluster must return it → recall@10 ≥ 0.1
                         even at nprobe=1."""
    idx = _ivf_index_for(spark, sf)
    e = load_table(spark, sf, "embeddings")
    qvs = [
        [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id").isin(_Q106_QUERY_IDS))
        .orderBy("vec_id").collect()
    ]
    full = len(idx.centroids)
    sweep = idx.recall_sweep(e, qvs, k=10, nprobes=[1, max(full // 2, 1), full])
    r1, rh, rf = sweep[1], sweep[max(full // 2, 1)], sweep[full]
    return spark.createDataFrame(
        [(len(qvs), rf == 1.0, r1 <= rh <= rf, r1 > 0.0)],
        "n_queries bigint, full_probe_exact boolean, monotone_ok boolean, "
        "nprobe1_positive boolean",
    )


@query(
    "q91_sequence_packing",
    r"""
    WITH t AS (
        SELECT lang || '#' || CAST(
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4
                   AS VARCHAR) AS shard,
               doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tokens
        FROM documents
    ),
    c AS (
        SELECT shard, doc_id, tokens,
               SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tokens
        FROM t
    ),
    p AS (
        SELECT shard, tokens,
               CAST(floor((cum_tokens - tokens) / 256.0) AS BIGINT) AS pack_id
        FROM c
    )
    SELECT shard, pack_id, COUNT(*) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS pack_tokens,
           ROUND(SUM(tokens) / 256.0, 6) AS fill_ratio
    FROM p GROUP BY shard, pack_id
    """,
)
def q91(spark, sf):
    """Sequence packing: contiguous greedy assignment of each shard's
    documents into 256-token training packs (pack = floor of the prefix sum
    before the doc / budget), rolled up to per-pack fill stats. ONE window
    (per-shard prefix sum, no global sort) + one hash agg — the
    document-boundary packing a pretraining pipeline runs as its final hop.
    The shard key is salted into 4 sub-shards (md5(doc_id) mod 4) so window
    partitions stay bounded when the natural key is low-cardinality — the
    100-TB guard; see operators/packing.py for the scale notes."""
    from ocr_vector_db_spark.operators import packing

    d = load_table(spark, sf, "documents")
    packed = packing.pack_documents(d, budget=256, shard_col="lang", sub_shards=4)
    return packing.pack_stats(packed, budget=256)


@query(
    "q92_semantic_dedup_survivors",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT s.vec_id, s.label FROM e s
    WHERE NOT EXISTS (
        SELECT 1 FROM e b
        WHERE b.label = s.label AND b.vec_id < s.vec_id
          AND ROUND(list_dot_product(s.v, b.v)
                    / (sqrt(list_dot_product(s.v, s.v))
                       * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3
    )
    """,
)
def q92(spark, sf):
    """SemDeDup (Abbas et al., 2023) survivors: within each cluster (label
    as the k-means block), keep only documents with NO higher-priority
    (lower-id) neighbor at cosine ≥ 0.3 — the pairwise greedy rule, not
    transitive closure. Candidates from the blocked self-join (q22's
    pattern), survivors via one left-anti join; never all-pairs."""
    e = load_table(spark, sf, "embeddings")
    return dedup.semantic_dedup_survivors(
        e, threshold=0.3, block_col="label"
    ).select("vec_id", "label")


@query(
    "q93_duplicate_ngram_coverage",
    r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id AS doc, unnest(
            CASE WHEN len(t) >= 3
                 THEN list_transform(range(1, len(t) - 1),
                                     i -> array_to_string(list_slice(t, i, i + 2), ' '))
                 ELSE [] END) AS shingle
        FROM toks
    ),
    freq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
    SELECT sh.doc AS doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN freq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           ROUND(SUM(CASE WHEN freq.df >= 2 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
               AS dup_coverage
    FROM sh JOIN freq USING (shingle)
    GROUP BY sh.doc
    """,
)
def q93(spark, sf):
    """Duplicate n-gram coverage (3-grams at test scale; 13 in production —
    Lee et al. 2022's exact-substring screening): fraction of each doc's
    distinct shingles shared with any other doc. Inverted-index formulation —
    the one big shuffle is the shingle-df join; integer counts keep every
    aggregate exact. See operators/dedup.py::duplicate_ngram_coverage."""
    d = load_table(spark, sf, "documents")
    return dedup.duplicate_ngram_coverage(d, n=3)


@query(
    "q94_rerank_stub_topk",
    f"""
    WITH {_bm25_scored_sql(_BM25_TERMS)},
    cand AS (SELECT id FROM scored ORDER BY bm25 DESC, id LIMIT 50),
    ce AS (
        SELECT c.id,
               substr(md5('vector hash spark' || '|' || d.text), 1, 8) AS ce_score
        FROM cand c JOIN documents d ON d.doc_id = c.id
    )
    SELECT id, ce_score,
           CAST(ROW_NUMBER() OVER (ORDER BY ce_score DESC, id) AS BIGINT) AS rank
    FROM ce ORDER BY ce_score DESC, id LIMIT 10
    """,
)
def q94(spark, sf):
    """Two-stage retrieve-then-rerank: BM25 top-50 (the O(corpus) stage) →
    cross-encoder rerank → top-10. The expensive pairwise scorer only ever
    sees the driver-bounded candidate set — the shape that makes
    cross-encoders affordable at any corpus size. Scorer here is the
    deterministic md5 stub (hex-string key, oracle-checkable); a real model
    drops in as a Pandas-UDF batch scorer without touching the plan.
    See operators/retrieval.py::rerank_topk."""
    from ocr_vector_db_spark.operators import retrieval

    d = load_table(spark, sf, "documents")
    cand = retrieval.bm25_topk(d, _BM25_TERMS, k=50).select("id")
    with_text = cand.join(
        d.select(F.col("doc_id").alias("id"), "text"), "id"
    )
    return retrieval.rerank_topk(
        with_text, retrieval.md5_stub_scorer(" ".join(_BM25_TERMS)), k=10
    )


@query(
    "q95_bpe_pair_counts",
    """
    WITH w AS (
        SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
        FROM documents
    ),
    p AS (
        SELECT unnest(list_transform(range(1, length(word)),
                                     i -> word[i:i+1])) AS pair
        FROM w WHERE length(word) >= 2
    )
    SELECT pair, COUNT(*) AS cnt
    FROM p GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50
    """,
)
def q95(spark, sf):
    """Adjacent-symbol pair counts — the inner loop of BPE tokenizer
    training (the first merge = the argmax of exactly this table; Sennrich
    et al. 2016). Explode words → explode in-word character bigrams →
    hash agg: the shuffle carries one row per distinct pair per partition
    (≤ 36² for lowercase alnum), not per occurrence — the same map-side
    combine discipline as q65's Zipf scan."""
    d = load_table(spark, sf, "documents")
    words = d.select(
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("word")
    ).filter(F.length("word") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(50)
    )


@query(
    "q96_quality_deciles",
    r"""
    WITH t AS (
        SELECT doc_id, lang,
               CAST(length(text) AS DOUBLE) AS n,
               CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS ntok,
               CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                    t -> list_contains(['the','a','and','of','to','in','is','it','that','for'], t))) AS DOUBLE) AS stop,
               CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}\-]', '', 'g')) AS DOUBLE) AS punct
        FROM documents
    ),
    q AS (
        SELECT doc_id, lang,
               CASE WHEN n = 0 THEN 0.0 ELSE ROUND(
                   0.5 * least(n / 500.0, 1.0)
                 + 0.3 * (CASE WHEN ntok > 0 THEN least(stop / ntok * 5.0, 1.0) ELSE 0.0 END)
                 + 0.2 * (1.0 - least(punct / n * 10.0, 1.0)), 6) END AS quality
        FROM t
    ),
    d AS (
        SELECT lang, quality,
               CAST(ntile(10) OVER (PARTITION BY lang ORDER BY quality, doc_id) AS BIGINT) AS decile
        FROM q
    )
    SELECT lang, decile, COUNT(*) AS n_docs,
           MIN(quality) AS min_q, MAX(quality) AS max_q
    FROM d GROUP BY lang, decile
    """,
)
def q96(spark, sf):
    """Per-language quality deciles — the bucketing behind quality-curriculum
    sampling and threshold sweeps (pick the keep-fraction by decile, not by a
    global magic score). ntile(10) window per lang (one shuffle on lang,
    per-partition sort) + per-decile rollup; the quality score is q24's exact
    single-pass expression."""
    d = load_table(spark, sf, "documents")
    q = d.select(
        "doc_id", "lang", ta.quality_score_col(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    return (
        q.withColumn("decile", F.ntile(10).over(w).cast("bigint"))
        .groupBy("lang", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("quality").alias("min_q"),
            F.max("quality").alias("max_q"),
        )
    )


@query(
    "q97_training_pipeline_e2e",
    r"""
    WITH t AS (
        SELECT doc_id, lang, text,
               CAST(length(text) AS DOUBLE) AS n,
               CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS ntok,
               CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                    t -> list_contains(['the','a','and','of','to','in','is','it','that','for'], t))) AS DOUBLE) AS stop,
               CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}\-]', '', 'g')) AS DOUBLE) AS punct
        FROM documents
    ),
    gated AS (
        SELECT doc_id, lang, text FROM t
        WHERE CASE WHEN n = 0 THEN 0.0 ELSE ROUND(
                  0.5 * least(n / 500.0, 1.0)
                + 0.3 * (CASE WHEN ntok > 0 THEN least(stop / ntok * 5.0, 1.0) ELSE 0.0 END)
                + 0.2 * (1.0 - least(punct / n * 10.0, 1.0)), 6) END >= 0.6
    ),
    keep AS (
        SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
               MIN(doc_id) AS doc_id
        FROM gated GROUP BY 1
    ),
    deduped AS (
        SELECT g.doc_id, g.lang, g.text FROM gated g
        JOIN keep k ON g.doc_id = k.doc_id
    ),
    split_assigned AS (
        SELECT doc_id, lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT % 4
                   AS sub_shard,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tokens
        FROM deduped
    ),
    packed AS (
        SELECT split, lang, sub_shard, tokens,
               CAST(floor((SUM(tokens) OVER (PARTITION BY split, lang, sub_shard
                               ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - tokens) / 256.0) AS BIGINT) AS pack_id
        FROM split_assigned
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           COUNT(DISTINCT CONCAT(sub_shard, ':', pack_id)) AS n_packs,
           CAST(SUM(tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY split, lang
    """,
)
def q97(spark, sf):
    """The full training-data pipeline as ONE lazy plan — quality gate
    (q24's score ≥ 0.6) → exact dedup (min-id per normalized-text
    fingerprint) → deterministic md5 train/val/test split (q57's rule) →
    per-(split, lang, sub_shard) sequence packing (q91's contiguous greedy
    rule, salted into 4 bounded sub-shards) → stratification rollup.
    Composition is the point: every stage is the same operator the
    standalone queries check, and Catalyst fuses the whole chain into
    scan → filter → dedup agg+semi-join → window → agg with no
    materialization between stages. Shuffle inventory: fingerprint agg +
    semi-join, one (split, lang, sub_shard) window, final rollup — nothing
    corpus-squared anywhere."""
    from ocr_vector_db_spark.functions.text_analysis import (
        quality_score_col,
        token_count_col,
    )
    from ocr_vector_db_spark.operators.dedup import dedup_exact

    d = load_table(spark, sf, "documents")
    gated = d.filter(quality_score_col(F.col("text")) >= 0.6)
    deduped = dedup_exact(gated, text_col="text", id_col="doc_id")
    md5 = F.md5(F.col("doc_id").cast("string"))
    h = F.substring(md5, 1, 2)
    split = F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    # Bounded sub-shard salt (md5 chars 9-16, disjoint from the split's 1-2,
    # mod 4) — the 100-TB guard keeping each packing window partition
    # corpus/(splits*langs*4) instead of a single-reducer sorted stream.
    sub_shard = F.pmod(
        F.conv(F.substring(md5, 9, 8), 16, 10).cast("bigint"), F.lit(4)
    )
    assigned = deduped.select(
        "doc_id",
        "lang",
        split.alias("split"),
        sub_shard.alias("sub_shard"),
        token_count_col(F.col("text")).cast("bigint").alias("tokens"),
    )
    w = (
        Window.partitionBy("split", "lang", "sub_shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = assigned.withColumn(
        "pack_id",
        F.floor((F.sum("tokens").over(w) - F.col("tokens")) / 256.0).cast("bigint"),
    )
    return packed.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("sub_shard", "pack_id").alias("n_packs"),
        F.sum("tokens").alias("total_tokens"),
    )


@query(
    "q98_rag_prompt_golden",
    """
    SELECT * FROM (VALUES
        ('lazy evaluation generators', 3,
         '[1] decorators.md|[2] decorators.md|[3] generators.md',
         'c537cc1c2240cafdf9b13065dec3434b')
    ) AS t(query, n_sources, citations, prompt_md5)
    """,
)
def q98(spark, sf):
    """RAG context assembly (§3.3: api/repl --rag path) driver-verified:
    ingest the fixture corpus, retrieve top-3, assemble the prompt
    (800-char parent previews, numbered source blocks, separator template —
    plans/rag.py parity with retrieval/rag.py) and hash it. Deterministic
    end-to-end (hash embedder, fixed corpus, total orderings), so the
    oracle is a golden VALUES row — same regeneration contract as q35."""
    import hashlib as _hashlib

    from ocr_vector_db_spark.plans.pipeline import RetrievalPipeline
    from ocr_vector_db_spark.plans.rag import build_context, format_rag_prompt

    q = "lazy evaluation generators"
    out = _fixture_store(spark, sf)
    pipe = RetrievalPipeline(out["embeddings"], out["parents"], dim=16)
    rows = pipe.retrieve(q, top_k=3, use_self_query=False).collect()
    ctx = build_context(rows)
    prompt = format_rag_prompt(q, ctx)
    return spark.createDataFrame(
        [(
            q,
            len(ctx.source_citations),
            "|".join(ctx.source_citations),
            _hashlib.md5(prompt.encode()).hexdigest(),
        )],
        "query string, n_sources int, citations string, prompt_md5 string",
    )


@query(
    "q100_self_query_llm_golden",
    """
    SELECT * FROM (VALUES
        ('python decorator code example', 'code', 'python',
         CAST(2 AS BIGINT), true, true)
    ) AS t(query, view_filter, lang_filter, n_results, fallback_same, used_llm)
    """,
)
def q100(spark, sf):
    """Stage-0 self-query through the INJECTED LLM client seam
    (plans/self_query.py — the reference's SelfQueryRetriever chain,
    retrieval/self_query.py:99-240): the deterministic JSON-stub client
    extracts {view: code, lang: python} from the NL query, the filters
    prune the fixture corpus before scoring, and a DEAD client degrades to
    the heuristic with IDENTICAL results (the fallback ladder,
    retrieval/pipeline.py:114-135). Deterministic end-to-end → golden
    VALUES oracle, same contract as q98."""

    class _DeadLLM:
        model = "dead"

        def complete(self, system, prompt):
            raise ConnectionError("no backend")

    from ocr_vector_db_spark.plans.pipeline import RetrievalPipeline
    from ocr_vector_db_spark.plans.self_query import (
        JsonStubLLM,
        LLMSelfQuery,
        parse_filter_json,
    )

    q = "python decorator code example"
    out = _fixture_store(spark, sf)
    sq = LLMSelfQuery(JsonStubLLM())
    filters = sq(q)
    used_llm = sq.last_error is None and filters == parse_filter_json(
        JsonStubLLM().complete("", f"Query: {q}\nFilters:")
    )
    pipe = RetrievalPipeline(
        out["embeddings"], out["parents"], dim=16, self_query=sq
    )
    dead = RetrievalPipeline(
        out["embeddings"], out["parents"], dim=16,
        self_query=LLMSelfQuery(_DeadLLM()),
    )
    got = [r.fragment_id for r in pipe.retrieve(q, top_k=3).collect()]
    got_dead = [r.fragment_id for r in dead.retrieve(q, top_k=3).collect()]
    return spark.createDataFrame(
        [(
            q,
            filters.get("view", ""),
            filters.get("lang", ""),
            len(got),
            got == got_dead,
            used_llm,
        )],
        "query string, view_filter string, lang_filter string, "
        "n_results bigint, fallback_same boolean, used_llm boolean",
    )


@query(
    "q99_semdedup_kmeans_invariants",
    """
    SELECT (SELECT COUNT(*) FROM embeddings) AS n_total,
           true AS survivors_nonempty,
           true AS conservation_ok,
           true AS min_ids_survive_ok,
           true AS monotone_ok
    """,
)
def q99(spark, sf):
    """SemDeDup blocked by the paper's own KMeans clustering (Abbas et al.
    2023 §3 — q92 uses the synthetic `label` as the block; a real corpus has
    no labels, so this variant fits seeded k-means over the embeddings via
    dedup.kmeans_blocks and dedups within each cluster). The cluster
    assignment isn't SQL-reproducible, so — like q46/q53's ANN gates — the
    driver checks an invariant row instead of the raw survivor set:
      n_total            survivors + dropped must re-add to the corpus count
                         (the oracle recomputes COUNT(*) independently)
      survivors_nonempty at least one representative survives
      conservation_ok    survivors ∩ dropped = ∅ partition of the corpus
      min_ids_survive_ok the min-id doc of every cluster survives (it can
                         have no lower-id neighbor — a banding/priority bug
                         flips this)
      monotone_ok        survivors(τ=0.3) ⊆ survivors(τ=0.5): raising the
                         threshold can only shrink the dropped set — a
                         threshold-comparison bug flips this."""
    e = load_table(spark, sf, "embeddings")
    # session-memoized seeded fit: a deployed SemDeDup fits clustering once
    # per corpus snapshot and reuses the assignment (Abbas et al. §3 — the
    # fit is the amortized build step, like the q101/q102 index builds);
    # the invariant counts below still execute per call
    key = (spark.sparkContext.applicationId, sf, "q99_sem_blocks")
    if key not in _PLAN_MEMO:
        b = dedup.kmeans_blocks(e, 8, out_col="sem_cluster").cache()
        b.count()
        _PLAN_MEMO[key] = b
    blocks = _PLAN_MEMO[key]
    # one fit, two thresholds: reuse the assignment as a plain block_col
    # cache the slim survivor-id sets: four invariant actions below read
    # s_lo — without the cache each count re-runs the whole blocked
    # pairwise dedup pass (4x the work for identical results)
    s_lo = dedup.semantic_dedup_survivors(
        blocks, threshold=0.3, block_col="sem_cluster"
    ).select("vec_id").cache()
    s_hi = dedup.semantic_dedup_survivors(
        blocks, threshold=0.5, block_col="sem_cluster"
    ).select("vec_id").cache()
    try:
        n_total = e.count()
        n_lo = s_lo.count()
        n_dropped = e.join(s_lo, "vec_id", "left_anti").count()
        min_ids = blocks.groupBy("sem_cluster").agg(
            F.min("vec_id").alias("vec_id")
        )
        return spark.createDataFrame(
            [(
                n_total,
                n_lo > 0,
                n_lo + n_dropped == n_total,
                min_ids.join(s_lo, "vec_id", "left_anti").count() == 0,
                s_lo.join(s_hi, "vec_id", "left_anti").count() == 0,
            )],
            "n_total bigint, survivors_nonempty boolean, conservation_ok boolean, "
            "min_ids_survive_ok boolean, monotone_ok boolean",
        )
    finally:
        s_lo.unpersist()
        s_hi.unpersist()


@query("q109_neardup_components_collapsed", _COMPONENTS_SQL)
def q109(spark, sf):
    """Hot-group-safe near-dup clustering: documents with IDENTICAL MinHash
    signatures collapse to their min-id representative BEFORE the LSH band
    self-join, the transitive closure runs over representatives only, and
    members rejoin through the slim doc→rep map. Row-for-row identical to
    q56's uncollapsed closure (same recursive-CTE oracle) — collapsing
    changes the candidate-pair volume (Σ m_g² per identical group → the
    collision structure of DISTINCT signatures), never the answer. This is
    the shape that survives the 100 TB bucket pathology: one boilerplate
    page duplicated 10⁶ times is one band row, not 10¹² pairs. Reference
    parity: the dedupe intent of the content_hash unique index
    (storage/schema.py:166-228) lifted to near-dup clusters."""
    d = load_table(spark, sf, "documents")
    # cc="label" pinned: the operator's scale DEFAULT is the star closure
    # (round-7 flip), but this entry keeps the min-label engine benched so
    # the label-vs-star cost ratio stays visible round-over-round
    return dedup.minhash_neardup_components(
        d, num_hashes=16, bands=4, n=2, text_col="text", id_col="doc_id",
        threshold=0.5, collapse_identical=True, cc="label",
    )


@query("q110_neardup_components_star", _COMPONENTS_SQL)
def q110(spark, sf):
    """q109's collapsed clustering with the large-star/small-star closure
    (Kiveris et al., SoCC'14) instead of min-label propagation: O(log² n)
    contraction rounds regardless of component DIAMETER, where min-label
    needs diameter rounds — the engine to pick when near-dups chain
    (A~B~C~… paraphrase chains, each link similar, ends unrelated).
    Same recursive-CTE oracle as q56/q109: three independent closure
    implementations must agree row-for-row on the same pair graph."""
    d = load_table(spark, sf, "documents")
    return dedup.minhash_neardup_components(
        d, num_hashes=16, bands=4, n=2, text_col="text", id_col="doc_id",
        threshold=0.5, collapse_identical=True, cc="star",
    )


@query(
    "q111_ivf_semantic_screen",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT * FROM e WHERE vec_id % 2 = 0),
    b AS (SELECT * FROM e WHERE vec_id % 10 = 1),
    sims AS (
        SELECT b.vec_id, s.vec_id AS dup_of,
               ROUND(list_dot_product(b.v, s.v)
                     / (sqrt(list_dot_product(b.v, b.v))
                        * sqrt(list_dot_product(s.v, s.v))), 6) AS similarity
        FROM b CROSS JOIN s
    ),
    ranked AS (
        SELECT vec_id, dup_of, similarity,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY similarity DESC, dup_of) AS rn
        FROM sims
    )
    SELECT vec_id, dup_of, similarity FROM ranked WHERE rn = 1 AND similarity >= 0.3
    """,
)
def q111(spark, sf):
    """Embedding-level ingestion dedup gate: an incoming batch (the 10%
    vec_id ≡ 1 mod 10 slice — ingest batches are small next to the store)
    is screened against the persisted IVF store (built on the even half)
    for its nearest STORED neighbor; similarity ≥ 0.3 flags it as a
    semantic duplicate with its duplicate-of attribution — SemDeDup applied
    at ingest instead of over the resting corpus, the dense sibling of the
    MinHash screen (q105). Cluster assignment is a broadcast crossJoin
    against the tiny centroid table and scoring is knn_batch(k=1) over the
    partition-pruned layout, so the per-batch cost is O(batch ×
    probed-slice). Full probe here = exact max-cosine vs the store, which
    is what the oracle's cross join computes; production prunes with
    nprobe « num_clusters (flag subset relation unit-tested)."""
    import tempfile

    from ocr_vector_db_spark.operators.ann_index import IVFIndex

    e = load_table(spark, sf, "embeddings")
    key = (spark.sparkContext.applicationId, sf, "q111_ivf_even_path")
    if key not in _PLAN_MEMO:
        path = tempfile.mkdtemp(prefix="ivfscreen_")
        # 32 clusters: scoring parallelism tracks the cluster-partitioned
        # layout (one scan split per dir at this size), and finer cells
        # tighten production pruning; full probe stays exact regardless
        IVFIndex.build(
            spark, e.filter(F.col("vec_id") % 2 == 0), path, num_clusters=32
        )
        _PLAN_MEMO[key] = path
    idx = IVFIndex.load(spark, _PLAN_MEMO[key])
    return idx.screen_near_dups(
        e.filter(F.col("vec_id") % 10 == 1), threshold=0.3
    )


@query(
    "q112_dense_dropped_intra_batch",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT * FROM e WHERE vec_id % 10 = 1)
    SELECT DISTINCT a.vec_id
    FROM b a JOIN b bb ON a.vec_id > bb.vec_id
    WHERE ROUND(list_dot_product(a.v, bb.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(bb.v, bb.v))), 6) >= 0.3
    """,
)
def q112(spark, sf):
    """Intra-batch dense drop set: ids in the incoming batch (q111's
    vec_id ≡ 1 mod 10 slice) that have a LOWER-id near-dup in the SAME
    batch at cosine ≥ 0.3 — `IVFIndex.dense_dropped_ids`, the dense twin
    of `minhash_dropped_ids` and the piece that closes the streaming dual
    gate's same-batch blind spot (`screen_near_dups` only sees PREVIOUS
    batches). Blocked by the persisted gate index's centroids: pairs form
    only inside shared probed clusters, an O(batch²/num_clusters) bound
    instead of a raw batch² self-join. Full probe here = exact all-pairs,
    which is what the oracle's self-join computes; production keeps
    nprobe small (blocked ≡ exact for true near-identicals —
    regression-tested in test_streaming_multimodal)."""
    from ocr_vector_db_spark.operators.ann_index import IVFIndex

    e = load_table(spark, sf, "embeddings")
    key = (spark.sparkContext.applicationId, sf, "q111_ivf_even_path")
    if key not in _PLAN_MEMO:
        # same persisted gate index as q111 (built on the even half)
        import tempfile

        path = tempfile.mkdtemp(prefix="ivfscreen_")
        IVFIndex.build(
            spark, e.filter(F.col("vec_id") % 2 == 0), path, num_clusters=32
        )
        _PLAN_MEMO[key] = path
    idx = IVFIndex.load(spark, _PLAN_MEMO[key])
    return idx.dense_dropped_ids(
        e.filter(F.col("vec_id") % 10 == 1), threshold=0.3, nprobe=None
    )
