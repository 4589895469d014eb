"""Z-order layout: clustering quality and key correctness."""

import glob

from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.layout import write_zordered, zorder_key


def _avg_file_ranges(spark, pattern, x, y):
    """Mean per-file (max-min) span of both columns, normalized by the
    global span — the quantity parquet min/max pruning depends on."""
    files = sorted(glob.glob(pattern))
    assert len(files) > 1
    full = spark.read.parquet(*files)
    g = full.agg(
        (F.max(x) - F.min(x)).alias("gx"), (F.max(y) - F.min(y)).alias("gy")
    ).head()
    spans = []
    for f in files:
        r = spark.read.parquet(f).agg(
            (F.max(x) - F.min(x)).alias("sx"), (F.max(y) - F.min(y)).alias("sy")
        ).head()
        spans.append((r.sx / g.gx, r.sy / g.gy))
    n = len(spans)
    return sum(s[0] for s in spans) / n, sum(s[1] for s in spans) / n


def test_zorder_key_locality(spark):
    """Rows close in (x, y) share high Morton bits; corners differ."""
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 1.0), (100.0, 100.0)], "x double, y double"
    )
    keyed = zorder_key(df, "x", "y", bounds={"x": (0.0, 100.0), "y": (0.0, 100.0)})
    ks = [r.z_key for r in keyed.orderBy("x").collect()]
    assert ks[0] == 0          # (0,0) -> bucket (0,0)
    assert ks[2] == 65535      # (100,100) -> bucket (255,255), all bits set
    assert ks[1] < 16          # neighbor of origin stays in the low tile


def test_write_zordered_narrows_file_stats(spark, tmp_path):
    """Z-ordered layout yields much narrower per-file min/max windows on
    BOTH columns than the natural (single-column-correlated) layout."""
    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 141 * 1.0).alias("x"),
        ((F.col("id") * 7919) % 133 * 1.0).alias("y"),
    )
    base = str(tmp_path / "plain")
    df.repartition(8).write.mode("overwrite").parquet(base)
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, "x", "y", num_files=8)

    px, py = _avg_file_ranges(spark, base + "/part-*.parquet", "x", "y")
    zx, zy = _avg_file_ranges(spark, zpath + "/part-*.parquet", "x", "y")
    # round-robin files span ~the full domain on both columns (~1.0);
    # z-order tiles cover a fraction of each
    assert zx < px * 0.75
    assert zy < py * 0.75
    assert zx < 0.8 and zy < 0.8


def test_inventory_family_split_preserves_registration():
    """The per-family split of plans/inventory.py must register the same
    query/oracle keys in the same order — the driver window rotation is
    stable over registration order, so a reshuffled family import would
    silently change which stale queries get re-verified."""
    from ocr_vector_db_spark.plans.inventory import ORACLES, QUERIES

    # count tracks the highest registered qNNN index: a dropped or
    # double-registered query breaks equality without this test needing
    # a manual bump per addition
    import re as _re

    hi = max(int(_re.match(r"q(\d+)", k).group(1)) for k in QUERIES)
    assert len(QUERIES) == hi and len(ORACLES) == len(QUERIES)
    keys = list(QUERIES)
    # section anchors in the original registration order
    assert keys[0] == "q01_pricing_summary_agg"
    assert keys.index("q16_knn_bruteforce_cosine") == 15
    assert keys.index("q35_ingest_pipeline") < keys.index("q40_rollup_agg")
    assert keys.index("q86_pdf_ingest") < keys.index("q89_bm25_topk")
    assert keys.index("q132_bpe_train_merges") < keys.index(
        "q138_psi_drift_baseline"
    ) < keys.index("q119_weighted_sample")  # stats hub imports first
    assert keys[-1] == "q147_korean_lexical_stack"  # round-10 family last
    # every registered query has an oracle (rows-only checks excepted by
    # construction: none currently)
    assert set(ORACLES) == set(QUERIES)
