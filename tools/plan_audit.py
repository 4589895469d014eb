#!/usr/bin/env python
"""Physical-plan audit → PLANS.md.

Captures `.explain("formatted")`-level evidence for the plans this engine
relies on at 100 TB and greps each for the property that makes it scale:
filters reaching the parquet scan (PushedFilters), dimension tables arriving
broadcast (BroadcastHashJoin), heap-based top-k (TakeOrderedAndProject, no
global Sort), map-side partial aggregation (partial_* before the Exchange),
bounded Exchange counts, and the absence of CartesianProduct anywhere.

Run: python tools/plan_audit.py   (writes PLANS.md at the repo root)

The same properties are ASSERTED in tests/test_pipeline_lsh.py::
test_plan_shapes — this tool is the human-readable artifact; the test is
the regression gate.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (query, the scale property the plan must show, markers to count)
AUDITS = [
    ("q02_filter_pushdown_revenue",
     "date + quantity predicates reach the parquet scan as PushedFilters; "
     "only 4 of 16 lineitem columns are read (ReadSchema pruning)"),
    ("q03_broadcast_join_star",
     "both dimension joins are BroadcastHashJoin — zero fact-table shuffles; "
     "a SortMergeJoin here would shuffle the whole fact table"),
    ("q05_global_topk",
     "ORDER BY ... LIMIT k compiles to TakeOrderedAndProject (per-partition "
     "heaps + driver merge), never a global Sort"),
    ("q09_cascade_delete_anti_join",
     "the doomed-id set broadcasts; the anti-join never shuffles the corpus"),
    ("q20_minhash_lsh_candidates",
     "LSH banding join is an equi-join on (band_id, band_hash) — the O(n²) "
     "pair space never materializes; est-Jaccard only on candidates"),
    ("q30_sessionization",
     "one Exchange on user_id feeds BOTH the lag-gap window and the "
     "session aggregation — the partitioning is reused across stages"),
    ("q33_ivf_centroid_prune",
     "centroid agg shuffles n_labels x 64 bigint accumulators (partial_sum "
     "before the Exchange), probe table broadcasts back, final top-k is "
     "TakeOrderedAndProject"),
    ("q34_knn_batch_queries",
     "two-phase top-k: a PARTIAL WindowGroupLimit bounds each partition to "
     "its own top-k per query BEFORE the rank's Exchange (which carries "
     "<= parts x Q x k slim rows, never corpus x Q); winners re-join the "
     "corpus via BroadcastHashJoin; scoring scan reads only id+embedding"),
    ("q66_label_centroids",
     "ONE Exchange total: the 64-column partial agg; posexplode (Generate) "
     "runs AFTER aggregation over n_labels rows, never over the corpus"),
    ("q89_bm25_topk",
     "postings are term-filtered BEFORE the explode; df + corpus stats ride "
     "broadcasts; the only corpus shuffle is the (doc,term) tf aggregate"),
    ("q91_sequence_packing",
     "exactly one Window exchange (per-shard prefix sum); the per-pack "
     "rollup is a hash agg on (shard, pack_id)"),
    ("q92_semantic_dedup_survivors",
     "pairwise candidates are generated per-block (equi-join on the block "
     "key), the dropped-id set broadcasts into the left-anti join"),
    ("q97_training_pipeline_e2e",
     "the whole gate->dedup->split->pack->rollup chain fuses into one lazy "
     "plan: fingerprint agg + semi-join, one salted window, final rollup — "
     "nothing corpus-squared"),
    ("q102_hybrid_indexed",
     "both retrieval halves are partition-pruned index reads (postings "
     "buckets / IVF cluster dirs), RRF fuses two k-row lists — no corpus "
     "scan anywhere"),
    ("q105_minhash_incremental_screen",
     "only the BATCH side is hashed and shuffled; the stored bands scan "
     "is bucket-pruned and joined broadcast — O(batch), never O(corpus)"),
    ("q109_neardup_components_collapsed",
     "the band self-join runs over identical-signature REPRESENTATIVES "
     "only; members rejoin through the slim doc->rep map, so a duplicated-"
     "boilerplate hot group contributes one band row, not m² pairs"),
    ("q53_ivfpq_search",
     "ADC distance tables ship as a BroadcastHashJoin keyed on cluster_id "
     "over ONE partition-pruned codes scan — constant plan size at any "
     "(nprobe, m, k), where inlined literal tables were O(nprobe*m*k)"),
    ("q112_dense_dropped_intra_batch",
     "intra-batch pairs form only inside shared probed centroid clusters "
     "(equi-join on cluster_id after the broadcast-centroid ranking) — "
     "O(batch²/num_clusters), never an unblocked batch² self-join"),
    ("q113_pagerank_dangling_redistribute",
     "the dangling-mass share is a 1-row aggregate broadcast-crossJoined "
     "onto the node universe — per iteration still one rank shuffle + one "
     "dst hash-agg, no extra wide shuffle for dangling handling"),
    ("q117_pmi_collocations",
     "bigrams form per-row (Generate over the shifted-array zip — no "
     "window, no positional self-join); the Heaps'-sized unigram table "
     "arrives as TWO BroadcastHashJoins onto the aggregated pair counts; "
     "top-k is TakeOrderedAndProject, never a global Sort"),
    ("q118_bigram_cross_entropy",
     "the per-doc LM scoring join keys on the (tok_a, tok_b) pair — "
     "broadcast at bench scale, degrading to a shuffle equi-join (never "
     "wider) when the bigram table outgrows the threshold at corpus "
     "scale; unigram context counts always broadcast; the per-doc "
     "average is a partial_-combined hash agg over pre-rounded decimal "
     "terms"),
    ("q61_ntile_deciles",
     "exact global deciles with NO global sort: one hash shuffle on the "
     "derived range-bucket id, per-bucket window sorts, broadcast "
     "prefix-sum offsets; the only SinglePartition exchange feeds the "
     "<=B-row counts aggregate, never the corpus"),
    ("q123_ngram_lm_incremental",
     "LM scoring served from the persisted index: both count-table scans "
     "carry bucket INSET PartitionFilters (only the batch's buckets are "
     "read), appended count rows fold in partial_-combined sums, context "
     "counts broadcast, pair counts shuffle-join — no SinglePartition "
     "exchange anywhere"),
    ("q126_ngram_lm_pmi_served",
     "PMI collocations served from the persisted LM index: both count "
     "tables are parquet scans (no corpus re-tokenization anywhere in the "
     "plan), unigram counts arrive as two BroadcastHashJoins, top-k is "
     "TakeOrderedAndProject"),
    ("q127_simhash_incremental_screen",
     "only the BATCH side is hashed; the stored band scan carries a "
     "bucket INSET PartitionFilter (reads the batch's buckets only) and "
     "the (bucket, band, val) equi-join + bit_count verify never touch "
     "the full corpus — O(batch) like the MinHash screen"),
    ("q130_duplicate_span_excision",
     "the one corpus-sized shuffle is the gram-frequency hash agg "
     "(partial_ before the Exchange); every window partitions by doc_id "
     "— no global sort; kept text comes from a doc+pos equi-anti-join, "
     "and covered positions explode from already-merged DISJOINT spans"),
    ("q131_phrase_search_positional",
     "every postings scan carries a bucket INSET PartitionFilter (the "
     "phrase's own term buckets only); the (id, pos-j) chain is "
     "equi-joins over query-term-sized slices; ranking is "
     "TakeOrderedAndProject"),
    ("q133_bpe_segment_counts",
     "the chained merge replaces evaluate once per DISTINCT word (a "
     "Heaps'-sized relation) and return via BroadcastHashJoin onto the "
     "per-doc occurrence counts; the only corpus-sized shuffles are the "
     "two token hash aggs, both partial_-combined map-side"),
    ("q134_bpe_budget_packing",
     "q133's tokenize plan feeds exactly one Window exchange (the "
     "per-sub-shard prefix sum — no global sort) and the per-pack hash "
     "rollup; trained-tokenizer budgets add zero new corpus shuffles "
     "over q91"),
    ("q139_ks_drift",
     "the corpus collapses to its distinct-value histogram (one "
     "map-side-combinable agg); both running ECDFs ride the cutpoint-"
     "bucket prefix-sum machinery (one hash shuffle on the derived "
     "bucket id, ≤B-row offsets broadcast) — exact sup-gap with NO "
     "global sort anywhere"),
    ("q135_stratified_sample",
     "the literal total pre-bound compiles the per-stratum rank to "
     "WindowGroupLimit (per-partition top-total heaps BEFORE the stratum "
     "shuffle, Final after) — never a full stratum sort even when one "
     "stratum is most of the corpus; Hamilton quotas ride a broadcast; "
     "the apportionment math runs on the strata-bounded table"),
    ("q147_korean_lexical_stack",
     "Korean tokens through the production BM25 + bigram-LM + BPE "
     "operators in one fused plan: tokenization is positive-class "
     "regexp_extract_all (the widened negated class cost ~75% more per "
     "pass in Java regex), corpus stats and the smoothing-V scalar ride "
     "1-row broadcast cross joins, the per-doc joins broadcast — the "
     "per-pass shapes are exactly q89/q118/q133's, just over Hangul"),
    ("q148_pdf_jbig2_raster",
     "the JBIG2 raster path is per-file mapInPandas like q125's fax "
     "decode — the MQ arithmetic coder is sequential per region by "
     "construction, so parallelism lives at the file grain (millions of "
     "files at 100 TB); no shuffle anywhere, the union with the text "
     "parse is append-only"),
    ("q149_bloom_decontamination_screen",
     "the Bloom words table (≤ m/60 rows) arrives BROADCAST on the probe "
     "join, so the corpus side never shuffles against the benchmark set "
     "— the only corpus exchanges are the per-doc aggregates; probe "
     "positions are map-side md5 expressions inside WholeStageCodegen; "
     "the exact-overlap twin join broadcasts the bench gram set the "
     "same way q62 does"),
    ("q150_image_phash_neardup",
     "the pixel grain never shuffles: hex() once per image, scanlines "
     "explode to H slim rows (one scanline's hex each), per-scanline "
     "cell sums are map-side F.aggregate expressions inside "
     "WholeStageCodegen, and the one signature shuffle is keyed "
     "(asset, cell_y, cell_x) with map-side partial sums — ≤ 72 rows "
     "per image regardless of resolution; pair candidates come from "
     "the nibble-band equi-join (never all-pairs), distinct-ed before "
     "the signatures re-attach"),
    ("q151_cm_token_frequency",
     "the count-min cells aggregation's key space IS the cell space: "
     "partial (map-side) sums reduce every partition to ≤ d·w rows "
     "before the single tiny exchange, regardless of corpus size; the "
     "serving side is d md5 probes per candidate inside "
     "WholeStageCodegen + one BROADCAST join against the ≤ d·w-row "
     "cells table — the candidate side never shuffles against anything "
     "corpus-sized; candidates come from q65's vocabulary-bounded "
     "map-side-combined top-k (TakeOrderedAndProject)"),
    ("q152_raster_resize",
     "resize is q150's cell machinery with an output-bounded exchange: "
     "the pixel grain never shuffles (scanline explode + map-side "
     "partial cell sums), the one exchange is keyed (id, cy, cx) at "
     "≤ out_w·out_h rows per image, and the byte assembly collects "
     "≤ out_w cells per row / ≤ out_h rows per image — output-sized, "
     "never input-sized"),
    ("q153_audio_fingerprint_neardup",
     "the sample grain never shuffles: hex() once per clip, 4096-sample "
     "chunk rows via transform+posexplode, ONE linear split per chunk "
     "into a 4-hex-chars-per-sample array (per-sample substring into "
     "the chunk string would be O(offset) on UTF8String — measured 29× "
     "slower), exact integer |sample| sums per chunk∩frame "
     "intersection, map-side partial sums before the one (clip, frame) "
     "exchange at ≤ 65 rows per clip; pairs ride the image path's "
     "nibble-band equi-join unchanged"),
    ("q154_audio_quality_gates",
     "one pass over the chunk rows: each chunk folds to a single "
     "partial struct (Σ|s|, Σs², max, clipped, Σs — exact bigint) "
     "inside WholeStageCodegen, one exchange per clip at the chunk "
     "count; the silence ratio reuses the ≤ 65-rows-per-clip frame "
     "cells — nothing sample-grained ever shuffles"),
    ("q155_video_framehash_neardup",
     "frame-sample is a byte-offset BINARY substring (O(frame) slice, "
     "no UTF8 scan): n_frames/k slim rows per video, each one frame; "
     "per-frame hashing is q150's certified shape; pair candidates "
     "come from the temporally-ALIGNED equi-join keyed (frame_idx, "
     "band, value) — only same-position frames ever meet, never "
     "all-pairs — then exact XOR verification and one count aggregate "
     "at the video-pair grain"),
    ("q156_container_decode_roundtrip",
     "container decode is per-asset work with zero cross-row state, so "
     "it runs as ONE Arrow-batched mapInPandas projection (the PDF "
     "decrypt grain) ahead of the certified perceptual stacks — no "
     "extra exchange, no cartesian; undecodable rows pass through the "
     "same projection untouched"),
    ("q157_jpeg_decode_neardup",
     "JPEG decode — baseline SOF0 and (r15) progressive SOF2 — rides "
     "the SAME per-asset mapInPandas projection as q156 (zero "
     "cross-row state — huffman/IDCT cost is per row, numpy-batched "
     "per component); signatures and the banded near-dup join are "
     "q150's certified shapes; arithmetic rows pass through the same "
     "projection untouched"),
    ("q158_tiff_decode_neardup",
     "TIFF strip decode (CCITT G3/G4, LZW, PackBits, JPEG-in-TIFF) is "
     "per-asset work on the SAME Arrow-batched mapInPandas projection "
     "as q156/q157 — the strip loop lives inside one asset's decode, "
     "never as rows; signatures and the banded near-dup join are "
     "q150's certified shapes; corrupt TIFFs pass through untouched"),
    ("q159_gif_decode_neardup",
     "GIF decode (LSB-first LZW, palettes, interlace, animation) is "
     "per-asset work on the q156-q158 mapInPandas projection; an "
     "animated gray GIF becomes a raw VIDEO row there, so the video "
     "path is q155's certified shapes end to end — frame-sample by "
     "byte-offset BINARY slice, per-frame dHash, temporally-ALIGNED "
     "(frame_idx, band, value) equi-join, never all-pairs"),
]

KEY_LINE = re.compile(
    r"PushedFilters|ReadSchema|BroadcastHashJoin|SortMergeJoin|"
    r"TakeOrderedAndProject|Exchange|Window|Generate|CartesianProduct|"
    r"BroadcastNestedLoopJoin|partial_"
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    from ocr_vector_db_spark.plans.inventory import QUERIES
    from ocr_vector_db_spark.session import get_spark

    spark = get_spark("plan_audit", shuffle_partitions=8)
    out = [
        "# PLANS — physical-plan audit (generated by tools/plan_audit.py)",
        "",
        f"Scale-critical plan evidence at `{sf_dir}` — the shapes below are",
        "scale-invariant (they depend on the logical plan, not the data",
        "volume). Regression-gated by",
        "`tests/test_pipeline_lsh.py::test_plan_shapes` and",
        "`::test_no_accidental_cartesian_products`.",
        "",
    ]
    for name, why in AUDITS:
        if name == "q117_pmi_collocations":
            # the query materializes (localCheckpoint) so its returned
            # frame is an RDD scan — audit the LAZY operator plan instead
            from ocr_vector_db_spark.operators import ngram_lm
            from ocr_vector_db_spark.session import load_tables

            docs = load_tables(spark, sf_dir)["documents"]
            df = ngram_lm.pmi_collocations(docs, materialize=False)
        else:
            df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        exchanges = plan.count("Exchange")
        lines = [
            ln.strip()[:110]
            for ln in plan.splitlines()
            if KEY_LINE.search(ln)
        ]
        # de-noise: collapse consecutive duplicates, cap at 14 lines
        dedup: list[str] = []
        for ln in lines:
            if not dedup or dedup[-1] != ln:
                dedup.append(ln)
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Why it scales:** {why}.")
        out.append("")
        out.append(f"Exchanges: {exchanges} · CartesianProduct: "
                   f"{'NONE' if 'CartesianProduct' not in plan else 'PRESENT'}")
        out.append("")
        out.append("```")
        out.extend(dedup[:14])
        if len(dedup) > 14:
            out.append(f"... ({len(dedup) - 14} more marker lines)")
        out.append("```")
        out.append("")
        print(f"audited {name}: {exchanges} exchanges", file=sys.stderr)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md", file=sys.stderr)


if __name__ == "__main__":
    main()
