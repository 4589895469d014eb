"""Frame-sampled video near-dup (q155): slicing reference, aligned
banded ≡ brute force, projection filters, plan shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.image_hash import (
    dhash_signatures,
    hamming_hex,
)
from ocr_vector_db_spark.operators.video_hash import (
    asset_video_frames,
    video_frame_signatures,
    video_near_dup_pairs,
)


def _mat(seed):
    return [[hashlib.md5(f"{seed}:{cx}:{cy}".encode()).digest()[0] % 200 + 10
             for cx in range(9)] for cy in range(8)]


def _render(m, w, h):
    return bytes(m[y * 8 // h][x * 9 // w]
                 for y in range(h) for x in range(w))


def _video(seed, w, h, nf, bright=0, swap=()):
    frames = []
    for f in range(nf):
        s = f"{seed}:f{f}" if f not in swap else f"cut:{seed}:f{f}"
        m = [[min(255, v + bright) for v in row] for row in _mat(s)]
        frames.append(_render(m, w, h))
    return frames


def _assets_df(spark, vids):
    rows = [
        (aid, "video", b"".join(frames),
         {"format": "raw", "channels": "1", "width": str(w),
          "height": str(h), "n_frames": str(len(frames))})
        for aid, frames, w, h in vids
    ]
    return spark.createDataFrame(
        rows,
        "asset_id string, kind string, data binary, "
        "metadata map<string,string>",
    )


def test_frame_sampling_slices_exact_bytes(spark):
    """asset_video_frames(every=k) returns EXACTLY the k-strided frames'
    bytes (binary substring == python slicing), always including frame
    0, and drops length-mismatched and compressed rows."""
    frames = _video("sl", 20, 12, 7)
    adf = _assets_df(spark, [("v", frames, 20, 12)])
    bad = spark.createDataFrame(
        [("short", "video", b"\x00" * 10,
          {"format": "raw", "channels": "1", "width": "20",
           "height": "12", "n_frames": "7"}),
         ("mp4", "video", b"ftyp", {"format": "mp4"})],
        "asset_id string, kind string, data binary, "
        "metadata map<string,string>",
    )
    for every in (1, 2, 3):
        got = {r.frame_idx: (bytes(r.data), r.width, r.height)
               for r in asset_video_frames(
                   adf.unionByName(bad), every=every).collect()}
        exp = {i: (frames[i], 20, 12) for i in range(0, 7, every)}
        assert got == exp, every


def test_signatures_equal_per_frame_dhash(spark):
    """video_frame_signatures == dhash_signatures run on the frames
    sliced driver-side: the composite-id round trip loses nothing —
    including for an asset_id that itself contains the separator."""
    frames = _video("sg", 36, 24, 5)
    adf = _assets_df(spark, [("v1", frames, 36, 24)])
    got = {(r.asset_id, r.frame_idx): r.dhash
           for r in video_frame_signatures(
               asset_video_frames(adf, every=2)).collect()}
    tricky = _assets_df(spark, [("s3://b/x#y.mp4", frames, 36, 24)])
    t = video_frame_signatures(asset_video_frames(tricky, every=2))
    assert sorted((r.asset_id, r.frame_idx) for r in t.collect()) == \
        [("s3://b/x#y.mp4", i) for i in (0, 2, 4)]
    direct = spark.createDataFrame(
        [(f"f{i}", frames[i], 36, 24) for i in (0, 2, 4)],
        "asset_id string, data binary, width int, height int",
    )
    exp = {r.id: r.dhash
           for r in dhash_signatures(direct).collect()}
    assert got == {("v1", i): exp[f"f{i}"] for i in (0, 2, 4)}


@pytest.mark.parametrize("r", [2, 4])
def test_aligned_banded_equals_brute_force(spark, r):
    """The aligned candidate join returns EXACTLY the brute-force pairs:
    per aligned position, hamming <= r; per video pair, the matched
    count and frac."""
    vids = [
        ("a", _video("bf", 36, 24, 6), 36, 24),
        ("b", _video("bf", 36, 24, 6, bright=15), 36, 24),
        ("c", _video("bf", 36, 24, 6, swap=(1, 3)), 36, 24),
        ("d", _video("bf-other", 36, 24, 6), 36, 24),
    ]
    vsigs = video_frame_signatures(
        asset_video_frames(_assets_df(spark, vids), every=1))
    got = {(p.id_a, p.id_b): (p.matched, p.frac)
           for p in video_near_dup_pairs(
               vsigs, r=r, min_frac=0.0).collect()}
    rows = vsigs.collect()
    sig = {(x.asset_id, x.frame_idx): x.dhash for x in rows}
    ids = sorted({x.asset_id for x in rows})

    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    exp = {}
    for i, va in enumerate(ids):
        for vb in ids[i + 1:]:
            m = sum(
                1 for f in range(6)
                if ham(sig[(va, f)], sig[(vb, f)]) <= r
            )
            if m:
                exp[(va, vb)] = (m, m / 6)
    assert got == exp


def test_near_dup_min_frac_threshold(spark):
    """min_frac gates the pair list: the different cut survives 0.5 but
    not 0.9; unrelated clips never pair."""
    vids = [
        ("base", _video("th", 36, 24, 8), 36, 24),
        ("cut", _video("th", 36, 24, 8, swap=(0, 1, 2)), 36, 24),
        ("other", _video("th-x", 36, 24, 8), 36, 24),
    ]
    vsigs = video_frame_signatures(
        asset_video_frames(_assets_df(spark, vids), every=1))
    at_half = {(p.id_a, p.id_b)
               for p in video_near_dup_pairs(vsigs, r=4,
                                             min_frac=0.5).collect()}
    assert at_half == {("base", "cut")}
    at_high = video_near_dup_pairs(vsigs, r=4, min_frac=0.9).collect()
    assert at_high == []


def test_plan_shape_no_cartesian(spark):
    """The aligned pair search is equi-join-shaped end to end: no
    cartesian product anywhere in the physical plan."""
    vids = [("a", _video("pl", 36, 24, 4), 36, 24),
            ("b", _video("pl", 36, 24, 4, bright=9), 36, 24)]
    pairs = video_near_dup_pairs(
        video_frame_signatures(
            asset_video_frames(_assets_df(spark, vids), every=1)))
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _clips_df(spark, vids):
    rows = [(aid, b"".join(frames), w, h, len(frames))
            for aid, frames, w, h in vids]
    return spark.createDataFrame(
        rows,
        "asset_id string, data binary, width int, height int, "
        "n_frames int",
    )


def test_video_index_incremental_screen(spark, tmp_path):
    """VideoFpIndex: per-frame signatures in SimHashIndex's banded
    layout, screen/dedup_new lifted to the video grain (aligned matched
    fraction >= min_frac), every/min_frac persisted in meta, re-add
    guard at the frame-doc grain."""
    from ocr_vector_db_spark.operators.video_hash import VideoFpIndex

    corpus = [(s, _video(s, 36, 24, 8), 36, 24)
              for s in ("cva", "cvb", "cvc")]
    idx = VideoFpIndex.build(
        spark, _clips_df(spark, corpus), str(tmp_path / "vfpidx"),
        r=4, n_buckets=8, every=2, min_frac=0.6,
    )
    batch = [
        ("cva_bright", _video("cva", 36, 24, 8, bright=15), 36, 24),
        ("cva_cut", _video("cva", 36, 24, 8, swap=(0, 2, 4, 6)), 36, 24),
        ("fresh", _video("cvnew", 36, 24, 8), 36, 24),
    ]
    bdf = _clips_df(spark, batch)
    hits = {(h.new_id, h.corpus_id): (h.matched, h.frac)
            for h in idx.screen(bdf).collect()}
    # bright matches all 4 sampled positions; the cut replaces every
    # sampled position -> no pair; fresh matches nothing
    assert hits[("cva_bright", "cva")][0] == 4
    assert not any(n in ("cva_cut", "fresh") for n, _ in hits)

    survivors = sorted(r.asset_id for r in idx.dedup_new(bdf).collect())
    assert survivors == ["cva_cut", "fresh"]
    assert idx.add(_clips_df(spark, batch[2:])) == 4  # 4 frame docs
    assert idx.add(_clips_df(spark, batch[2:])) == 0  # replay no-op

    reloaded = VideoFpIndex.load(spark, str(tmp_path / "vfpidx"))
    assert (reloaded.every, reloaded.min_frac) == (2, 0.6)
    # a second screen against the reloaded index sees the added video
    again = {(h.new_id, h.corpus_id)
             for h in reloaded.screen(
                 _clips_df(spark, [("re", _video("cvnew", 36, 24, 8),
                                    36, 24)])).collect()}
    assert again == {("re", "fresh")}


def test_stream_ingest_video_dedup(spark, tmp_path):
    """The streaming asset gate through its video seams: batch 1 seeds
    the persisted VideoFpIndex; batch 2's brightness re-encode drops
    against the store, an intra-batch re-encode pair collapses
    keep-min, a sub-grid clip dedups by exact byte hash cross-batch,
    and the novel clip is accepted and folded in."""
    import shutil

    from ocr_vector_db_spark.operators.video_hash import VideoFpIndex
    from ocr_vector_db_spark.streaming.assets import (
        ExactFrameStore,
        exact_video_key,
        hashable_videos_pred,
        stream_ingest_asset_dedup,
    )
    from ocr_vector_db_spark.streaming.pipeline import ParquetAcceptedSink

    schema = ("asset_id string, data binary, width int, height int, "
              "n_frames int")

    def feed(src, name, vids):
        stage = tmp_path / f"vstage_{name}"
        _clips_df(spark, vids).coalesce(1).write.mode(
            "overwrite").parquet(str(stage))
        src.mkdir(exist_ok=True)
        shutil.copy(next(stage.glob("part-*.parquet")),
                    src / f"{name}.parquet")

    tiny = [("tiny", _video("sv-tiny", 6, 5, 2), 6, 5)]  # below 9x8
    empty = spark.createDataFrame([], schema)
    idx = VideoFpIndex.build(
        spark, empty, str(tmp_path / "vfpidx_stream"), r=4,
        n_buckets=8, every=1, min_frac=0.6,
    )
    xstore = ExactFrameStore(spark, str(tmp_path / "exact_videos"))
    src = tmp_path / "vclips"
    sink = ParquetAcceptedSink(str(tmp_path / "accepted_videos"))
    ckpt = str(tmp_path / "victkpt")

    def run(stats):
        q = stream_ingest_asset_dedup(
            spark.readStream.schema(schema).parquet(str(src)), idx, sink,
            stats=stats, checkpoint=ckpt, exact_store=xstore,
            hashable_pred=hashable_videos_pred,
            exact_key=exact_video_key,
        )
        q.awaitTermination(60)

    feed(src, "b1", [("va", _video("sv-a", 36, 24, 6), 36, 24),
                     ("vb", _video("sv-b", 36, 24, 6), 36, 24)] + tiny)
    stats: list = []
    run(stats)
    assert sorted(r.asset_id for r in sink.read(spark).collect()) == \
        ["tiny", "va", "vb"]
    assert stats[-1] == {"epoch": 0, "accepted": 3, "dropped_as_dup": 0,
                         "unhashable": 1, "dropped_exact_dup": 0}

    feed(src, "b2", [
        ("va_bright", _video("sv-a", 36, 24, 6, bright=12), 36, 24),
        ("vnew_1", _video("sv-new", 36, 24, 6), 36, 24),
        ("vnew_2", _video("sv-new", 36, 24, 6, bright=9), 36, 24),
        ("tiny2", _video("sv-tiny", 6, 5, 2), 6, 5),   # same bytes
        ("vnovel", _video("sv-novel", 36, 24, 6), 36, 24),
    ])
    stats2: list = []
    run(stats2)
    accepted = {(r.asset_id, r.epoch_id) for r in sink.read(spark).collect()}
    assert accepted == {("va", 0), ("vb", 0), ("tiny", 0),
                        ("vnew_1", 1), ("vnovel", 1)}
    assert stats2[-1] == {"epoch": 1, "accepted": 2, "dropped_as_dup": 2,
                          "unhashable": 1, "dropped_exact_dup": 1}


def test_video_keep_best(spark):
    """Quality-aware video dedup: the re-encode family keeps the copy
    with the most delivered pixels (the 2x re-scale master)."""
    from ocr_vector_db_spark.operators.video_hash import video_keep_best

    vids = [
        ("v_small", _video("kb", 36, 24, 6), 36, 24),
        ("v_big", _video("kb", 72, 48, 6), 72, 48),
        ("v_bright", _video("kb", 36, 24, 6, bright=10), 36, 24),
        ("v_lone", _video("kb-lone", 36, 24, 6), 36, 24),
    ]
    got = {r.asset_id: (r.family, r.keep, r.pixels)
           for r in video_keep_best(
               _clips_df(spark, vids), r=4, min_frac=0.6).collect()}
    fam = got["v_big"][0]
    assert got["v_small"][0] == fam and got["v_bright"][0] == fam
    assert got["v_big"][1] is True
    assert got["v_small"][1] is False and got["v_bright"][1] is False
    assert got["v_lone"][0] == "v_lone" and got["v_lone"][1] is True


def test_video_screen_containment_min_denominator(spark, tmp_path):
    """A longer NEW video that contains an indexed shorter clip at
    aligned positions must gate: frac = matched / min(n_new, n_corpus)
    — the batch path's denominator (ADVICE r12). With matched/n_new
    alone (4/12 here) the containment evaded the streaming screen even
    though video_near_dup_pairs would pair the same content."""
    from ocr_vector_db_spark.operators.video_hash import VideoFpIndex

    short = _video("cont", 36, 24, 4)
    idx = VideoFpIndex.build(
        spark, _clips_df(spark, [("short", short, 36, 24)]),
        str(tmp_path / "vfpc"), r=4, n_buckets=8, every=1, min_frac=0.6,
    )
    long_v = short + _video("cont-tail", 36, 24, 8)  # 12 frames
    ldf = _clips_df(spark, [("long", long_v, 36, 24)])
    hits = idx.screen(ldf).collect()
    assert {(h.new_id, h.corpus_id) for h in hits} == {("long", "short")}
    assert (hits[0].matched, hits[0].frac) == (4, 1.0)
    assert idx.dedup_new(ldf).count() == 0  # gated

    # vcounts persists through add + reload: containment against a
    # video folded in AFTER the build also gates
    idx.add(_clips_df(spark, [("added", _video("addv", 36, 24, 4),
                               36, 24)]))
    reloaded = VideoFpIndex.load(spark, str(tmp_path / "vfpc"))
    long2 = _video("addv", 36, 24, 4) + _video("t2", 36, 24, 8)
    hits2 = {(h.new_id, h.corpus_id): h.frac
             for h in reloaded.screen(
                 _clips_df(spark, [("l2", long2, 36, 24)])).collect()}
    assert hits2 == {("l2", "added"): 1.0}

    # and compaction keeps the counts
    reloaded.compact()
    assert {r.doc: r.n for r in reloaded.vcounts_table().collect()} == \
        {"short": 4, "added": 4}

    # ADVICE r13: a crash between the vcounts write and the signature
    # append makes the retried add() write a SECOND identical (doc, n)
    # row — the fold must stay exact (max, not sum), or the doubled
    # n_corpus silently weakens the min(n_new, n_corpus) containment
    # screen back to matched/n_new for that video
    from ocr_vector_db_spark.operators.index_maint import current_gen_dir

    vdir = current_gen_dir(spark, str(tmp_path / "vfpc" / "vcounts"))
    spark.createDataFrame([("added", 4)], "doc string, n long") \
        .write.mode("append").parquet(vdir)
    assert {r.doc: r.n for r in reloaded.vcounts_table().collect()} == \
        {"short": 4, "added": 4}
    # the containment screen still gates at frac 1.0 after the replay
    hits3 = {(h.new_id, h.corpus_id): h.frac
             for h in reloaded.screen(
                 _clips_df(spark, [("l2", long2, 36, 24)])).collect()}
    assert hits3 == {("l2", "added"): 1.0}
