"""applyInPandasWithState sessionization + skew-handling utilities."""

import json

from pyspark.sql import functions as F

from ocr_vector_db_spark.operators import skew
from ocr_vector_db_spark.streaming.pipeline import read_events_stream
from ocr_vector_db_spark.streaming.stateful import sessionize_stream


def test_stateful_streaming_sessionization(spark, tmp_path):
    src = tmp_path / "sess_stream"
    src.mkdir()
    # user 1: two sessions separated by a 2h gap; user 2: one session (stays open)
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00.000Z", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:10:00.000Z", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-01-01T02:30:00.000Z", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 4, "ts": "2024-01-01T00:05:00.000Z", "user_id": 2, "event_type": "view", "value": 2.0, "props": "{}"},
    ]
    with open(src / "b1.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    out = sessionize_stream(read_events_stream(spark, str(src)))
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("closed_sessions").start())
    try:
        q.processAllAvailable()
        closed = spark.sql("SELECT * FROM closed_sessions").collect()
        # only user 1's first session closed (gap observed in-batch); open
        # sessions stay in state awaiting more data / timeout
        assert len(closed) == 1
        s = closed[0]
        assert s.user_id == 1 and s.session_seq == 0 and s.n_events == 2
        assert s.session_end.minute == 10

        # batch 2: a later event for user 2 closes their session held in
        # STATE from batch 1 — cross-batch state continuity
        with open(src / "b2.json", "w") as fh:
            fh.write(json.dumps({
                "event_id": 5, "ts": "2024-01-01T06:00:00.000Z", "user_id": 2,
                "event_type": "view", "value": 2.0, "props": "{}"}) + "\n")
        q.processAllAvailable()
        closed2 = spark.sql("SELECT * FROM closed_sessions WHERE user_id = 2").collect()
        assert len(closed2) == 1
        assert closed2[0].n_events == 1 and closed2[0].session_start.minute == 5
    finally:
        q.stop()


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [(i % 3, f"row{i}") for i in range(300)], ["k", "payload"]
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (9, "z")], ["k", "dim"])
    plain = big.join(small, "k").groupBy("k", "dim").count().collect()
    salted = skew.salted_join(big, small, "k", salt_buckets=4).groupBy("k", "dim").count().collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
    # left join keeps unmatched big rows exactly once
    n_left_plain = big.join(small, "k", "left").count()
    n_left_salted = skew.salted_join(big, small, "k", salt_buckets=4, how="left").count()
    assert n_left_plain == n_left_salted == 300


def test_top_keys_skew_report(spark):
    df = spark.createDataFrame(
        [(1,)] * 80 + [(2,)] * 15 + [(3,)] * 5, ["k"]
    )
    rows = skew.top_keys(df, "k", n=2).collect()
    assert rows[0].k == 1 and abs(rows[0].share - 0.8) < 1e-9
    assert rows[1].k == 2
