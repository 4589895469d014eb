"""Bucketed co-located join: persist both join sides bucketed on the key and
verify the join plan has NO shuffle (Exchange) — the 100 TB pattern for
repeated fact⋈fact joins on a stable key (SURVEY §4 'bucketing for
co-located joins')."""

import pytest
from pyspark.sql import functions as F

from ocr_vector_db_spark.session import load_table


def test_bucketed_join_has_no_exchange(spark, tables):
    # warehouse dir is a static conf — tables land in ./spark-warehouse and
    # are dropped in the finally block
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast

    li = tables["lineitem"]
    o = tables["orders"]
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .saveAsTable("li_bucketed"))
    (o.withColumnRenamed("o_orderkey", "l_orderkey")
       .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .saveAsTable("o_bucketed"))
    try:
        a = spark.table("li_bucketed")
        b = spark.table("o_bucketed")
        joined = a.join(b, "l_orderkey").groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either side — bucket layout IS the
        # partitioning (only the final tiny agg may exchange)
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in join_part, join_part[:500]
        # sanity: result matches the unbucketed join
        expect = (
            li.join(o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
            .groupBy("o_orderstatus").count().collect()
        )
        got = joined.collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, expect))
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
