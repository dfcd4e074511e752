"""Bucketed-table co-located join: pre-shuffling both fact tables into
the same bucket layout removes the per-query join shuffle entirely — the
'repeated joins on the same key' optimization for a 100 TB warehouse
(SURVEY.md §4.2 layout strategy; guide §Partitioning & shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.sources.io import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_small):
    # spark.sql.warehouse.dir is static — tables land in ./spark-warehouse
    # (gitignored); dropped on teardown
    li = load_table(spark, sf_small, "lineitem")
    o = load_table(spark, sf_small, "orders")
    (li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable("li_bucketed"))
    (o.withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    # disable broadcast so the join strategy is driven by bucketing alone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_bucketed")
        o = spark.table("o_bucketed")
        joined = li.join(o, "l_orderkey").groupBy("o_orderstatus") \
                   .agg(F.sum("l_quantity").alias("q"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucket-aligned SMJ: no Exchange below the join — the only
        # exchange left is the final aggregation's
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "SortMergeJoin" in plan
        # correctness identical to the unbucketed join
        got = sorted(map(tuple, joined.collect()))
        li0 = spark.table("li_bucketed")
        want = sorted(map(tuple,
                          li0.join(o, "l_orderkey")
                             .groupBy("o_orderstatus")
                             .agg(F.sum("l_quantity").alias("q")).collect()))
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
