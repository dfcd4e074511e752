"""Tests for the MERGE/upsert and SCD2 emulation operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double")
    updates = spark.createDataFrame(
        [(2, "B", 25.0), (4, "d", 40.0)],
        "id long, name string, v double")
    from climate_data_pipeline_spark.operators.merge import merge_upsert

    out = {r["id"]: (r["name"], r["v"])
           for r in merge_upsert(target, updates, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 25.0),
                   3: ("c", 30.0), 4: ("d", 40.0)}

    bad = updates.withColumnRenamed("v", "value")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(target, bad, ["id"])


def test_scd2_apply(spark):
    from climate_data_pipeline_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [(1, "x", "2020-01-01 00:00:00", None, True),
         (2, "y", "2020-01-01 00:00:00", None, True),
         (2, "old", "2019-01-01 00:00:00", "2020-01-01 00:00:00", False)],
        "id long, attr string, valid_from string, valid_to string, is_current boolean") \
        .withColumn("valid_from", F.col("valid_from").cast("timestamp")) \
        .withColumn("valid_to", F.col("valid_to").cast("timestamp"))
    changes = spark.createDataFrame(
        [(1, "x"),        # unchanged → no new version
         (2, "y2")],      # changed → close + append
        "id long, attr string")

    out = scd2_apply(dim, changes, keys=["id"], compare_cols=["attr"],
                     effective_ts="2024-06-01 00:00:00").collect()
    rows = {(r["id"], r["attr"]): r for r in out}
    assert len(out) == 4  # 1 untouched current + 1 history + 1 closed + 1 new
    assert rows[(1, "x")]["is_current"]
    closed = rows[(2, "y")]
    assert not closed["is_current"] and str(closed["valid_to"]).startswith("2024-06-01")
    new = rows[(2, "y2")]
    assert new["is_current"] and new["valid_to"] is None
    hist = rows[(2, "old")]
    assert not hist["is_current"]


def test_scd2_inserts_brand_new_keys(spark):
    """Regression: a change row whose key has no current dim version is
    INSERTED as a fresh current version, not silently dropped."""
    from climate_data_pipeline_spark.operators.merge import scd2_apply
    dim = spark.createDataFrame(
        [(1, "a", "2020-01-01 00:00:00", None, True)],
        "id long, attr string, valid_from string, valid_to string, "
        "is_current boolean") \
        .withColumn("valid_from", F.col("valid_from").cast("timestamp")) \
        .withColumn("valid_to", F.col("valid_to").cast("timestamp"))
    changes = spark.createDataFrame([(1, "a"), (5, "z")],
                                    "id long, attr string")
    out = scd2_apply(dim, changes, keys=["id"], compare_cols=["attr"])
    rows = {(r["id"], r["is_current"]): r["attr"] for r in out.collect()}
    assert rows[(5, True)] == "z"              # new key inserted
    assert rows[(1, True)] == "a"              # unchanged key untouched
    assert len(rows) == 2
    import pytest as _pt
    with _pt.raises(ValueError, match="compare_cols"):
        scd2_apply(dim, changes, keys=["id"], compare_cols=[])
