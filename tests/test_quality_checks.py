"""Data-quality expectation gate: violation counting, single-pass plan,
key and referential checks on synthetic dirty data."""

from __future__ import annotations

from pyspark.sql import functions as F

from climate_data_pipeline_spark.operators import quality_checks as Q


def _dirty(spark):
    return spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "A"), (None, 3.0, "B"),
         (4, 200.0, "C"), (4, 7.0, "Z")],
        "id int, v double, flag string")


def test_run_checks_counts_violations(spark):
    rep = {r["check"]: r for r in Q.run_checks(_dirty(spark), [
        Q.not_null("id"),
        Q.in_range("v", 0, 100),
        Q.one_of("flag", ["A", "B", "C"]),
        Q.expression("v_even_id", (F.col("id") % 2 != 0)),
    ]).collect()}
    assert rep["not_null:id"]["n_violations"] == 1
    assert rep["in_range:v"]["n_violations"] == 2  # -5 and 200
    assert rep["one_of:flag"]["n_violations"] == 1  # Z
    assert not rep["in_range:v"]["pass"]
    assert all(r["n_rows"] == 5 for r in rep.values())


def test_run_checks_is_single_scan(spark):
    df = _dirty(spark)
    plan = (Q.run_checks(df, [Q.not_null("id"), Q.in_range("v", 0, 100),
                              Q.one_of("flag", ["A", "B", "C"])])
            ._jdf.queryExecution().executedPlan().toString())
    # one aggregate over one source: no joins, no unions of scans
    assert "Join" not in plan and "Union" not in plan


def test_unique_key_violations(spark):
    dup = Q.unique_key_violations(_dirty(spark), ["id"]).collect()
    assert {(r["id"], r["n_copies"]) for r in dup} == {(4, 2)}


def test_referential_violations(spark):
    child = spark.createDataFrame([(1,), (2,), (99,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    orphans = Q.referential_violations(child, "fk", parent, "pk").collect()
    assert [r["fk"] for r in orphans] == [99]


def test_run_checks_empty_input_passes(spark):
    """Regression: an empty slice must PASS every check (0 violations),
    not report NULL/neither-pass-nor-fail."""
    from climate_data_pipeline_spark.operators import quality_checks as Q
    df = spark.createDataFrame([], "v double")
    out = Q.run_checks(df.where("v > 999"), [Q.in_range("v", 0, 10)])
    r = out.first()
    assert r["n_violations"] == 0 and r["pass"] is True


def test_run_checks_rejects_duplicate_names(spark):
    import pytest as _pt
    with _pt.raises(ValueError, match="duplicate check name"):
        Q.run_checks(_dirty(spark), [Q.in_range("v", -90, 60),
                                     Q.in_range("v", 0, 50)])
