"""Incremental rollup maintenance + Z-order clustering (scale machinery)."""

from __future__ import annotations

import pyspark.sql.functions as F

from climate_data_pipeline_spark.operators import incremental as I
from climate_data_pipeline_spark.operators import zorder as Z
from climate_data_pipeline_spark.sources.io import load_table
from climate_data_pipeline_spark.sources.synthetic import climate_grid

# oracle parity for incremental_rollup / zorder_cluster_key runs in
# test_oracle_parity.py with every other registered query


def test_merge_partials_equals_full_recompute(spark, sf_dir):
    """The monoid property that makes the rollup incremental: partials of
    any split, merged, equal partials of the whole."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_trunc("month", "l_shipdate").alias("m"), "l_extendedprice")
    split = F.col("l_extendedprice") < 30000  # arbitrary, uneven split
    merged = I.merge_rollups(
        I.rollup_partials(li.where(split), ["m"], "l_extendedprice"),
        I.rollup_partials(li.where(~split), ["m"], "l_extendedprice"))
    full = I.rollup_partials(li, ["m"], "l_extendedprice")
    got = {r["m"]: r for r in merged.collect()}
    want = {r["m"]: r for r in full.collect()}
    assert got.keys() == want.keys()
    for m, r in want.items():
        assert got[m].asDict() == r.asDict()


def test_morton_key_matches_python_interleave(spark):
    def py_morton(x, y, bits):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    pts = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (999, 123)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y",
                              Z.morton_key("x", "y", bits=10).alias("z")
                              ).collect()}
    for x, y in pts:
        assert got[(x, y)] == py_morton(x, y, 10), (x, y)


def test_quantize_clamps_and_bounds(spark):
    df = spark.createDataFrame([(-100.0,), (-90.0,), (0.0,), (90.0,), (95.0,)],
                               "v double")
    vals = [r["q"] for r in
            df.select(Z.quantize("v", -90.0, 90.0, 8).alias("q")).collect()]
    assert vals[0] == 0          # below range clamps to 0
    assert vals[1] == 0
    assert vals[3] == 255        # top of range hits the max cell
    assert vals[4] == 255        # above range clamps
    assert 0 < vals[2] < 255


def test_zorder_layout_files_cover_rectangles(spark, tmp_path):
    """The point of Z-ordering: per-file min/max ranges are narrow on BOTH
    dimensions, where a one-column sort leaves the other dimension
    unconstrained (full-range per file)."""
    grid = climate_grid(spark, days=30).select("lat", "lon")

    zpath = str(tmp_path / "zorder")
    (Z.zorder_by(grid, "lat", "lon", (-90.0, 90.0), (-180.0, 180.0),
                 bits=8, n_partitions=16)
      .write.parquet(zpath))

    lpath = str(tmp_path / "latsort")
    grid.repartitionByRange(16, "lat").sortWithinPartitions("lat") \
        .write.parquet(lpath)

    def mean_spreads(path):
        per_file = (spark.read.parquet(path)
                    .groupBy(F.input_file_name())
                    .agg((F.max("lat") - F.min("lat")).alias("dlat"),
                         (F.max("lon") - F.min("lon")).alias("dlon"))
                    .agg(F.avg("dlat"), F.avg("dlon")).first())
        return per_file[0], per_file[1]

    z_dlat, z_dlon = mean_spreads(zpath)
    l_dlat, l_dlon = mean_spreads(lpath)

    # lat-only sort: lat tight but lon unconstrained (~full 350° range)
    assert l_dlon > 300.0
    # z-order: both dimensions simultaneously compact
    assert z_dlat < 90.0
    assert z_dlon < 180.0
    assert z_dlon < l_dlon / 2


def test_cdc_delta_refresh_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.operators.incremental import (
        apply_cdc_delta, cdc_delta_state, finalize_group_state,
        rollup_partials)

    old = spark.createDataFrame(
        [("a", 1.25), ("a", 2.50), ("b", 4.00), ("c", 9.99)],
        "k string, v double")
    # new: 'a' updated (one row changed), 'b' grew, 'c' fully deleted,
    # 'd' brand new — exercises every CDC case including group vanish
    new = spark.createDataFrame(
        [("a", 1.25), ("a", 3.75), ("b", 4.00), ("b", 1.00), ("d", 7.00)],
        "k string, v double")
    cdc = (new.exceptAll(old).withColumn("change", F.lit("insert"))
           .unionByName(old.exceptAll(new)
                        .withColumn("change", F.lit("delete"))))
    refreshed = apply_cdc_delta(rollup_partials(old, ["k"], "v"),
                                cdc_delta_state(cdc, ["k"], "v"), ["k"])
    got = {r["k"]: (r["n"], r["sum"], r["avg"])
           for r in finalize_group_state(refreshed).collect()}
    want = {r["k"]: (r["n"], r["sum"], r["avg"])
            for r in finalize_group_state(
                rollup_partials(new, ["k"], "v")
                .select("k", "sum_scaled", "n")).collect()}
    assert got == want
    assert "c" not in got          # vanished group dropped, not zero-row
