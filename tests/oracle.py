"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side-by-side on the same
parquet tables, then compares row count, column names, dtype families and
exact values (after the driver's column-name sort + order-insensitive row
sort). Passing here at sf0.01 is the strongest local predictor of the
driver's CORRECTNESS check.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from climate_data_pipeline_spark.sources.io import TABLES

_NUMERIC = "biufc"  # numpy kinds considered one family for dtype check


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[ns]")
        elif pdf[c].dtype == object:
            # arrays / lists → tuple for sortability
            if pdf[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
                pdf[c] = pdf[c].map(
                    lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
                )
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort", na_position="last")
    return pdf.reset_index(drop=True)


def _assert_driver_canonicalizable(pdf: pd.DataFrame, side: str, name: str) -> None:
    """The driver's canonicalizer (unlike normalize() below) has no
    list→tuple rescue and hashes CSV text with default float formatting:
    a raw array/struct cell crashes its pandas sort_values with
    "unhashable type" (mm_features, r11 gate) and an int64-vs-float64
    dtype split prints "9605" vs "9605.0" — a hash mismatch on equal
    values (corpus_token_budget_mix, r11 gate: DuckDB SUM(BIGINT) →
    HUGEINT → float64). Enforce both driver rules on BOTH engines'
    outputs so the local gate predicts the driver's."""
    for c in pdf.columns:
        if pdf[c].dtype == object:
            bad = pdf[c].map(lambda v: isinstance(v, (list, np.ndarray, dict)))
            assert not bad.any(), (
                f"[{name}] {side} column {c!r} holds raw array/struct cells — "
                f"the driver's canonicalizer cannot sort them; emit rows or a "
                f"delimited string instead"
            )


def assert_parity(spark_df, sql: str, sf_dir: str, name: str = "?") -> None:
    got = spark_df.toPandas()
    want = run_oracle(sql, sf_dir)
    _assert_driver_canonicalizable(got, "spark", name)
    _assert_driver_canonicalizable(want, "oracle", name)
    got, want = normalize(got), normalize(want)

    assert list(got.columns) == list(want.columns), (
        f"[{name}] column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), (
        f"[{name}] row count mismatch: spark={len(got)} oracle={len(want)}"
    )
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        same_family = (gk == wk) or (gk in _NUMERIC and wk in _NUMERIC)
        assert same_family, f"[{name}] dtype family mismatch on {c}: {got[c].dtype} vs {want[c].dtype}"
        # exact integer width check matters for the driver's schema hash
        if gk in "iu" and wk in "iu":
            assert got[c].dtype == want[c].dtype, (
                f"[{name}] integer width mismatch on {c}: {got[c].dtype} vs {want[c].dtype}"
            )
        # int-vs-float split: equal values hash differently as CSV text
        # in the driver ("9605" vs "9605.0") — e.g. an uncast DuckDB
        # SUM(BIGINT) (→ HUGEINT → float64) against a Spark long
        if gk in _NUMERIC and wk in _NUMERIC:
            assert (gk in "iu") == (wk in "iu") and (gk == "b") == (wk == "b"), (
                f"[{name}] numeric dtype split on {c}: {got[c].dtype} vs "
                f"{want[c].dtype} — the driver hashes these as different "
                f"text; CAST the oracle (or the query) so both sides share "
                f"an int, float or bool dtype"
            )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True,
                                  obj=f"query {name}")
