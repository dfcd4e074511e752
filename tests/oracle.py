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


def assert_parity(spark_df, sql: str, sf_dir: str, name: str = "?") -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(run_oracle(sql, sf_dir))

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
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True,
                                  obj=f"query {name}")
