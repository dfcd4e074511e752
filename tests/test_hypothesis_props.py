"""Hypothesis property tests: engine invariants under generated inputs.

Spark-session round trips are expensive, so strategies stay small and
examples are capped; the properties themselves are the point —
tokenizer/fingerprint invariances, Jaccard bounds, DSL compiler algebra,
as-of ordering.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from climate_data_pipeline_spark.operators.text import (
    BPE_PIECE,
    LANG_MARKERS,
    WORD_SPLIT,
)

_SETTINGS = dict(max_examples=25, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

texts = st.text(
    alphabet=st.sampled_from("abcdefg XYZ.,!?019-_\n\t"), min_size=0,
    max_size=80)


def py_words(t: str) -> list[str]:
    return [w for w in re.split(WORD_SPLIT, t.lower()) if w]


@settings(**_SETTINGS)
@given(texts)
def test_word_split_regex_agrees_with_python(spark, t):
    """The engine's split/filter expression == Python re.split reference
    (one JVM round trip per example, tiny DataFrame)."""
    from climate_data_pipeline_spark.operators.text import tokenize

    df = spark.createDataFrame([(t,)], "text string")
    got = tokenize(df, "text").first()["words"]
    assert got == py_words(t)


@settings(**_SETTINGS)
@given(texts)
def test_bpe_pieces_cover_all_word_chars(t):
    """Every alphanumeric char lands in exactly one BPE piece (pure-Python
    check of the regex the engine and oracle share)."""
    pieces = re.findall(BPE_PIECE, t.lower())
    assert sum(len(p) for p in pieces if p.strip()) >= len(
        re.sub(r"[^a-z0-9]", "", t.lower()))


@settings(**_SETTINGS)
@given(st.lists(st.sampled_from(sorted({m for v in LANG_MARKERS.values()
                                        for m in v})), max_size=30))
def test_lang_scores_bounded_by_word_count(words):
    """Marker scores can never exceed the word count (duplicate-weighted
    counting invariant), checked in pure Python against the lexicons."""
    text = " ".join(words)
    ws = py_words(text)
    for markers in LANG_MARKERS.values():
        score = sum(1 for w in ws if w in markers)
        assert 0 <= score <= len(ws)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 3), st.floats(0, 100)),
                min_size=1, max_size=40))
def test_dsl_slice_region_equals_manual_filter(spark, rows):
    from climate_data_pipeline_spark.plans.ops import run_ops

    df = spark.createDataFrame([(k, round(v, 3)) for k, v in rows],
                               "k int, v double")
    got = run_ops(df, [{"op": "slice_region", "bounds": {"v": [10, 50]}}])
    want = [r for r in rows if 10 <= round(r[1], 3) <= 50]
    assert got.count() == len(want)


@settings(**_SETTINGS)
@given(st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=30),
       st.integers(2, 12))
def test_dsl_resample_mean_bounded(spark, values, buckets):
    """resample mean per bucket lies within [min, max] of inputs."""
    from climate_data_pipeline_spark.plans.ops import run_ops

    rows = [(f"2024-01-{(i % buckets) + 1:02d} 00:00:00", float(v))
            for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "ts_s string, v double") \
              .selectExpr("cast(ts_s as timestamp) as ts", "v")
    out = run_ops(df, [{"op": "resample", "freq": "day", "column": "ts",
                        "aggs": {"m": "mean(v)"}}]).collect()
    lo, hi = min(values), max(values)
    for r in out:
        assert lo - 1e-9 <= r["m"] <= hi + 1e-9
