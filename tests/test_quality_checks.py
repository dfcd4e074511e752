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


def test_winnowing_guarantee_and_edges(spark):
    """The winnowing GUARANTEE (SIGMOD 2003): any shared substring of
    >= k+w-1 normalized characters plants at least one identical
    fingerprint hash in both documents. Plus: rightmost-min tie rule
    (selection is deterministic), and too-short docs yield nothing."""
    from climate_data_pipeline_spark.operators.text import (
        winnow_fingerprints,
    )

    k, w = 12, 8
    shared = "a quick brown fox jumps over the lazy dog tonight"
    df = spark.createDataFrame(
        [(1, "PREFIX one two three " + shared + " SUFFIX alpha"),
         (2, "completely different opening words " + shared),
         (3, "no common content here at all whatsoever in this"),
         (4, "tiny")],
        "doc_id long, text string")
    fp = winnow_fingerprints(df, "text", "doc_id", k=k, w=w)
    rows = fp.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["hash"])
    # guarantee: docs 1 and 2 share the long substring -> >= 1 shared hash
    assert by_doc[1] & by_doc[2]
    # doc 3 shares no >= k+w-1 run with 1 or 2 beyond chance
    assert not (by_doc[3] & by_doc[1]) and not (by_doc[3] & by_doc[2])
    # a doc shorter than k+w-1 normalized chars yields NO fingerprints
    assert 4 not in by_doc
    # determinism: same input -> identical selected (pos, hash) set
    again = {(r["doc_id"], r["pos"], r["hash"])
             for r in winnow_fingerprints(df, "text", "doc_id",
                                          k=k, w=w).collect()}
    assert again == {(r["doc_id"], r["pos"], r["hash"]) for r in rows}
    # density: winnowing keeps ~2/(w+1) of positions, never all of them
    n_positions = len("".join(c for c in
                              ("prefixonetwothree" + shared + "suffixalpha")
                              if c.isalnum())) - k + 1
    assert 0 < len(by_doc[1]) < n_positions


def test_duplicate_spans_exactness(spark):
    """duplicate_spans pins exact semantics: a 20+-char run shared by
    two docs is flagged in BOTH with correct 1-based offsets; adjacent
    flagged grams merge into one maximal span; unique docs are absent;
    self-repeats within one document count."""
    from climate_data_pipeline_spark.operators.dedup import (
        duplicate_spans,
    )

    shared = "thisexactrunoftext repeats in both documents verbatim"
    df = spark.createDataFrame(
        [(1, "AAA " + shared + " tail one"),
         (2, "opening words differ " + shared + " zzz"),
         (3, "entirely unique content with no repeats whatsoever."),
         (4, "selfrepeatselfrepeatselfrepeatselfrepeat xx")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           duplicate_spans(df, "text", "doc_id", min_len=20).collect()}
    # normalized doc1 = "aaa" + norm(shared) + "tailone"
    norm_shared = "".join(c for c in shared if c.isalnum())
    assert 1 in out and 2 in out and 3 not in out
    s1 = out[1]
    assert s1["span_start"] == 4                  # right after "aaa"
    assert s1["span_end"] == 3 + len(norm_shared)
    s2 = out[2]
    assert (s2["span_end"] - s2["span_start"] + 1) == len(norm_shared)
    # doc 4: "selfrepeat" x4 -> 20-grams repeat WITHIN the doc
    assert 4 in out and out[4]["n_grams"] >= 1
