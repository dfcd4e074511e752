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


# --- binary format codecs (no Spark session: pure numpy round trips) -------

@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=2000),
       st.sampled_from([1, 2, 4, 8]),
       st.sampled_from(["zstd", "zlib", "lz4"]),
       st.sampled_from([False, True, "bit"]),
       st.one_of(st.none(), st.integers(min_value=1, max_value=300)))
def test_blosc_frame_roundtrip_fuzz(data, typesize, cname, shuffle,
                                    blocksize):
    from climate_data_pipeline_spark.sources import zarr2

    frame = zarr2.blosc_compress(data, typesize=typesize, cname=cname,
                                 shuffle=shuffle, blocksize=blocksize)
    assert zarr2.blosc_decompress(frame) == data


@settings(max_examples=30, deadline=None)
@given(st.sampled_from(["int8", "int16", "int32", "float32", "float64"]),
       st.integers(min_value=1, max_value=7),   # records
       st.integers(min_value=1, max_value=5),   # fixed dim
       st.booleans(),                           # record variable?
       st.sampled_from([1, 2]))                 # CDF version
def test_netcdf3_roundtrip_fuzz(tmp_path_factory, dtype, n_rec, n_x,
                                as_record, version):
    import numpy as np

    from climate_data_pipeline_spark.sources import netcdf3

    p = str(tmp_path_factory.mktemp("nc") / "f.nc")
    rng = np.random.default_rng(n_rec * 31 + n_x)
    if dtype.startswith("float"):
        arr = rng.normal(0, 50, (n_rec, n_x)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, (n_rec, n_x),
                           dtype=dtype, endpoint=False)
    if as_record:
        dims = {"t": None, "x": n_x}
    else:
        dims = {"t": n_rec, "x": n_x}
    netcdf3.write_netcdf3(p, dims, {"v": (["t", "x"], arr, {})},
                          version=version)
    buf = open(p, "rb").read()
    f = netcdf3.parse_netcdf3(buf)
    np.testing.assert_array_equal(netcdf3.read_var(buf, f, "v"), arr)


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=1, max_value=9),   # shape t
       st.integers(min_value=1, max_value=6),   # shape x
       st.integers(min_value=1, max_value=9),   # chunk t
       st.integers(min_value=1, max_value=6),   # chunk x
       st.booleans())                           # shuffle
def test_zarr_array_roundtrip_fuzz(tmp_path_factory, nt, nx, ct, cx,
                                   shuffle):
    """Any chunk geometry (incl. edge chunks and chunks larger than the
    array) round-trips bit-exactly."""
    import numpy as np

    from climate_data_pipeline_spark.sources import zarr2

    path = str(tmp_path_factory.mktemp("z") / "s.zarr")
    rng = np.random.default_rng(nt * 100 + nx * 10 + ct + cx)
    arr = rng.normal(0, 1, (nt, nx)).astype(np.float64)
    zarr2.write_zarr(path,
                     dims={"t": np.arange(nt), "x": np.arange(nx)},
                     variables={"v": (["t", "x"], arr, {})},
                     chunks={"v": [ct, cx]}, shuffle=shuffle)
    meta = zarr2.open_zarr_store(path)
    got = zarr2.read_zarr_array(path, "v", meta["v"])
    np.testing.assert_array_equal(got, arr)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from("ab"), min_size=1, max_size=30)
                .map(lambda ws: " ".join(ws)),
                min_size=1, max_size=8))
def test_segment_dedup_invariants(spark, docs):
    """The engine must agree exactly with a sequential Python reference:
    process docs in id order, segments in order, keep each distinct
    segment only at its first global occurrence, reassemble in order."""
    from climate_data_pipeline_spark.operators.dedup import segment_dedup

    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           segment_dedup(df, "text", "doc_id", seg_words=3).collect()}
    seen: set[str] = set()
    for i, t in enumerate(docs):
        ws = t.split()
        own = [" ".join(ws[j:j + 3]) for j in range(0, len(ws), 3)]
        kept = []
        for seg in own:
            if seg not in seen:
                seen.add(seg)
                kept.append(seg)
        assert out[i]["n_segs"] == len(own)
        assert out[i]["n_kept"] == len(kept)
        assert out[i]["text_dedup"] == " ".join(kept)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.sets(st.integers(min_value=0, max_value=10_000), min_size=1,
               max_size=60),
       st.sets(st.integers(min_value=0, max_value=10_000), min_size=1,
               max_size=60))
def test_bloom_never_drops_members(spark, members, probes):
    """Bloom prune keeps every true member for ANY key sets (the property
    exact-confirm correctness rests on)."""
    from climate_data_pipeline_spark.operators.dedup import (
        bloom_build, bloom_prune)

    m = spark.createDataFrame([(f"k{v}",) for v in members], "k string")
    p = spark.createDataFrame([(f"k{v}",) for v in probes], "k string")
    bloom = bloom_build(m, "k", m_bits=1 << 12, k=3)
    kept = {r["k"] for r in bloom_prune(p, "k", bloom,
                                        m_bits=1 << 12, k=3).collect()}
    truth = {f"k{v}" for v in members & probes}
    assert truth <= kept


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=9),   # shape t
       st.integers(min_value=1, max_value=6),   # shape x
       st.integers(min_value=1, max_value=9),   # chunk t
       st.integers(min_value=1, max_value=6),   # chunk x
       st.sampled_from(["zstd", "gzip", "blosc", "none"]))
def test_zarr3_roundtrip_fuzz(tmp_path_factory, nt, nx, ct, cx, codec):
    """Zarr v3: any chunk geometry × codec round-trips bit-exactly
    through the v3 writer and the v3-normalized reader."""
    import numpy as np

    from climate_data_pipeline_spark.sources import zarr2

    path = str(tmp_path_factory.mktemp("z3") / "s.zarr")
    rng = np.random.default_rng(nt * 1000 + nx * 100 + ct * 10 + cx)
    arr = rng.normal(0, 1, (nt, nx)).astype(np.float64)
    zarr2.write_zarr3(path,
                      dims={"t": np.arange(float(nt)),
                            "x": np.arange(float(nx))},
                      variables={"v": (["t", "x"], arr, {})},
                      chunks={"v": [ct, cx]}, codec=codec)
    meta = zarr2.open_zarr_store(path)
    got = zarr2.read_zarr_array(path, "v", meta["v"])
    np.testing.assert_array_equal(got, arr)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.sampled_from("abcd"),
                          st.integers(0, 400).map(lambda c: c / 4.0)),
                min_size=0, max_size=12),
       st.lists(st.tuples(st.sampled_from("abcd"),
                          st.integers(0, 400).map(lambda c: c / 4.0)),
                min_size=0, max_size=12))
def test_cdc_refresh_equals_full_recompute_fuzz(spark, old_rows, new_rows):
    """IVM algebra under arbitrary multiset transitions: applying the
    exceptAll change feed to version-A partials lands bit-exactly on
    version-B's full recompute — groups may grow, shrink, appear,
    vanish."""
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.operators.incremental import (
        apply_cdc_delta, cdc_delta_state, finalize_group_state,
        rollup_partials)

    schema = "k string, v double"
    old = spark.createDataFrame(old_rows, schema) if old_rows \
        else spark.createDataFrame([], schema)
    new = spark.createDataFrame(new_rows, schema) if new_rows \
        else spark.createDataFrame([], schema)
    cdc = (new.exceptAll(old).withColumn("change", F.lit("insert"))
           .unionByName(old.exceptAll(new)
                        .withColumn("change", F.lit("delete"))))
    got = {r["k"]: (r["n"], r["sum"]) for r in finalize_group_state(
        apply_cdc_delta(rollup_partials(old, ["k"], "v"),
                        cdc_delta_state(cdc, ["k"], "v"), ["k"])).collect()}
    want = {r["k"]: (r["n"], r["sum"]) for r in finalize_group_state(
        rollup_partials(new, ["k"], "v")
        .select("k", "sum_scaled", "n")).collect()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.sampled_from(["s1", "s2", "s3"]),
                          st.lists(st.sampled_from("abcdef"),
                                   min_size=0, max_size=8)),
                min_size=0, max_size=10))
def test_source_overlap_matches_naive_pair_join(spark, rows):
    """The set-collect + pair-explode plan == the naive source×source
    self-join on every generated corpus (shared-shingle counts, totals,
    ordering a < b)."""
    from itertools import combinations

    from climate_data_pipeline_spark.operators.dedup import (
        source_overlap_matrix)
    from climate_data_pipeline_spark.operators.text import WORD_SPLIT  # noqa

    data = [(i, " ".join(ws), src) for i, (src, ws) in enumerate(rows)]
    df = spark.createDataFrame(data or [(0, "", "s1")],
                               "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): (r["n_shared"], r["n_a"], r["n_b"])
           for r in source_overlap_matrix(df, "text", "source").collect()}
    # python reference: distinct 3-gram shingles per source
    per: dict[str, set] = {}
    for _, text, src in data:
        ws = [w for w in re.split(WORD_SPLIT, text.lower()) if w]
        for i in range(len(ws) - 2):
            per.setdefault(src, set()).add(" ".join(ws[i:i + 3]))
    want = {}
    for a, b in combinations(sorted(per), 2):
        shared = len(per[a] & per[b])
        if shared:
            want[(a, b)] = (shared, len(per[a]), len(per[b]))
    assert got == want


@given(nums=st.lists(st.integers(min_value=-10_000_000, max_value=10_000_000),
                     min_size=1, max_size=30),
       den=st.integers(min_value=1, max_value=2_000_000))
@settings(**_SETTINGS)
def test_round_port_matches_duckdb_on_rationals(spark, nums, den):
    """Tie-portable rounding: round_port (Spark) and sql_round_port
    (DuckDB) agree bit-for-bit on RATIONAL inputs n/d — the class where
    plain round(x, 6) diverges between Spark's BigDecimal HALF_UP and
    DuckDB's decimal path (observed at sf0.1: 6 queries, boundary rows).
    Integer ratios deliberately include exact 6th-decimal ties
    (e.g. n/d = k.0000005). Negative inputs exercise the helpers' own
    −0.0 normalization (no external '+ 0.0' — it must be built in)."""
    import duckdb
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.functions.exact import (
        round_port,
        sql_round_port,
    )

    df = spark.createDataFrame([(n,) for n in nums], "n long")
    got = sorted(r.v for r in df.select(
        round_port(F.col("n") / float(den)).alias("v")).collect())
    want = sorted(r[0] for r in duckdb.sql(
        "SELECT " + sql_round_port(f"n / {den}.0") + " AS v FROM "
        "(SELECT unnest($nums) AS n)", params={"nums": nums}).fetchall())
    assert got == want


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=40),    # rows
       st.integers(min_value=1, max_value=9),     # dim
       st.sampled_from(["<f4", "<f8", "<f2", "<i4", "u1"]),
       st.booleans())                             # bf16 storage
def test_safetensors_roundtrip_fuzz(tmp_path_factory, n, d, dtype, bf16):
    import numpy as np

    from climate_data_pipeline_spark.sources import safetensors as sft

    if bf16 and dtype != "<f4":
        return
    rng = np.random.default_rng(n * 100 + d)
    arr = (rng.normal(size=(n, d)) * 100).astype(dtype)
    p = str(tmp_path_factory.mktemp("sft") / "t.safetensors")
    sft.write_safetensors(p, {"t": arr}, bf16=("t",) if bf16 else ())
    out = sft.read_safetensors(p)["t"]
    if bf16:
        want = ((arr.view(np.uint32) >> 16) << 16).view(np.float32)
        np.testing.assert_array_equal(out, want)
    else:
        np.testing.assert_array_equal(out, arr)


def test_winnowing_matches_numpy_reference(spark):
    """Third derivation: a direct numpy transcription of the SIGMOD
    2003 algorithm (rolling windows over k-gram hashes, rightmost
    minimum per window, dedup) must select EXACTLY the engine's
    (pos, hash) set on random texts — including repeated substrings,
    unicode, and window-boundary ties."""
    import numpy as np

    from climate_data_pipeline_spark.operators.text import (
        _WINNOW_B, _WINNOW_M, winnow_fingerprints)

    k, w = 5, 4
    rng = np.random.default_rng(23)
    vocab = ["the", "cat", "sat", "mat", "aaaa", "ab", "Ü", "9"]
    rows = []
    for i in range(25):
        n = int(rng.integers(1, 40))
        rows.append((i, " ".join(rng.choice(vocab, n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["pos"], r["hash"]) for r in
           winnow_fingerprints(df, "text", "doc_id", k=k, w=w).collect()}

    want = set()
    for i, text in rows:
        # engine normalization is [^a-z0-9] on the LOWERED text —
        # non-ascii letters are stripped; replicate exactly
        import re
        nm = re.sub("[^a-z0-9]", "", text.lower())
        if len(nm) < k + w - 1:
            continue
        hashes = []
        for p in range(len(nm) - k + 1):
            h = 0
            for j in range(k):
                h += ord(nm[p + j]) * pow(_WINNOW_B, k - 1 - j, _WINNOW_M)
            hashes.append(h % _WINNOW_M)
        for e in range(w - 1, len(hashes)):
            window = hashes[e - w + 1:e + 1]
            m = min(window)
            # rightmost minimum
            q = e - (w - 1) + max(idx for idx, v in enumerate(window)
                                  if v == m)
            want.add((i, q + 1, hashes[q]))       # engine pos is 1-based
    assert got == want


def test_duplicate_spans_matches_python_reference(spark):
    """duplicate_spans vs a direct transcription: flag every position
    whose 20-gram occurs more than once corpus-wide, merge
    overlapping/adjacent flagged intervals per doc — on random corpora
    with planted shared runs, self-repeats, and near-boundary lengths,
    the (id, start, end, n_grams) sets must be identical."""
    import hashlib
    import re

    import numpy as np

    from climate_data_pipeline_spark.operators.dedup import (
        duplicate_spans,
    )

    L = 20
    rng = np.random.default_rng(31)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    shared = "a planted duplicated run of text long enough to flag"
    rows = []
    for i in range(20):
        n = int(rng.integers(0, 12))
        body = " ".join(rng.choice(words, n))
        if i % 4 == 0:
            body += " " + shared
        if i % 7 == 0:
            body += " selfrepselfrepselfrepselfrep"
        rows.append((i, body))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
           for r in duplicate_spans(df, "text", "doc_id",
                                    min_len=L).collect()}

    # reference: md5 over normalized L-grams, global counts, merge
    counts: dict = {}
    grams: dict = {}
    for i, text in rows:
        nm = re.sub("[^a-z0-9]", "", text.lower())
        g = []
        for p in range(max(0, len(nm) - L + 1)):
            h = hashlib.md5(nm[p:p + L].encode()).hexdigest()
            g.append((p + 1, h))
            counts[h] = counts.get(h, 0) + 1
        grams[i] = g
    want = set()
    for i, g in grams.items():
        flagged = [p for p, h in g if counts[h] > 1]
        if not flagged:
            continue
        start = prev_end = None
        n = 0
        for p in flagged:
            if start is None:
                start, prev_end, n = p, p + L - 1, 1
            elif p <= prev_end + 1:
                prev_end = max(prev_end, p + L - 1)
                n += 1
            else:
                want.add((i, start, prev_end, n))
                start, prev_end, n = p, p + L - 1, 1
        want.add((i, start, prev_end, n))
    assert got == want and any(r for r in want)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 40), w=st.integers(1, 40),
    quality=st.integers(1, 100),
    gray=st.booleans(),
    sub=st.sampled_from(["444", "422", "420"]),
    rst=st.integers(0, 3),
    seed=st.integers(0, 2 ** 16),
)
def test_jpeg_roundtrip_total(h, w, quality, gray, sub, rst, seed):
    """Total round trip over the whole parameter space: ANY size
    (including 1×1 and non-MCU multiples), ANY quality, both color
    layouts, every subsampling, with/without restarts — the decode
    must return the exact input shape, stay in [0, 255] uint8, and a
    CONSTANT image is DC-only, so its error is bounded by the DC quant
    steps alone: ≤ qY/16 for luma plus ≤ 1.772·qC/16 through the
    chroma inverse transform (+2 for the rounding chain) — hypothesis
    found the original ±1 claim false at quality=1, where the DC step
    clips to 255 and a constant legitimately shifts by ~16."""
    import numpy as np

    from climate_data_pipeline_spark.operators.jpeg import (
        QUANT_CHROMA, QUANT_LUMA, decode_jpeg_baseline,
        encode_jpeg_baseline, scaled_quant)

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(
        px, quality=quality, subsampling=sub, restart_interval=rst))
    assert out.shape == px.shape and out.dtype == np.uint8

    const = np.full(shape, int(rng.integers(0, 256)), np.uint8)
    got = decode_jpeg_baseline(encode_jpeg_baseline(
        const, quality=quality, subsampling=sub, restart_interval=rst))
    qy = int(scaled_quant(QUANT_LUMA, quality)[0, 0])
    qc = int(scaled_quant(QUANT_CHROMA, quality)[0, 0])
    bound = qy / 16 + (0 if gray else 1.772 * qc / 16) + 2
    assert np.abs(got.astype(int) - const.astype(int)).max() <= bound, \
        (h, w, quality, sub, rst, bound)


@settings(max_examples=20, deadline=None)
@given(
    nf=st.integers(1, 8), fps=st.integers(1, 60),
    with_index=st.booleans(), seed=st.integers(0, 2 ** 16),
)
def test_avi_container_roundtrip_total(nf, fps, with_index, seed):
    """AVI container totality: any frame count/rate, arbitrary frame
    byte lengths (odd/even), with/without idx1 — the movi walk must
    return the exact frame bytes in order."""
    import numpy as np

    from climate_data_pipeline_spark.operators.video import (
        build_avi_mjpeg, parse_avi_mjpeg)

    rng = np.random.default_rng(seed)
    # arbitrary binary frames: the container walk must not care that
    # these aren't decodable JPEGs
    frames = [rng.integers(0, 256, int(rng.integers(1, 200)),
                           dtype=np.uint8).tobytes() for _ in range(nf)]
    avi = build_avi_mjpeg(frames, 16, 16, fps=fps, with_index=with_index)
    meta = parse_avi_mjpeg(avi)
    assert meta["frames"] == frames
    assert meta["fps"] == fps


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.integers(1, 16),
       st.integers(0, 3), st.integers(2, 6), st.integers(2, 6),
       st.randoms(use_true_random=False))
def test_j2k_codestream_roundtrip_fuzz(h, w, depth, levels, cbw_exp,
                                       cbh_exp, rnd):
    """Property: every (shape × depth × decomposition × codeblock)
    combination round-trips bit-exactly through the full J2K stack —
    MQ, EBCOT, tag trees, packets, 5/3 DWT."""
    import numpy as np

    from climate_data_pipeline_spark.sources.j2k import (decode_j2k,
                                                         encode_j2k)

    rng = np.random.default_rng(rnd.randrange(2 ** 32))
    img = rng.integers(0, 1 << depth, (h, w)).astype(np.int64)
    blob = encode_j2k(img, depth, levels=levels,
                      cb_exp=(cbw_exp, cbh_exp))
    got, info = decode_j2k(blob)
    assert info["depth"] == depth
    assert np.array_equal(got, img)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 200), st.integers(1, 16),
       st.sampled_from([8, 16, 32, 64]), st.integers(1, 8),
       st.booleans(), st.booleans(),
       st.randoms(use_true_random=False))
def test_szip_aec_profile_roundtrip_fuzz(n, bpp, block, rsi,
                                         preprocess, pad, rnd):
    """Property: the CCSDS coder inverts itself across the whole AEC
    parameter lattice (block sizes incl. 64, scanline padding, with
    and without NN preprocessing, ragged tails)."""
    import numpy as np

    from climate_data_pipeline_spark.sources.szip import (
        NN_OPTION_MASK, szip_decode, szip_encode)

    rng = np.random.default_rng(rnd.randrange(2 ** 32))
    # mix smooth and spiky data so zero-block / split-sample /
    # no-compression branches all fire across examples
    if rng.random() < 0.5:
        data = (np.cumsum(rng.integers(-2, 3, n))
                % (1 << bpp)).astype(np.int64)
    else:
        data = rng.integers(0, 1 << bpp, n).astype(np.int64)
    opts = NN_OPTION_MASK if preprocess else 0
    enc = szip_encode(data, opts, bpp, block, rsi * block,
                      pad_scanline=pad)
    dec = szip_decode(enc, opts, bpp, block, rsi * block, n,
                      pad_scanline=pad)
    assert np.array_equal(dec, data)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 9), st.integers(0, 5),
       st.sampled_from([None, 1.0, 2.0]),
       st.randoms(use_true_random=False))
def test_grib2_spectral_roundtrip_fuzz(j, sub, lap, rnd):
    """Property: spherical-harmonic messages round-trip for every
    truncation/sub-truncation/Laplacian combination; the subset mask
    and packed division land on the right slots."""
    import numpy as np

    from climate_data_pipeline_spark.sources.grib2 import (
        _spectral_mn, build_grib2_spectral, parse_grib2)

    rng = np.random.default_rng(rnd.randrange(2 ** 32))
    ml, nl, _ = _spectral_mn(j, j)
    x = rng.integers(0, 256, ml.size).astype(np.int64)
    if lap is None:
        rec = parse_grib2(build_grib2_spectral(x, j, nbits=8))[0]
        np.testing.assert_array_equal(rec["values"], x.astype(float))
        return
    sub = min(sub, j)
    rec = parse_grib2(build_grib2_spectral(
        x, j, nbits=8, laplacian_p=lap, subset_trunc=sub))[0]
    subset = (ml <= sub) & (nl <= sub)
    np.testing.assert_array_equal(
        rec["values"][subset],
        x[subset].astype(np.float32).astype(np.float64))
    nn = nl[~subset]
    factor = (nn * (nn + 1)).astype(float) ** int(lap)
    np.testing.assert_array_equal(rec["values"][~subset],
                                  x[~subset] / factor)


@settings(max_examples=25, deadline=None)
@given(st.integers(3, 12), st.integers(3, 12),
       st.floats(0.0, 359.0), st.randoms(use_true_random=False))
def test_grib2_spaceview_roundtrip_fuzz(ni, nj, lop, rnd):
    """Property: space-view messages round-trip for varied grid shapes
    and sub-satellite longitudes — on-disk values exact, off-disk
    NaN, and the on-disk set identical between builder input and
    decoded output."""
    import numpy as np

    from climate_data_pipeline_spark.sources.grib2 import (
        build_grib2, parse_grib2, spaceview_latlon)

    rng = np.random.default_rng(rnd.randrange(2 ** 32))
    lop = round(lop, 3)                   # exact microdegrees
    vals = rng.integers(0, 256, (nj, ni)).astype(np.int64)
    dx = max(2, min(ni, nj) - 2)
    sv = dict(lop=lop, dx=dx, dy=dx, xp=(ni - 1) / 2.0,
              yp=(nj - 1) / 2.0, nr=6610710)
    m = parse_grib2(build_grib2(vals, nbits=8, spaceview=sv))[0]
    lat, lon, on = spaceview_latlon(ni, nj, lop, dx, dx,
                                    sv["xp"], sv["yp"], 6610710)
    got = m["values"]
    assert np.array_equal(got[on], vals[on].astype(float))
    assert np.isnan(got[~on]).all()
    assert np.isfinite(m["lat2d"][on]).all()
    assert (np.abs(m["lat2d"][on]) <= 90.0).all()


def test_canonical_url_idempotent_and_equivalence_invariant(spark):
    """Property fuzz for URL canonicalization: for URLs assembled from
    random components, (1) canonicalization is IDEMPOTENT —
    canon(canon(u)) == canon(u) — and (2) injecting any equivalence
    transformation (uppercasing scheme/host, adding the default port,
    a www prefix, a trailing slash, duplicate slashes, a fragment,
    tracking parameters, or permuting the query) never changes the
    canonical form."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from climate_data_pipeline_spark.operators.text import canonical_url

    label = st.text("abcdefghij0123456789", min_size=1, max_size=6)

    @st.composite
    def urls(draw):
        scheme = draw(st.sampled_from(["http", "https"]))
        host = ".".join(draw(st.lists(label, min_size=2, max_size=3)))
        segs = draw(st.lists(label, min_size=0, max_size=3))
        path = "/" + "/".join(segs) if segs else ""
        params = draw(st.lists(
            st.tuples(label, label), max_size=3,
            unique_by=lambda kv: kv[0]))
        base = f"{scheme}://{host}{path}"
        if params:
            base += "?" + "&".join(f"{k}={v}" for k, v in params)
        # equivalence injections, each optional
        if draw(st.booleans()):
            base = base.replace(scheme + "://",
                                scheme.upper() + "://", 1)
        if draw(st.booleans()):
            port = ":80" if scheme == "http" else ":443"
            base = base.replace(host, host + port, 1)
        if draw(st.booleans()):
            base = base.replace("://", "://www.", 1)
        if draw(st.booleans()) and "?" not in base:
            base += "/"
        if draw(st.booleans()):
            base += "#frag" + draw(label)
        if draw(st.booleans()):
            sep = "&" if "?" in base.split("#")[0] else "?"
            pre = base.split("#")[0] + sep + "utm_source=x&fbclid=y"
            base = pre + ("#" + base.split("#", 1)[1]
                          if "#" in base else "")
        plain = f"{scheme}://{host}{path or ''}"
        if params:
            plain += "?" + "&".join(
                f"{k}={v}" for k, v in sorted(params))
        return base, plain

    @settings(max_examples=30, deadline=None)
    @given(pairs=st.lists(urls(), min_size=1, max_size=8))
    def prop(pairs):
        df = spark.createDataFrame(
            [(i, b, p) for i, (b, p) in enumerate(pairs)],
            "i long, messy string, plain string")
        rows = df.select(
            canonical_url("messy").alias("c1"),
            canonical_url("plain").alias("cp")).collect()
        for r in rows:
            # the messy and plain variants canonicalize identically
            assert r.c1 == r.cp, (r.c1, r.cp)
        # idempotence: canonicalizing the canonical form is a no-op
        again = df.select(canonical_url("messy").alias("c"))
        re_rows = again.select(
            "c", canonical_url("c").alias("c2")).collect()
        for r in re_rows:
            assert r.c == r.c2, (r.c, r.c2)

    prop()
