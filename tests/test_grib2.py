"""GRIB2 codec + Spark ingest tests: spec-shaped messages round-trip
through real bit packing at every width, sign-magnitude fields,
bitmaps, PNG data representation, multi-message files, and the
distributed binaryFile read; unsupported templates raise loudly."""

import numpy as np
import pytest

from climate_data_pipeline_spark.sources.grib2 import (build_grib2,
                                                       grib2_long,
                                                       parse_grib2,
                                                       read_grib2_long,
                                                       synthesize_grib2)


def test_grib2_simple_packing_roundtrip():
    rng = np.random.default_rng(43)
    v = rng.integers(0, 256, (8, 10), dtype=np.int64)
    m = parse_grib2(build_grib2(v, nbits=8))[0]
    np.testing.assert_array_equal(m["values"], v.astype(float))
    assert (m["ni"], m["nj"]) == (10, 8)
    assert (m["la1"], m["lo1"], m["dlat"]) == (-60.0, 10.0, 0.5)
    assert m["ref_time"] == "2020-01-01 00:00:00"
    # odd bit widths cross byte boundaries
    for nbits, hi in ((7, 128), (12, 4096), (10, 1024), (3, 8)):
        vv = rng.integers(0, hi, (5, 9), dtype=np.int64)
        got = parse_grib2(build_grib2(vv, nbits=nbits))[0]["values"]
        np.testing.assert_array_equal(got, vv.astype(float))


def test_grib2_scaling_and_signs():
    rng = np.random.default_rng(44)
    # Y = (R + X*2^E) / 10^D, with negative E and D in sign-magnitude
    v = rng.integers(0, 4096, (5, 7), dtype=np.int64)
    m = parse_grib2(build_grib2(v, ref=100.0, binary_scale=-1,
                                decimal_scale=1, nbits=12))[0]
    np.testing.assert_array_equal(m["values"], (100.0 + v * 0.5) / 10.0)
    # negative first-latitude exercises coordinate sign-magnitude
    m = parse_grib2(build_grib2(v, nbits=12, la1=-33.5))[0]
    assert m["la1"] == -33.5 and m["la2"] == -33.5 - 0.5 * 4


def test_grib2_bitmap_and_png_packing():
    rng = np.random.default_rng(45)
    bm = np.zeros((6, 6), bool)
    bm.reshape(-1)[::2] = True
    present = rng.integers(0, 256, int(bm.sum()), dtype=np.int64)
    vals = parse_grib2(build_grib2(present, nbits=8,
                                   bitmap=bm))[0]["values"].reshape(-1)
    assert np.isnan(vals[1::2]).all()
    np.testing.assert_array_equal(vals[::2], present.astype(float))
    v = rng.integers(0, 256, (3, 9), dtype=np.int64)
    m = parse_grib2(build_grib2(v, png_packed=True))[0]
    np.testing.assert_array_equal(m["values"], v.astype(float))
    assert m["template"] == "5.41"


def test_grib2_multi_message_and_loud_seams():
    rng = np.random.default_rng(46)
    v = rng.integers(0, 256, (4, 4), dtype=np.int64)
    two = (build_grib2(v, la1=75.25, param=(0, 4))
           + build_grib2(v, nbits=12, la1=-10.0, param=(1, 8)))
    ms = parse_grib2(two)
    assert len(ms) == 2
    assert ms[0]["la1"] == 75.25 and ms[1]["param_number"] == 8
    with pytest.raises(ValueError, match="GRIB magic"):
        parse_grib2(b"NOPE" + bytes(20))
    bad = bytearray(build_grib2(v))
    bad[7] = 1
    with pytest.raises(NotImplementedError, match="edition 1"):
        parse_grib2(bytes(bad))
    good = build_grib2(v)
    with pytest.raises(ValueError):
        parse_grib2(good[:len(good) // 2])
    # unsupported data representation template is named: walk the
    # section chain to find section 5 and rewrite its template id
    # (5.40 JPEG2000, 5.42 CCSDS/AEC and spectral 5.50/5.51 are REAL
    # since round 9 — but 5.50 on a LAT/LON grid is still a
    # contradiction the parser rejects by name)
    import struct as st
    tamper = bytearray(build_grib2(v))
    p = 16
    while tamper[p + 4] != 5:
        p += st.unpack_from(">I", tamper, p)[0]
    tamper[p + 9:p + 11] = (50).to_bytes(2, "big")   # spectral
    with pytest.raises(NotImplementedError, match="5.50"):
        parse_grib2(bytes(tamper))


def test_grib2_complex_packing_roundtrip():
    """Templates 5.2/5.3: per-group references and widths, uneven last
    groups, zero-width constant groups, negative-going series (negative
    overall minimum in the extra descriptors), scale application."""
    rng = np.random.default_rng(49)
    for trial in range(20):
        nj, ni = int(rng.integers(2, 9)), int(rng.integers(2, 11))
        v = rng.integers(0, 500, (nj, ni), dtype=np.int64)
        gs = int(rng.integers(2, 14))
        for order in (0, 1, 2):
            m = parse_grib2(build_grib2(
                v, complex_packed=True, spatial_diff_order=order,
                group_size=gs))[0]
            assert m["template"] == ("5.3" if order else "5.2")
            np.testing.assert_array_equal(m["values"], v.astype(float))
    # strictly decreasing field: every difference negative
    z = np.array([900, 700, 520, 360, 220, 100, 40, 10],
                 np.int64).reshape(2, 4)
    for order in (1, 2):
        got = parse_grib2(build_grib2(z, complex_packed=True,
                                      spatial_diff_order=order,
                                      group_size=3))[0]["values"]
        np.testing.assert_array_equal(got, z.astype(float))
    # constant field: all group widths zero
    c = np.full((5, 5), 7, np.int64)
    np.testing.assert_array_equal(
        parse_grib2(build_grib2(c, complex_packed=True))[0]["values"],
        c.astype(float))
    # scaling composes with complex packing
    v = rng.integers(0, 64, (4, 4), dtype=np.int64)
    m = parse_grib2(build_grib2(v, ref=50.0, binary_scale=-1,
                                complex_packed=True,
                                spatial_diff_order=2, group_size=5))[0]
    np.testing.assert_array_equal(m["values"], 50.0 + v * 0.5)


def test_grib2_complex_packing_bitmap_and_seams():
    rng = np.random.default_rng(50)
    bm = np.zeros((6, 8), bool)
    bm.reshape(-1)[1::3] = True
    present = rng.integers(0, 300, int(bm.sum()), dtype=np.int64)
    m = parse_grib2(build_grib2(present, bitmap=bm,
                                complex_packed=True, group_size=5))[0]
    vals = m["values"]
    np.testing.assert_array_equal(vals[bm], present.astype(float))
    assert np.isnan(vals[~bm]).all()
    # loud seams: group-splitting method 0, an UNKNOWN missing-value
    # management code (1/2 are supported since round 9), spatial
    # differencing order 3 — each named in the error
    import struct as st
    v = rng.integers(0, 256, (4, 4), dtype=np.int64)
    blob = build_grib2(v, complex_packed=True)
    p = 16
    while blob[p + 4] != 5:
        p += st.unpack_from(">I", blob, p)[0]
    for off, val, pat in ((21, 0, "group-splitting"),
                          (22, 3, "missing-value management")):
        bad = bytearray(blob)
        bad[p + off] = val
        with pytest.raises(NotImplementedError, match=pat):
            parse_grib2(bytes(bad))
    blob3 = build_grib2(v, complex_packed=True, spatial_diff_order=1)
    p = 16
    while blob3[p + 4] != 5:
        p += st.unpack_from(">I", blob3, p)[0]
    bad = bytearray(blob3)
    bad[p + 47] = 3
    with pytest.raises(NotImplementedError, match="order 3"):
        parse_grib2(bytes(bad))
    with pytest.raises(ValueError, match="one of"):
        build_grib2(v, complex_packed=True, png_packed=True)


def test_grib2_complex_spark_synthesis_classes(spark):
    """synthesize_grib2_complex → grib2_long: all four residue classes
    decode to byte-derived values; bitmap class exposes 32 cells."""
    from climate_data_pipeline_spark.sources.grib2 import \
        synthesize_grib2_complex

    rows = [(i, f"complex grib {i} " * (i + 1)) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    long = grib2_long(synthesize_grib2_complex(df, "doc_id", "text"))
    meta = {r["msg_id"]: r for r in
            long.groupBy("msg_id", "template").count().collect()}
    vals = {r["msg_id"]: r for r in
            long.groupBy("msg_id").sum("value").collect()}
    for i, text in rows:
        c = i % 4
        assert meta[i]["template"] == ("5.3" if c >= 2 else "5.2")
        assert meta[i]["count"] == (32 if c == 0 else 64)
        bts = np.frombuffer(text.encode(), np.uint8).astype(np.int64)
        cells = bts[np.arange(64) % len(bts)]
        if c == 0:
            want = float(cells[::2].sum())
        elif c == 1:
            want = float((cells * 17 + 3).sum())
        elif c == 2:
            want = float(cells.sum())
        else:
            want = float((50.0 + (cells >> 1) * 0.5).sum())
        assert vals[i]["sum(value)"] == want, i


def test_grib2_gaussian_grid_and_interval_statistics(spark):
    """Grid template 3.40: latitudes are the Legendre quadrature nodes
    (validated against leggauss directly) and ride into grib2_long's
    per-row georeferencing; product template 4.8 carries the
    statistical process / interval length / interval end; both compose
    with complex packing. Odd Nj and +y Gaussian scans stay loud."""
    import pandas as pd

    from climate_data_pipeline_spark.sources.grib2 import (
        gaussian_latitudes, synthesize_grib2_interval,
        grib2_interval_stats)

    rng = np.random.default_rng(52)
    v = rng.integers(0, 256, (8, 5), dtype=np.int64)
    m = parse_grib2(build_grib2(v, gaussian=True))[0]
    assert m["gaussian_n"] == 4
    want = np.degrees(np.arcsin(
        np.polynomial.legendre.leggauss(8)[0]))[::-1]
    np.testing.assert_allclose(m["lats"], want)
    np.testing.assert_array_equal(m["values"], v.astype(float))
    # the long model places every row on the quadrature latitude
    df = spark.createDataFrame(pd.DataFrame(
        {"msg_id": [0], "payload": [bytearray(build_grib2(
            v, gaussian=True, complex_packed=True, group_size=5))]}))
    lats = sorted({round(r["lat"], 9) for r in grib2_long(df).collect()},
                  reverse=True)
    np.testing.assert_allclose(lats, want, rtol=1e-9)
    # template 4.8 metadata round trip
    m = parse_grib2(build_grib2(v, stat=(1, 24,
                                         (2021, 6, 2, 12, 0, 0))))[0]
    assert (m["stat_process"], m["stat_hours"]) == (1, 24)
    assert m["interval_end"] == "2021-06-02 12:00:00"
    # synthesis classes decode to byte-derived means + id-derived stats
    rows = [(i, f"interval {i} " * (i + 2)) for i in range(6)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["msg_id"]: r for r in grib2_interval_stats(
        synthesize_grib2_interval(sdf, "doc_id", "text")).collect()}
    for i, text in rows:
        bts = np.frombuffer(text.encode(), np.uint8).astype(np.int64)
        cells = bts[np.arange(64) % len(bts)]
        assert got[i]["stat_process"] == i % 4
        assert got[i]["stat_hours"] == 1 + i % 96
        want_mean = (float((100.0 + (cells >> 1) * 0.5).mean())
                     if i % 3 == 2 else float(cells.mean()))
        assert got[i]["mean_value"] == want_mean, i
    # loud seams
    with pytest.raises(ValueError, match="even Nj"):
        build_grib2(rng.integers(0, 9, (7, 4), dtype=np.int64),
                    gaussian=True)
    blob = bytearray(build_grib2(v, gaussian=True))
    import struct as st
    p = 16
    while blob[p + 4] != 3:
        p += st.unpack_from(">I", blob, p)[0]
    bad = bytearray(blob)
    bad[p + 71] = 0x40
    with pytest.raises(NotImplementedError, match="scan mode 0x00"):
        parse_grib2(bytes(bad))


def test_grib2_reduced_gaussian_grid(spark):
    """Reduced Gaussian grids (Ni missing + per-parallel point-count
    list, ERA5's native layout): the ragged 1-D stream round-trips
    through every packing, grib2_long places parallel j's points at
    spacing 360/pl[j] on the quadrature latitude, and malformed lists
    stay loud."""
    import pandas as pd

    from climate_data_pipeline_spark.sources.grib2 import \
        gaussian_latitudes

    rng = np.random.default_rng(53)
    pl = np.array([4, 7, 9, 10, 10, 9, 7, 4], np.int64)
    flat = rng.integers(0, 256, int(pl.sum())).astype(np.int64)
    for kw in ({}, {"complex_packed": True, "group_size": 5},
               {"complex_packed": True, "spatial_diff_order": 2},
               {"stat": (1, 12, (2022, 3, 4, 6, 0, 0))}):
        m = parse_grib2(build_grib2(flat, gaussian=True, reduced_pl=pl,
                                    lo1=0.0, **kw))[0]
        assert np.array_equal(m["pl"], pl) and m["gaussian_n"] == 4
        np.testing.assert_array_equal(m["values"], flat.astype(float))
    # long-model georeferencing: per-parallel spacing + quadrature lats
    blob = build_grib2(flat, gaussian=True, reduced_pl=pl, lo1=0.0)
    df = spark.createDataFrame(pd.DataFrame(
        {"msg_id": [0], "payload": [bytearray(blob)]}))
    rows = grib2_long(df).collect()
    assert len(rows) == int(pl.sum())
    glats = gaussian_latitudes(4)
    by_lat = {}
    for r in rows:
        by_lat.setdefault(round(r["lat"], 9), []).append(r["lon"])
    assert len(by_lat) == 8
    for j, lat in enumerate(np.round(glats, 9)):
        lons = sorted(by_lat[lat])
        k = int(pl[j])
        assert len(lons) == k
        np.testing.assert_allclose(lons, np.arange(k) * (360.0 / k))
    # loud seams: bad interpretation byte, empty parallel, misuse
    import struct as st
    bad = bytearray(blob)
    p = 16
    while bad[p + 4] != 3:
        p += st.unpack_from(">I", bad, p)[0]
    bad[p + 11] = 3
    with pytest.raises(NotImplementedError, match="interpretation"):
        parse_grib2(bytes(bad))
    with pytest.raises(ValueError, match="1-D"):
        build_grib2(flat[:-1], gaussian=True, reduced_pl=pl)
    with pytest.raises(ValueError, match="gaussian=True"):
        build_grib2(flat, reduced_pl=pl)


def test_grib2_multi_field_messages_and_bitmap_254(spark):
    """One GRIB…7777 envelope may carry several FIELDS (sections 2-7
    repeat; unrepeated sections inherit): every section 7 closes a
    field, and bitmap indicator 254 reuses the last explicit bitmap.
    grib2_long expands every field of every message."""
    import pandas as pd
    import struct as st

    from climate_data_pipeline_spark.sources.grib2 import \
        build_grib2_multifield

    rng = np.random.default_rng(54)
    bm = np.zeros(64, bool)
    bm[::2] = True
    bm = bm.reshape(8, 8)
    fields, msgs = [], []
    for k in range(3):
        pv = rng.integers(0, 200, int(bm.sum())).astype(np.int64)
        fields.append(pv)
        msgs.append(build_grib2(pv, bitmap=bm, param=(0, k), nbits=8,
                                la1=12.0))
    fused = build_grib2_multifield(msgs, reuse_bitmap=True)
    # the 254 stubs actually shrank the envelope vs three full bitmaps
    assert len(fused) < sum(len(m) for m in msgs) - 2 * 20
    recs = parse_grib2(fused)
    assert [r["param_number"] for r in recs] == [0, 1, 2]
    for rec, pv in zip(recs, fields):
        np.testing.assert_array_equal(rec["values"][bm],
                                      pv.astype(float))
        assert np.isnan(rec["values"][~bm]).all()
    # packing may vary per field within one message
    m2 = build_grib2_multifield([
        build_grib2(rng.integers(0, 99, (4, 4)).astype(np.int64),
                    param=(0, 0)),
        build_grib2(rng.integers(0, 99, (4, 4)).astype(np.int64),
                    param=(0, 1), complex_packed=True,
                    spatial_diff_order=1)])
    assert [r["template"] for r in parse_grib2(m2)] == ["5.0", "5.3"]
    # long model: one payload → all fields' cells
    df = spark.createDataFrame(pd.DataFrame(
        {"msg_id": [0], "payload": [bytearray(fused)]}))
    rows = grib2_long(df).collect()
    assert len(rows) == 3 * 32
    by_param = {}
    for r in rows:
        by_param.setdefault(r["param_number"], 0.0)
        by_param[r["param_number"]] += r["value"]
    for k, pv in enumerate(fields):
        assert by_param[k] == float(pv.sum())
    # 254 without a previously defined bitmap is loud
    lone = build_grib2(rng.integers(0, 9, (4, 4)).astype(np.int64))
    bad = bytearray(lone)
    p = 16
    while bad[p + 4] != 6:
        p += st.unpack_from(">I", bad, p)[0]
    bad[p + 5] = 254
    with pytest.raises(ValueError, match="254"):
        parse_grib2(bytes(bad))
    # fusion refuses mismatched grids
    with pytest.raises(ValueError, match="identical"):
        build_grib2_multifield([msgs[0], build_grib2(
            rng.integers(0, 9, (4, 4)).astype(np.int64))])


def test_grib2_distributed_file_read(spark, tmp_path):
    """binaryFile → grib2_long: several files, several messages each,
    decoded on executors into the long climate shape."""
    rng = np.random.default_rng(47)
    want = {}
    for f in range(3):
        blob = b""
        for k in range(2):
            v = rng.integers(0, 256, (4, 6), dtype=np.int64)
            blob += build_grib2(v, la1=40.0 - f, param=(0, f * 2 + k))
            want[(f, k)] = v
        (tmp_path / f"f{f}.grib2").write_bytes(blob)
    long = read_grib2_long(spark, str(tmp_path / "*.grib2"))
    rows = long.collect()
    assert len(rows) == 3 * 2 * 24
    by_param = {}
    for r in rows:
        by_param.setdefault(r["param_number"], []).append(r)
    for (f, k), v in want.items():
        got = by_param[f * 2 + k]
        assert len(got) == 24
        total = sum(r["value"] for r in got)
        assert total == float(v.sum())
        assert max(r["lat"] for r in got) == 40.0 - f


def test_grib2_spark_synthesis_classes(spark):
    """synthesize_grib2 → grib2_long: each residue class decodes to
    the byte-derived values, the bitmap class exposes 32 cells."""
    rows = [(i, f"grib payload {i} " * (i + 1)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    long = grib2_long(synthesize_grib2(df, "doc_id", "text"))
    agg = {(r["msg_id"]): r for r in
           long.groupBy("msg_id", "template").count().collect()}
    for i, text in rows:
        c = i % 5
        assert agg[i]["template"] == ("5.41" if c == 4 else "5.0")
        assert agg[i]["count"] == (32 if c == 3 else 64)
    vals = {r["msg_id"]: r for r in
            long.groupBy("msg_id").sum("value").collect()}
    for i, text in rows:
        bts = np.frombuffer(text.encode(), np.uint8).astype(np.int64)
        cells = bts[np.arange(64) % len(bts)]
        c = i % 5
        if c == 0 or c == 4:
            want = float(cells.sum())
        elif c == 1:
            want = float((cells * 16).sum())
        elif c == 2:
            want = float((100.0 + (cells >> 1) * 0.5).sum())
        else:
            want = float(cells[::2].sum())
        assert vals[i]["sum(value)"] == want, i


def test_grib2_positive_y_scan_georeferencing(spark):
    """Scan mode 0x40 (south-to-north, common in real archives): the
    decoded grid is normalized north-first AND grib2_long labels each
    row with the latitude of the NORTHERN edge downward — the
    regression the round-7 review caught (la1 is the southern edge
    for +y scans)."""
    import pandas as pd

    from climate_data_pipeline_spark.sources.grib2 import grib2_long

    rng = np.random.default_rng(48)
    v = rng.integers(0, 256, (4, 3), dtype=np.int64)
    down = build_grib2(v, la1=50.0)                      # scan 0x00
    up = build_grib2(v, la1=50.0, scan_positive_y=True)  # scan 0x40
    for blob in (down, up):
        m = parse_grib2(blob)[0]
        np.testing.assert_array_equal(m["values"], v.astype(float))
    df = spark.createDataFrame(
        pd.DataFrame({"msg_id": [0, 1],
                      "payload": [bytearray(down), bytearray(up)]}))
    rows = grib2_long(df).collect()
    by_msg = {}
    for r in rows:
        by_msg.setdefault(r["msg_id"], []).append(r)
    for mid in (0, 1):
        got = {(round(r["lat"], 6), round(r["lon"], 6)): r["value"]
               for r in by_msg[mid]}
        for j in range(4):
            for i in range(3):
                assert got[(50.0 - 0.5 * j, 10.0 + 0.5 * i)] \
                    == float(v[j, i]), (mid, j, i)


def test_grib2_missing_value_management_roundtrip():
    """Template 5.2/5.3 octet-23 missing management (1 and 2): masked
    points come back NaN, every other point exact — including the
    5.3 recurrence running over the non-missing subsequence only,
    width-0 all-missing groups, and scale application after markers."""
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 200, 64).astype(np.int64)
    idx = np.arange(64)
    mp = (vals + idx) % 7 == 0
    ms = ((vals + idx) % 11 == 0) & ~mp
    assert mp.any() and ms.any()

    for kwargs, exp_vals, exp_miss in [
        (dict(complex_packed=True, group_size=5,
              missing_primary=mp.reshape(8, 8)),
         vals.astype(float), mp),
        (dict(complex_packed=True, group_size=7,
              missing_primary=mp.reshape(8, 8),
              missing_secondary=ms.reshape(8, 8)),
         vals.astype(float), mp | ms),
        (dict(complex_packed=True, spatial_diff_order=1, group_size=8,
              missing_primary=mp.reshape(8, 8)),
         vals.astype(float), mp),
        (dict(complex_packed=True, spatial_diff_order=2, group_size=6,
              ref=50.0, binary_scale=-1,
              missing_primary=mp.reshape(8, 8),
              missing_secondary=ms.reshape(8, 8)),
         50.0 + vals * 0.5, mp | ms),
    ]:
        v = vals >> 1 if kwargs.get("binary_scale") == -1 else vals
        exp = (50.0 + (vals >> 1) * 0.5
               if kwargs.get("binary_scale") == -1
               else vals.astype(float))
        m = parse_grib2(build_grib2(v.reshape(8, 8), **kwargs))[0]
        got = m["values"].reshape(-1)
        assert np.isnan(got[exp_miss]).all(), kwargs
        np.testing.assert_allclose(got[~exp_miss], exp[~exp_miss])

    # an ALL-missing group (width-0 reference marker path)
    mp2 = np.zeros(64, bool)
    mp2[8:16] = True                      # group 2 of size-8 groups
    m = parse_grib2(build_grib2(vals.reshape(8, 8),
                                complex_packed=True, group_size=8,
                                missing_primary=mp2.reshape(8, 8)))[0]
    got = m["values"].reshape(-1)
    assert np.isnan(got[8:16]).all()
    np.testing.assert_allclose(got[~mp2], vals[~mp2])

    # loud seams
    with pytest.raises(ValueError, match="complex_packed"):
        build_grib2(vals.reshape(8, 8), nbits=8,
                    missing_primary=mp.reshape(8, 8))
    with pytest.raises(ValueError, match="both primary"):
        build_grib2(vals.reshape(8, 8), complex_packed=True,
                    missing_primary=mp.reshape(8, 8),
                    missing_secondary=mp.reshape(8, 8))


def test_grib2_lambert_conformal_grid():
    """Grid template 3.30: anchor cell inverse-projects back to
    (la1, lo1) exactly, tangent and secant cones, packed values
    transparent to the projection; wrong scan/centre stay loud."""
    from climate_data_pipeline_spark.sources.grib2 import lambert_latlon

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 250, 64).astype(np.int64)
    for latin2, packing in [(38.0, {}),
                            (53.0, dict(complex_packed=True,
                                        group_size=5))]:
        lam = dict(lad=38.0, lov=262.0, latin1=38.0, latin2=latin2,
                   dx=3000.0, dy=3000.0)
        m = parse_grib2(build_grib2(vals.reshape(8, 8), nbits=8,
                                    la1=21.0, lo1=237.0, lambert=lam,
                                    **packing))[0]
        assert m["lat2d"].shape == (8, 8)
        assert abs(m["lat2d"][0, 0] - 21.0) < 1e-6
        assert abs(m["lon2d"][0, 0] - 237.0) < 1e-6
        # +y scan: northward rows increase latitude near the anchor
        assert m["lat2d"][1, 0] > m["lat2d"][0, 0]
        np.testing.assert_allclose(m["values"].reshape(-1), vals)

    # the projection matches a hand-computed forward round trip:
    # project every decoded (lat, lon) forward and recover the x/y grid
    lat, lon = lambert_latlon(8, 8, 21.0, 237.0, 38.0, 262.0,
                              3000.0, 3000.0, 38.0, 53.0)
    rad = np.pi / 180
    p1, p2 = 38.0 * rad, 53.0 * rad
    cn = (np.log(np.cos(p1) / np.cos(p2))
          / np.log(np.tan(np.pi / 4 + p2 / 2)
                   / np.tan(np.pi / 4 + p1 / 2)))
    cf = np.cos(p1) * np.tan(np.pi / 4 + p1 / 2) ** cn / cn
    R = 6371229.0
    rho = R * cf / np.tan(np.pi / 4 + lat * rad / 2) ** cn
    rho0 = R * cf / np.tan(np.pi / 4 + 38.0 * rad / 2) ** cn
    x = rho * np.sin(cn * (lon - 262.0) * rad)
    y = rho0 - rho * np.cos(cn * (lon - 262.0) * rad)
    np.testing.assert_allclose(np.diff(x, axis=1), 3000.0, rtol=1e-9)
    np.testing.assert_allclose(np.diff(y, axis=0), 3000.0, rtol=1e-9)


def test_grib2_ccsds_aec_template_roundtrip():
    """Template 5.42 (CCSDS/AEC via sources/szip.py): every framing
    axis — block sizes incl. the B-2-only 64, reference intervals,
    AEC_PAD_RSI byte alignment, scale on top, bitmaps, zero runs —
    round-trips exactly; signed/restricted flags stay loud."""
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 256, 64).astype(np.int64)
    for kw in (dict(), dict(aec_block=32, aec_rsi=4),
               dict(aec_block=64, aec_rsi=2, aec_pad_rsi=True),
               dict(aec_block=8, aec_rsi=16)):
        m = parse_grib2(build_grib2(vals.reshape(8, 8), nbits=8,
                                    aec_packed=True, **kw))[0]
        assert m["template"] == "5.42"
        np.testing.assert_array_equal(m["values"].reshape(-1), vals)
    bm = np.zeros(64, bool)
    bm[1::2] = True
    m = parse_grib2(build_grib2(vals[1::2] >> 1, ref=100.0,
                                binary_scale=-1, nbits=7,
                                bitmap=bm.reshape(8, 8),
                                aec_packed=True))[0]
    got = m["values"].reshape(-1)
    np.testing.assert_allclose(got[1::2], 100 + (vals[1::2] >> 1) * 0.5)
    assert np.isnan(got[::2]).all()
    z = np.zeros(64, np.int64)
    z[30:34] = 7
    m = parse_grib2(build_grib2(z.reshape(8, 8), nbits=8,
                                aec_packed=True))[0]
    np.testing.assert_array_equal(m["values"].reshape(-1), z)
    # loud flags: signed (0x01) and restricted (0x10)
    import struct as st
    blob = bytearray(build_grib2(vals.reshape(8, 8), nbits=8,
                                 aec_packed=True))
    p = 16
    while blob[p + 4] != 5:
        p += st.unpack_from(">I", blob, p)[0]
    for flag, pat in ((0x01, "signed"), (0x10, "restricted"),
                      (0x02, "3-byte")):
        bad = bytearray(blob)
        bad[p + 21] |= flag
        with pytest.raises(NotImplementedError, match=pat):
            parse_grib2(bytes(bad))
    # AEC_DATA_MSB (0x04) absent = LSB-first samples: also loud — a
    # real-world LSB stream must not silently mis-decode
    bad = bytearray(blob)
    bad[p + 21] &= ~0x04
    with pytest.raises(NotImplementedError, match="LSB"):
        parse_grib2(bytes(bad))


def test_grib2_spectral_templates_roundtrip():
    """Grid template 3.50 + data templates 5.50/5.51: the coefficient
    sequence round-trips exactly, the IEEE-float sub-truncation and
    the Laplacian (n(n+1))^p scaling apply to the right slots, and
    grid/spectral operator mismatches stay loud."""
    from climate_data_pipeline_spark.sources.grib2 import (
        _spectral_mn, build_grib2_spectral)

    rng = np.random.default_rng(12)
    x = rng.integers(0, 256, 72).astype(np.int64)
    ml, nl, pt = _spectral_mn(7, 7)
    assert ml.size == 72 and pt[:2].tolist() == [0, 1]

    rec = parse_grib2(build_grib2_spectral(x, 7, nbits=8))[0]
    assert rec["template"] == "5.50" and rec["spectral"]
    np.testing.assert_array_equal(rec["values"], x.astype(float))

    rec = parse_grib2(build_grib2_spectral(
        x, 7, ref=100.0, binary_scale=-1, nbits=8,
        laplacian_p=1.0, subset_trunc=2))[0]
    assert rec["template"] == "5.51"
    y = 100 + x * 0.5
    subset = (ml <= 2) & (nl <= 2)
    np.testing.assert_array_equal(
        rec["values"][subset],
        y[subset].astype(np.float32).astype(np.float64))
    np.testing.assert_array_equal(
        rec["values"][~subset],
        y[~subset] / (nl[~subset] * (nl[~subset] + 1)))

    x2 = x * 16 + 5
    rec = parse_grib2(build_grib2_spectral(
        x2, 7, nbits=12, laplacian_p=2.0, subset_trunc=3))[0]
    subset = (ml <= 3) & (nl <= 3)
    lam = (nl[~subset] * (nl[~subset] + 1)).astype(float)
    np.testing.assert_array_equal(rec["values"][~subset],
                                  x2[~subset] / (lam * lam))

    # parser/builder-level loud seams (the grib2_long-vs-spectral
    # mismatch is pinned through Spark in the test below)
    with pytest.raises(ValueError, match="wants 72 values"):
        build_grib2_spectral(x[:10], 7)
    with pytest.raises(ValueError, match="n=0"):
        build_grib2_spectral(x, 7, laplacian_p=1.0, subset_trunc=-1)


def test_grib2_spectral_spark_long(spark):
    """synthesize_grib2_spectral → grib2_spectral_long: all three
    classes, per-coefficient; grib2_long rejects spectral payloads."""
    from climate_data_pipeline_spark.sources.grib2 import (
        grib2_spectral_long, synthesize_grib2_spectral)

    rows = [(i, f"spectral {i} " * (i + 1)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    payloads = synthesize_grib2_spectral(df, "doc_id", "text")
    out = grib2_spectral_long(payloads).collect()
    assert len(out) == 6 * 72
    by = {}
    for r in out:
        by.setdefault(r["msg_id"], []).append(r)
    for mid, rs in by.items():
        assert len(rs) == 72
        tpl = {r["template"] for r in rs}
        assert tpl == ({"5.50"} if mid % 3 == 0 else {"5.51"})
        assert all(r["n"] >= r["m"] for r in rs)
    with pytest.raises(Exception, match="spherical-harmonic"):
        grib2_long(payloads).collect()


def test_grib2_spaceview_template_roundtrip():
    """Grid template 3.90 (geostationary space view): on-disk pixels
    carry the perspective-inverse lat/lon, off-disk pixels are absent
    cells, the sub-satellite pixel sits near (0, lop); unsupported
    scan/orientation/offsets stay loud."""
    from climate_data_pipeline_spark.sources.grib2 import (
        build_grib2, spaceview_latlon)

    rng = np.random.default_rng(14)
    vals = rng.integers(0, 256, 64).astype(np.int64)
    sv = dict(lop=0.0, dx=6, dy=6, xp=3.5, yp=3.5, nr=6610710)
    m = parse_grib2(build_grib2(vals.reshape(8, 8), nbits=8,
                                spaceview=sv))[0]
    lat, lon, on = spaceview_latlon(8, 8, 0.0, 6, 6, 3.5, 3.5,
                                    6610710)
    got = m["values"]
    np.testing.assert_array_equal(got[on], vals.reshape(8, 8)[on])
    assert np.isnan(got[~on]).all()
    assert int(on.sum()) == 32
    np.testing.assert_allclose(m["lat2d"][on], lat[on])
    # center pixels are near the sub-satellite point, edges near ±52°
    assert abs(m["lat2d"][3, 3]) < 15 and abs(m["lon2d"][3, 3]) < 15
    assert np.nanmax(np.abs(m["lat2d"])) > 45
    # longitude shifts with lop; complex packing transparent
    sv2 = dict(lop=140.0, dx=5, dy=5, xp=3.0, yp=3.0, nr=6610710)
    m2 = parse_grib2(build_grib2(vals.reshape(8, 8),
                                 complex_packed=True, group_size=5,
                                 spaceview=sv2))[0]
    assert abs(np.nanmean(m2["lon2d"]) - 140.0) < 30
    assert int((~np.isnan(m2["values"])).sum()) == 21
    # loud seams: tampered scan mode / orientation
    import struct as st
    blob = bytearray(build_grib2(vals.reshape(8, 8), nbits=8,
                                 spaceview=sv))
    p = 16
    while blob[p + 4] != 3:
        p += st.unpack_from(">I", blob, p)[0]
    bad = bytearray(blob)
    bad[p + 63] = 0x00
    with pytest.raises(NotImplementedError, match="scanning mode"):
        parse_grib2(bytes(bad))
    bad = bytearray(blob)
    bad[p + 64:p + 68] = (45_000_000).to_bytes(4, "big")
    with pytest.raises(NotImplementedError, match="orientation"):
        parse_grib2(bytes(bad))
