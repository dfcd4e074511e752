"""JPEG 2000 codec tests (sources/j2k.py): MQ coder, tag trees, 5/3
DWT, EBCOT tier-1 per band orientation, full codestream round trips,
the GRIB2 template-5.40 integration, and loud profile seams."""

from __future__ import annotations

import numpy as np
import pytest

from climate_data_pipeline_spark.sources.j2k import (J2KUnsupported,
                                                     MQDecoder,
                                                     MQEncoder,
                                                     T1Decoder,
                                                     T1Encoder,
                                                     TagTree,
                                                     _HdrReader,
                                                     _HdrWriter,
                                                     decode_j2k,
                                                     encode_j2k,
                                                     fdwt53, idwt53)


def test_mq_coder_roundtrip_uniform_and_skewed():
    rng = np.random.default_rng(1)
    for trial in range(30):
        n = int(rng.integers(1, 2000))
        p = 0.02 if trial % 2 else 0.5       # skew exercises 0xFF paths
        bits = (rng.random(n) < p).astype(int).tolist()
        ctxs = rng.integers(0, 19, n).tolist()
        enc = MQEncoder()
        for b, c in zip(bits, ctxs):
            enc.encode(int(b), int(c))
        dec = MQDecoder(enc.flush())
        assert [dec.decode(int(c)) for c in ctxs] == bits


def test_tag_tree_roundtrip_mixed_thresholds():
    rng = np.random.default_rng(2)
    for _ in range(20):
        w, h = int(rng.integers(1, 7)), int(rng.integers(1, 7))
        vals = rng.integers(0, 6, (h, w))
        tmax = int(vals.max()) + 2
        te = TagTree(w, h)
        for y in range(h):
            for x in range(w):
                te.set(x, y, int(vals[y, x]))
        te.finalize()
        bw = _HdrWriter()
        for t in range(1, tmax + 1):
            for y in range(h):
                for x in range(w):
                    te.encode(bw, x, y, t)
        td = TagTree(w, h)
        br = _HdrReader(bw.flush())
        res = np.full((h, w), -1)
        for t in range(1, tmax + 1):
            for y in range(h):
                for x in range(w):
                    if td.decode(br, x, y, t) and res[y, x] < 0:
                        res[y, x] = td.value[0][y][x]
        assert np.array_equal(res, vals)


def test_dwt53_perfect_reconstruction():
    rng = np.random.default_rng(3)
    for _ in range(30):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        img = rng.integers(-5000, 5000, (h, w)).astype(np.int64)
        lv = int(rng.integers(0, 5))
        assert np.array_equal(idwt53(fdwt53(img, lv)), img)


def test_t1_roundtrip_every_band_orientation():
    rng = np.random.default_rng(4)
    for trial in range(24):
        band = ["LL", "HL", "LH", "HH"][trial % 4]
        h, w = int(rng.integers(1, 20)), int(rng.integers(1, 20))
        if trial % 3 == 0:                    # sparse
            c = np.zeros((h, w), np.int64)
            k = int(rng.integers(0, h * w + 1))
            idx = rng.choice(h * w, size=k, replace=False)
            c.flat[idx] = rng.integers(-2000, 2000, k)
        else:
            c = rng.integers(-300, 300, (h, w)).astype(np.int64)
        data, npasses, nbp = T1Encoder(c, band).run()
        if nbp == 0:
            assert not c.any()
            continue
        got = T1Decoder(w, h, band, data, npasses, nbp).run()
        assert np.array_equal(got, c), (trial, band)


def test_j2k_codestream_roundtrip():
    rng = np.random.default_rng(5)
    for trial in range(15):
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        depth = int(rng.integers(2, 17))
        img = rng.integers(0, 1 << depth, (h, w)).astype(np.int64)
        lv = int(rng.integers(0, 4))
        blob = encode_j2k(img, depth, levels=lv,
                          cb_exp=(int(rng.integers(2, 7)),
                                  int(rng.integers(2, 7))))
        got, info = decode_j2k(blob)
        assert np.array_equal(got, img)
        assert info["depth"] == depth and info["levels"] == lv
    # smooth climate-like field compresses well and stays bit-exact
    img = (np.cumsum(rng.integers(-3, 4, (90, 181)), axis=1)
           + 500).clip(0, 1023).astype(np.int64)
    blob = encode_j2k(img, 10, levels=3)
    assert len(blob) < img.size * 2 // 2
    assert np.array_equal(decode_j2k(blob)[0], img)


def test_j2k_loud_profile_seams():
    img = np.arange(64, dtype=np.int64).reshape(8, 8)
    blob = bytearray(encode_j2k(img, 8, levels=1))

    def patched(off, val):
        b = bytearray(blob)
        b[off] = val
        return bytes(b)

    # SIZ Csiz lives at offset 2(SOC)+4(hdr)+34: 2 components
    csiz_off = 2 + 4 + 34 + 1
    with pytest.raises(J2KUnsupported, match="components"):
        decode_j2k(patched(csiz_off, 2))
    # COD transform byte: 0 = 9/7 irreversible
    sod = bytes(blob).find(b"\xff\x52")
    with pytest.raises(J2KUnsupported, match="9/7"):
        decode_j2k(patched(sod + 4 + 9, 0))
    with pytest.raises(ValueError, match="SOC"):
        decode_j2k(b"\x00\x00" + bytes(blob))


def test_grib2_jpeg2000_template_roundtrip():
    from climate_data_pipeline_spark.sources.grib2 import (build_grib2,
                                                           parse_grib2)
    rng = np.random.default_rng(6)
    vals = rng.integers(0, 256, 64).astype(np.int64)
    m = parse_grib2(build_grib2(vals.reshape(8, 8), nbits=8,
                                jpeg2000_packed=True))[0]
    assert m["template"] == "5.40"
    np.testing.assert_array_equal(m["values"].reshape(-1), vals)
    # bitmap rides as a (1, n) image; scale applies after the codec
    bm = np.zeros(64, bool)
    bm[::2] = True
    m = parse_grib2(build_grib2(vals[::2] >> 1, ref=100.0,
                                binary_scale=-1, nbits=7,
                                bitmap=bm.reshape(8, 8),
                                jpeg2000_packed=True))[0]
    got = m["values"].reshape(-1)
    np.testing.assert_allclose(got[::2], 100 + (vals[::2] >> 1) * 0.5)
    assert np.isnan(got[1::2]).all()
    with pytest.raises(ValueError, match="one of"):
        build_grib2(vals.reshape(8, 8), jpeg2000_packed=True,
                    png_packed=True)


def test_j2k_depth_guard_5bit_qcd_field():
    """QCD subband exponents live in a 5-bit field; eps = depth + gain
    (HH gain 2) must stay <= 31 or the byte wraps and the codestream
    silently decodes wrong — the encoder must refuse, not corrupt."""
    img = (np.arange(64) % 64).reshape(8, 8)
    with pytest.raises(J2KUnsupported, match="5-bit QCD"):
        encode_j2k(img, depth=30)
    # depth 29 (HH eps 31) is the last representable depth and must
    # still round-trip losslessly
    rng = np.random.default_rng(11)
    big = rng.integers(0, 1 << 29, (8, 8)).astype(np.int64)
    out, _ = decode_j2k(encode_j2k(big, depth=29))
    np.testing.assert_array_equal(out, big)
