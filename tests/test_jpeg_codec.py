"""Baseline JPEG codec (operators/jpeg.py): hand-assembled golden
bitstream against published Annex-K codewords, encode/decode property
sweeps, restart-marker invariance, subsampling, and the Spark dispatch
— the spec-fixture pattern of the netcdf3/hdf5/zarr/safetensors codecs
(no PIL/libjpeg in the container, so the fixtures are the spec)."""

import struct

import numpy as np
import pytest

from climate_data_pipeline_spark.operators.jpeg import (
    HUFF_AC_LUMA,
    HUFF_DC_CHROMA,
    HUFF_DC_LUMA,
    ZIGZAG,
    _canonical_codes,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    scaled_quant,
)


def test_canonical_codes_match_published_annex_k_codewords():
    """The canonical construction (C.2) must reproduce the codewords
    printed in the spec's Annex-K tables: DC luma category 0 = '00',
    category 2 = '011'; AC luma EOB = '1010', ZRL = '11111111001';
    DC chroma category 0 = '00' (2 bits)."""
    dc = _canonical_codes(*HUFF_DC_LUMA)
    assert dc[0] == (0b00, 2)
    assert dc[1] == (0b010, 3)
    assert dc[2] == (0b011, 3)
    assert dc[11] == (0b111111110, 9)
    ac = _canonical_codes(*HUFF_AC_LUMA)
    assert ac[0x00] == (0b1010, 4)               # EOB
    assert ac[0x01] == (0b00, 2)
    assert ac[0xF0] == (0b11111111001, 11)       # ZRL
    dcc = _canonical_codes(*HUFF_DC_CHROMA)
    assert dcc[0] == (0b00, 2)
    assert dcc[3] == (0b110, 3)


def _golden_gray_8x8() -> tuple[bytes, np.ndarray]:
    """Hand-assemble a complete one-block grayscale JPEG, bit by bit:
    constant value 130, quant table all-ones with DC step 8. The
    entropy segment is derived BY HAND from the Annex-K codewords:
    s = 130-128 = 2 ⇒ DC diff 8·2/8 = 2 ⇒ category 2 ('011') + bits
    '10'; all ACs zero ⇒ EOB ('1010'); '011101010' padded with 1s =
    0x75 0x7F."""
    q = np.ones(64, np.int64)
    q[0] = 8

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    qtab = q.reshape(8, 8).reshape(-1)[ZIGZAG]
    out = bytearray(b"\xFF\xD8")
    out += seg(0xDB, bytes([0]) + bytes(int(v) for v in qtab))
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    for tc_th, (bits, vals) in ((0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    out += seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3F\x00")
    out += bytes([0x75, 0x7F])
    out += b"\xFF\xD9"
    return bytes(out), np.full((8, 8), 130, np.uint8)


def test_golden_bitstream_decodes_exactly():
    data, want = _golden_gray_8x8()
    got = decode_jpeg_baseline(data)
    np.testing.assert_array_equal(got, want)


def test_encoder_reproduces_golden_entropy_bytes():
    """Our encoder, given the same image and tables, must emit the same
    hand-derived entropy segment (0x75 0x7F) right before EOI."""
    q = np.ones((8, 8), np.int64)
    q[0, 0] = 8
    b = encode_jpeg_baseline(np.full((8, 8), 130, np.uint8),
                             quant_tables=(q, q))
    assert b[-4:] == bytes([0x75, 0x7F, 0xFF, 0xD9])


def test_block_constant_roundtrip_exact():
    """Constant 8×8 tiles with DC quant step 8 round-trip EXACTLY —
    DC = 8·(v−128) divides evenly, ACs are zero (the property the
    mm_decode_jpeg oracle rests on) — across every DC magnitude
    category the 0..255 range can produce."""
    rng = np.random.default_rng(6)
    q = np.ones((8, 8), np.int64)
    q[0, 0] = 8
    for _ in range(5):
        vals = rng.integers(0, 256, 16, dtype=np.int64)
        px = np.repeat(np.repeat(vals.reshape(4, 4), 8, 0), 8, 1)
        px = px.astype(np.uint8)
        for rst in (0, 1, 3):
            out = decode_jpeg_baseline(encode_jpeg_baseline(
                px, quant_tables=(q, q), restart_interval=rst))
            np.testing.assert_array_equal(out, px), rst
    # extremes: full-swing DC deltas (category 11 boundary territory)
    px = np.repeat(np.repeat(
        np.array([[0, 255], [255, 0]], np.uint8), 8, 0), 8, 1)
    out = decode_jpeg_baseline(encode_jpeg_baseline(
        px, quant_tables=(q, q)))
    np.testing.assert_array_equal(out, px)


def test_restart_markers_do_not_change_pixels():
    """The entropy stream with DRI/RSTn must decode to the SAME pixels
    as without (restart only resets predictors and realigns) — on a
    noisy image whose stream also exercises 0xFF byte stuffing."""
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    plain = decode_jpeg_baseline(encode_jpeg_baseline(px, quality=85))
    for rst in (1, 2, 5):
        b = encode_jpeg_baseline(px, quality=85, restart_interval=rst)
        assert any(0xD0 <= b[i + 1] <= 0xD7
                   for i in range(len(b) - 1) if b[i] == 0xFF)
        np.testing.assert_array_equal(decode_jpeg_baseline(b), plain)


def test_byte_stuffing_exercised_and_transparent():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    b = encode_jpeg_baseline(px, quality=95)
    assert b"\xFF\x00" in b  # stuffed bytes present in the stream
    out = decode_jpeg_baseline(b)
    assert out.shape == px.shape


def test_near_lossless_with_unit_quant():
    """All-ones quant tables: the only loss is DCT float rounding —
    every pixel within ±2, gray and RGB 4:4:4."""
    rng = np.random.default_rng(3)
    ones = (np.ones((8, 8), np.int64),) * 2
    g = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    got = decode_jpeg_baseline(encode_jpeg_baseline(g, quant_tables=ones))
    assert np.abs(got.astype(int) - g.astype(int)).max() <= 2
    c = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    got = decode_jpeg_baseline(encode_jpeg_baseline(
        c, quant_tables=ones, subsampling="444"))
    # color adds the YCbCr forward/inverse rounding on top
    assert np.abs(got.astype(int) - c.astype(int)).max() <= 3


def test_smooth_image_quality_sweep():
    """A smooth gradient survives the default Annex-K tables: tight
    bounds at q90, looser at q50, and the payload actually compresses."""
    yy, xx = np.mgrid[0:48, 0:64]
    px = np.clip(100 + 50 * np.sin(xx / 15.0) + 40 * np.cos(yy / 11.0),
                 0, 255).astype(np.uint8)
    b90 = encode_jpeg_baseline(px, quality=90)
    err90 = np.abs(decode_jpeg_baseline(b90).astype(int) - px.astype(int))
    assert err90.max() <= 4
    b50 = encode_jpeg_baseline(px, quality=50)
    err50 = np.abs(decode_jpeg_baseline(b50).astype(int) - px.astype(int))
    assert err50.max() <= 12
    assert len(b50) < len(b90) < px.size


def test_subsampling_constant_color_and_shapes():
    """4:4:4 / 4:2:2 / 4:2:0 on constant color: within ±1 of the input
    (color-transform rounding only), at sizes that are NOT multiples of
    the MCU (crop path), including the decoder's chroma upsample."""
    for shape in ((16, 16), (17, 23), (8, 9), (31, 18)):
        px = np.zeros((*shape, 3), np.uint8)
        px[:] = (90, 160, 210)
        for sub in ("444", "422", "420"):
            out = decode_jpeg_baseline(encode_jpeg_baseline(
                px, quality=95, subsampling=sub))
            assert out.shape == px.shape, (shape, sub)
            assert np.abs(out.astype(int) - px.astype(int)).max() <= 1, \
                (shape, sub)


def test_smooth_color_roundtrip_each_subsampling():
    yy, xx = np.mgrid[0:32, 0:48]
    r = np.clip(128 + 60 * np.sin(xx / 9.0), 0, 255)
    g = np.clip(128 + 60 * np.cos(yy / 7.0), 0, 255)
    b = np.clip(128 + 30 * np.sin((xx + yy) / 11.0), 0, 255)
    px = np.stack([r, g, b], -1).astype(np.uint8)
    for sub, bound in (("444", 6), ("422", 14), ("420", 14)):
        out = decode_jpeg_baseline(encode_jpeg_baseline(
            px, quality=92, subsampling=sub))
        err = np.abs(out.astype(int) - px.astype(int))
        assert err.mean() < 4 and err.max() <= bound, (sub, err.max())


def test_quality_scaling_formula():
    """scaled_quant follows the public libjpeg formula: identity-ish at
    50, all-ones at 100, coarser below 50, always clipped to [1, 255]."""
    from climate_data_pipeline_spark.operators.jpeg import QUANT_LUMA
    assert (scaled_quant(QUANT_LUMA, 100) == 1).all()
    assert (scaled_quant(QUANT_LUMA, 50) == QUANT_LUMA).all()
    assert (scaled_quant(QUANT_LUMA, 10) >= QUANT_LUMA).all()
    assert scaled_quant(QUANT_LUMA, 1).max() == 255
    assert scaled_quant(QUANT_LUMA, 1).min() >= 1


def test_non_baseline_and_malformed_raise_loudly():
    data, _ = _golden_gray_8x8()
    # flip SOF0 -> SOF2 (progressive)
    prog = data.replace(b"\xFF\xC0", b"\xFF\xC2")
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg_baseline(prog)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"\x00\x01" + data)
    with pytest.raises(ValueError):
        decode_jpeg_baseline(data[:2] + b"\xFF\xD9")  # no SOF/SOS


def test_progressive_decodes_identical_to_baseline():
    """The progressive scan script re-assembles the exact quantized
    coefficients the baseline stream carries, so the two decodes must
    be BYTE-IDENTICAL for the same input — one equality pins spectral
    selection, successive approximation (DC and AC first + refinement),
    EOB-run decoding and correction-bit placement at once."""
    from climate_data_pipeline_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_progressive)

    rng = np.random.default_rng(11)
    for shape in [(8, 8), (24, 17), (32, 32, 3), (19, 13, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        for q in (25, 75, 95):
            base = decode_jpeg_baseline(encode_jpeg_baseline(px, quality=q))
            prog = decode_jpeg(encode_jpeg_progressive(px, quality=q))
            np.testing.assert_array_equal(base, prog, err_msg=f"{shape} q{q}")


def test_progressive_eob_runs_span_blocks():
    """A mostly-flat image makes whole AC bands zero across many
    consecutive blocks, forcing multi-block EOBn codes (and, in the
    refinement scans, correction bits buffered across the run) — the
    progressive-only machinery a per-block EOB can't exercise."""
    from climate_data_pipeline_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_progressive)

    px = np.full((64, 48), 128, np.uint8)
    px[30:34, 20:24] = 200          # one busy patch amid long runs
    data = encode_jpeg_progressive(px, quality=50)
    base = decode_jpeg_baseline(encode_jpeg_baseline(px, quality=50))
    np.testing.assert_array_equal(decode_jpeg(data), base)


def test_progressive_refine_zrl_correction_bit_order():
    """G.7 ordering regression: a band with >15 zero-history zeros and
    a history-nonzero coefficient after the 16-zero window must emit
    that coefficient's correction bit after the NEXT symbol, not after
    the first ZRL. The directed case (coefs 4 @ zigzag 30, 1 @ 31,
    unit quant) plus a sparse-high-band fuzz both desynchronized the
    decoder before the fix (raised 'illegal refinement symbol' or
    silently shifted pixels)."""
    from climate_data_pipeline_spark.operators.jpeg import (
        _T, decode_jpeg, encode_jpeg_progressive)

    q1 = np.ones((8, 8), np.int64)

    def from_coefs(zzvals):
        blk = np.zeros(64)
        blk[ZIGZAG] = zzvals
        px = _T.T @ blk.reshape(8, 8) @ _T + 128.0
        return np.clip(np.round(px), 0, 255).astype(np.uint8)

    zz = np.zeros(64)
    zz[30], zz[31] = 4, 1
    px = from_coefs(zz)
    base = decode_jpeg_baseline(encode_jpeg_baseline(px, quant_tables=(q1, q1)))
    prog = decode_jpeg(encode_jpeg_progressive(px, quant_tables=(q1, q1)))
    np.testing.assert_array_equal(base, prog)
    rng = np.random.default_rng(99)
    for _ in range(60):
        zz = np.zeros(64)
        idx = rng.choice(np.arange(1, 64), size=rng.integers(1, 6),
                         replace=False)
        zz[idx] = rng.integers(-6, 7, size=len(idx))
        zz[0] = rng.integers(-40, 40)
        px = from_coefs(zz)
        base = decode_jpeg_baseline(
            encode_jpeg_baseline(px, quant_tables=(q1, q1)))
        prog = decode_jpeg(
            encode_jpeg_progressive(px, quant_tables=(q1, q1)))
        np.testing.assert_array_equal(base, prog)


def test_decode_jpeg_dispatch_and_loud_seams():
    from climate_data_pipeline_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_progressive)

    data, want = _golden_gray_8x8()
    # baseline streams route through the baseline decoder unchanged
    np.testing.assert_array_equal(decode_jpeg(data), want)
    # decode_jpeg_baseline keeps its strict contract on SOF2 ...
    prog = data.replace(b"\xFF\xC0", b"\xFF\xC2")
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg_baseline(prog)
    # ... while decode_jpeg rejects the SAME stream for the real
    # reason: a baseline scan header (Ss=0, Se=63) is illegal in a
    # progressive frame
    with pytest.raises(ValueError, match="Ss=0 requires Se=0"):
        decode_jpeg(prog)
    # truncated progressive entropy stream surfaces loudly
    px = np.arange(256, dtype=np.uint8).reshape(16, 16)
    full = encode_jpeg_progressive(px, quality=75)
    sos = full.index(b"\xFF\xDA")
    with pytest.raises(ValueError, match="truncated|ends"):
        decode_jpeg(full[:sos + 12])


def test_spark_progressive_residue_block_mean(spark):
    """synthesize_jpeg(progressive_every=5) → decode_media_real: the
    progressive ids decode to the same cycled-byte block means as their
    baseline siblings (exact round trip either way)."""
    from climate_data_pipeline_spark.operators.multimodal import (
        decode_media_real, synthesize_jpeg)

    rows = [(i, f"progressive payload {i} " * (i + 1)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["media_id"]: r for r in
           decode_media_real(synthesize_jpeg(df, "doc_id", "text",
                                             progressive_every=5))
           .collect()}
    for i, text in rows:
        vals = np.resize(np.frombuffer(text.encode(), np.uint8), 16)
        assert abs(got[i]["mean_value"] - float(vals.mean())) < 1e-12, i
    # ids 2 and 7 actually took the SOF2 path
    payloads = {r["media_id"]: bytes(r["payload"]) for r in
                synthesize_jpeg(df, "doc_id", "text",
                                progressive_every=5).collect()}
    assert b"\xFF\xC2" in payloads[2] and b"\xFF\xC2" in payloads[7]
    assert b"\xFF\xC2" not in payloads[0]


def test_undefined_table_references_raise_value_error():
    """A scan referencing a quant/Huffman table id no DQT/DHT defined
    must raise the module's documented ValueError, not a bare KeyError
    out of _decode_scan."""
    data, _ = _golden_gray_8x8()
    # SOF0 component tq byte -> table 3 (only table 0 is defined)
    sof = data.index(b"\xFF\xC0")
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1) then cid, hv, tq
    tq_at = sof + 2 + 2 + 1 + 2 + 2 + 1 + 2
    bad_q = data[:tq_at] + b"\x03" + data[tq_at + 1:]
    with pytest.raises(ValueError, match="undefined quantization"):
        decode_jpeg_baseline(bad_q)
    # SOS component Td/Ta byte -> tables 3/3 (undefined)
    sos = data.index(b"\xFF\xDA")
    tdta_at = sos + 2 + 2 + 1 + 1  # len(2) ns(1) cs(1) then tdta
    bad_h = data[:tdta_at] + b"\x33" + data[tdta_at + 1:]
    with pytest.raises(ValueError, match="undefined Huffman"):
        decode_jpeg_baseline(bad_h)


def test_spark_dispatch_and_block_mean(spark):
    """synthesize_jpeg → decode_media_real inside the Arrow plan: the
    decoded mean equals the cycled-byte block mean, per row."""
    from climate_data_pipeline_spark.operators.multimodal import (
        decode_media_real, synthesize_jpeg)

    rows = [(0, "hello jpeg"), (1, ""), (2, "ü 漢字 🙂"), (3, "x" * 300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["media_id"]: r for r in
           decode_media_real(synthesize_jpeg(df, "doc_id", "text"))
           .collect()}
    for i, text in rows:
        raw = text.encode("utf-8") or b"\x00"
        vals = np.resize(np.frombuffer(raw, np.uint8), 16)
        r = got[i]
        assert (r["kind"], r["width"], r["height"], r["n_channels"]) \
            == ("image", 32, 32, 1)
        assert abs(r["mean_value"] - float(vals.mean())) < 1e-12, (i, text)


def test_fill_bytes_before_markers_are_skipped():
    """B.1.1.2: any number of 0xFF fill bytes may precede a marker —
    the header walk must not parse a length out of the padding."""
    data, want = _golden_gray_8x8()
    # inject fill bytes before the DQT marker
    i = data.index(b"\xFF\xDB")
    padded = data[:i] + b"\xFF\xFF\xFF" + data[i:]
    np.testing.assert_array_equal(decode_jpeg_baseline(padded), want)


def test_truncated_entropy_stream_raises_loudly():
    """A scan cut short must surface as a clear ValueError, not the
    internal _MarkerHit or a bare IndexError."""
    px = np.arange(64 * 4, dtype=np.uint8).reshape(16, 16)
    b = encode_jpeg_baseline(px, quality=90)
    # drop most of the entropy segment but keep the EOI marker
    sos = b.index(b"\xFF\xDA")
    cut = b[:sos + 20] + b"\xFF\xD9"
    with pytest.raises(ValueError, match="truncated|ends before"):
        decode_jpeg_baseline(cut)


def test_huffman_memo_is_bounded():
    from climate_data_pipeline_spark.operators.jpeg import (
        _canonical_codes_cached, _decode_table_cached)
    assert _canonical_codes_cached.cache_info().maxsize == 512
    assert _decode_table_cached.cache_info().maxsize == 512


def test_resize_over_jpeg_payloads(spark):
    """resize_image_area accepts grayscale baseline JPEGs: with
    block-constant synthesis (DC quant 8, exact decode) every 2x2 box
    mean equals the block value; color JPEGs stay loud."""
    import numpy as np
    import pytest as _pt

    from climate_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_baseline)
    from climate_data_pipeline_spark.operators.multimodal import (
        resize_image_area)

    q = np.ones((8, 8), np.int64)
    q[0, 0] = 8
    vals = np.array([[10, 200], [90, 160]], np.uint8)
    px = np.repeat(np.repeat(vals, 8, 0), 8, 1)        # 16x16, 4 tiles
    jpg = encode_jpeg_baseline(px, quant_tables=(q, q))
    media = spark.createDataFrame(
        [(0, "image/jpeg", bytearray(jpg), len(jpg))],
        "media_id long, media_type string, payload binary, n_bytes long")
    out = {(r["y"], r["x"]): r["value"]
           for r in resize_image_area(media, factor=2).collect()}
    assert len(out) == 64
    for y in range(8):
        for x in range(8):
            assert out[(y, x)] == float(vals[y // 4, x // 4])

    color = encode_jpeg_baseline(
        np.zeros((16, 16, 3), np.uint8) + 120, quality=95)
    media_c = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(color), len(color))],
        "media_id long, media_type string, payload binary, n_bytes long")
    with _pt.raises(Exception, match="grayscale"):
        resize_image_area(media_c).collect()
