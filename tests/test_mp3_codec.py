"""MPEG-1 Layer III MDCT-chain decoder (operators/mp3.py).

The decoder's formula-defined stages are pinned three ways: against
independent re-derivations of the spec formulas (IMDCT/window matrix
built separately here), against structural invariants (energy
rotation in the alias butterflies, prefix property of streaming
decode, exact power-of-two gain linearity), and against the loud
seams (Annex-B table data and synthesis window stay refused by name).
"""

import numpy as np
import pytest

from climate_data_pipeline_spark.operators.audio_meta import parse_mp3_meta
from climate_data_pipeline_spark.operators.mp3 import (
    _CA,
    _CS,
    _alias_reduce,
    Mp3Unsupported,
    decode_mp3,
    encode_mp3_count1,
)


def test_silence_decodes_to_exact_zero():
    blob = encode_mp3_count1([], n_frames=3)
    s, info = decode_mp3(blob)
    assert s.shape == (6 * 18, 32, 1)
    assert not s.any()
    assert info == {"sample_rate": 44100, "channels": 1,
                    "n_frames": 3, "n_granules": 6}
    # the stream is frame-walkable by the independent metadata parser
    meta = parse_mp3_meta(blob)
    assert meta["n_frames"] == 3 and meta["sample_rate"] == 44100


def test_impulse_matches_independent_imdct_rederivation():
    """Line 0 (+1) at global_gain 210: requant gives spectral value
    exactly 1.0 in subband 0, so granule 0's subband-0 output must be
    the first IMDCT column times the sine window — rebuilt here from
    the ISO formulas independently of the module's tables."""
    s, _ = decode_mp3(encode_mp3_count1([(0, 1)], n_frames=1))
    i = np.arange(36)
    z = np.cos(np.pi / 72.0 * (2 * i + 1 + 18) * 1.0) \
        * np.sin(np.pi / 36.0 * (i + 0.5))
    # atol 1e-13: the module's tables are deterministic pure-IEEE trig
    # (r11, `_sinpi`/`_cospi`) while this re-derivation uses libm — the
    # two agree to ~1 ulp of the pre-cos argument, not bit-exactly
    np.testing.assert_allclose(s[:18, 0, 0], z[:18], rtol=0, atol=1e-13)
    # granule 1 overlap-adds granule 0's tail onto its own first half
    np.testing.assert_allclose(s[18:36, 0, 0], z[18:] + z[:18],
                               rtol=0, atol=1e-13)
    # nothing leaks into other subbands for a line-0 impulse
    assert not s[:, 1:, :].any()


def test_subband1_impulse_pins_frequency_inversion():
    """Line 26 → subband 1, k = 8 — far enough from the 18-line
    boundary that the alias butterflies leave it untouched, so the
    decoded subband-1 output must equal the independent IMDCT+window
    re-derivation WITH odd time samples negated (frequency inversion
    applies to odd subbands). A missing or mis-indexed inversion
    flips half the samples."""
    s, _ = decode_mp3(encode_mp3_count1([(26, 1)], n_frames=1))
    i = np.arange(36)
    z = np.cos(np.pi / 72.0 * (2 * i + 1 + 18) * (2 * 8 + 1)) \
        * np.sin(np.pi / 36.0 * (i + 0.5))
    want0, want1 = z[:18].copy(), (z[18:] + z[:18]).copy()
    want0[1::2] *= -1
    want1[1::2] *= -1
    # atol as in the rederivation test above: libm vs the module's
    # deterministic trig differ at the ulp level by design (r11)
    np.testing.assert_allclose(s[:18, 1, 0], want0, rtol=0, atol=1e-13)
    np.testing.assert_allclose(s[18:36, 1, 0], want1, rtol=0, atol=1e-13)
    assert not s[:, 0, 0].any() and not s[:, 2:, :].any()


def test_gain_scaling_is_bitwise_power_of_two():
    for kw in (dict(lines=[(0, 1)]),
               dict(lines=[(17, 1), (18, -1)]),
               dict(lines=[(4, 1)], ms_stereo=True),
               dict(lines=[(5, 1)], block_type=2),
               dict(lines=[(9, -1)], sample_rate=32000)):
        base, _ = decode_mp3(encode_mp3_count1(
            n_frames=2, global_gain=210, **kw))
        for k in (1, 3, 7):
            s, _ = decode_mp3(encode_mp3_count1(
                n_frames=2, global_gain=210 + 4 * k, **kw))
            np.testing.assert_array_equal(s, base * float(2 ** k))


def test_ms_stereo_halves_into_both_channels():
    sm, info = decode_mp3(encode_mp3_count1([(4, 1)], n_frames=2,
                                            ms_stereo=True))
    mono, _ = decode_mp3(encode_mp3_count1([(4, 1)], n_frames=2))
    assert info["channels"] == 2
    np.testing.assert_array_equal(sm[:, :, 0], sm[:, :, 1])
    np.testing.assert_allclose(sm[:, :, 0],
                               mono[:, :, 0] / np.sqrt(2.0),
                               rtol=1e-15, atol=1e-18)


def test_short_block_energy_lands_in_mapped_subband():
    # huffman line 5 → short sfb 0 (width 4), window 1, index 1 →
    # frequency 1 → subband 0; all energy must stay in subband 0 and
    # the 12-point windows place it inside the granule's middle
    s, _ = decode_mp3(encode_mp3_count1([(5, 1)], n_frames=1,
                                        block_type=2))
    assert s[:, 0, 0].any()
    assert not s[:, 1:, :].any()
    # line 30 → sfb 2 (lines 24..35, width 4), window 1, index 2 →
    # frequency f = 8 + 2 = 10 → subband 1
    s2, _ = decode_mp3(encode_mp3_count1([(30, 1)], n_frames=1,
                                         block_type=2))
    assert s2[:, 1, 0].any()
    assert not s2[:, 0, 0].any() and not s2[:, 2:, :].any()


def test_alias_butterflies_rotate_energy_across_boundary():
    xr = np.zeros(576)
    xr[17] = 1.0
    before = float((xr ** 2).sum())
    _alias_reduce(xr)
    # rotation: cs^2 + ca^2 = 1 preserves pairwise energy exactly-ish
    assert abs(float((xr ** 2).sum()) - before) < 1e-12
    assert xr[18] != 0.0                       # leaked across boundary
    np.testing.assert_allclose(_CS ** 2 + _CA ** 2, np.ones(8),
                               rtol=1e-15)
    # a line far from every 18k boundary is untouched
    xr2 = np.zeros(576)
    xr2[9] = 1.0
    _alias_reduce(xr2)
    assert xr2[9] == 1.0 and (xr2 != 0).sum() == 1


def test_streaming_prefix_property():
    one, _ = decode_mp3(encode_mp3_count1([(0, 1), (7, -1)], n_frames=1))
    three, _ = decode_mp3(encode_mp3_count1([(0, 1), (7, -1)],
                                            n_frames=3))
    np.testing.assert_array_equal(three[:36], one)


def test_scalefactor_and_scfsi_bit_accounting():
    """Nonzero scalefac_compress (zero VALUES) and granule-1 scfsi
    sharing shift every main-data bit offset; a reader slip would
    misalign the count1 payload and change the output."""
    a, _ = decode_mp3(encode_mp3_count1([(3, 1), (12, -1)], n_frames=2))
    b, _ = decode_mp3(encode_mp3_count1([(3, 1), (12, -1)], n_frames=2,
                                        scalefac_compress=13))
    c, _ = decode_mp3(encode_mp3_count1([(3, 1), (12, -1)], n_frames=2,
                                        scalefac_compress=13,
                                        scfsi_band0=True))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_loud_seams_raise_by_name():
    import struct

    blob = bytearray(encode_mp3_count1([(0, 1)], n_frames=1))
    # big-values table != 0: set big_values=1 and table_select[0]=1.
    # side info starts at byte 4; granule fields begin after
    # main_data_begin(9)+private(5)+scfsi(4) = 18 bits; big_values is
    # bits 30..38, table_select[0] bits 52..56 of the side info
    si = int.from_bytes(blob[4:21], "big")

    def setbits(v, start, width, val):
        shift = 17 * 8 - start - width
        mask = ((1 << width) - 1) << shift
        return (v & ~mask) | (val << shift)

    si2 = setbits(si, 18 + 12, 9, 1)          # big_values = 1
    si2 = setbits(si2, 18 + 12 + 9 + 8 + 4 + 1, 5, 1)  # table 1
    bad = bytearray(blob)
    bad[4:21] = si2.to_bytes(17, "big")
    with pytest.raises(Mp3Unsupported, match="Huffman table 1"):
        decode_mp3(bytes(bad))
    # count1 table A
    si3 = setbits(si, 18 + 58, 1, 0)          # count1table_select = 0
    bad = bytearray(blob)
    bad[4:21] = si3.to_bytes(17, "big")
    with pytest.raises(Mp3Unsupported, match="table A"):
        decode_mp3(bytes(bad))
    # intensity stereo with SHORT blocks (the remaining intensity
    # seam — long-block intensity is real, see the dedicated tests)
    st = bytearray(encode_mp3_count1([(5, 1)], n_frames=1,
                                     block_type=2, ms_stereo=True))
    h = struct.unpack_from(">I", st, 0)[0] | (1 << 4)
    struct.pack_into(">I", st, 0, h)
    with pytest.raises(Mp3Unsupported, match="intensity stereo with"):
        decode_mp3(bytes(st))
    # MPEG-2 (LSF)
    v2 = bytearray(blob)
    h = struct.unpack_from(">I", v2, 0)[0] & ~(1 << 19)
    struct.pack_into(">I", v2, 0, h)
    with pytest.raises(Mp3Unsupported, match="LSF"):
        decode_mp3(bytes(v2))
    # bit-reservoir underflow: main_data_begin > buffered bytes
    si4 = setbits(si, 0, 9, 5)
    bad = bytearray(blob)
    bad[4:21] = si4.to_bytes(17, "big")
    with pytest.raises(ValueError, match="reservoir underflow"):
        decode_mp3(bytes(bad))


def test_count1_sign_convention_and_dense_quads():
    # alternating ±1 on lines 0..15: sign bit 1 = negative
    lines = [(i, 1 if i % 2 == 0 else -1) for i in range(16)]
    s, _ = decode_mp3(encode_mp3_count1(lines, n_frames=1))
    neg, _ = decode_mp3(encode_mp3_count1(
        [(i, -v) for i, v in lines], n_frames=1))
    np.testing.assert_array_equal(neg, -s)


def test_protected_frames_verify_crc():
    """protection_bit 0: the frame CRC (CRC-16/CMS over the last two
    header bytes + side info) is verified — a protected stream
    decodes identically to its unprotected twin, and a corrupted
    side-info byte is caught loudly instead of desynchronizing the
    bit reservoir."""
    a, _ = decode_mp3(encode_mp3_count1([(0, 1), (9, -1)], n_frames=2))
    b, _ = decode_mp3(encode_mp3_count1([(0, 1), (9, -1)], n_frames=2,
                                        protected=True))
    np.testing.assert_array_equal(a, b)
    bad = bytearray(encode_mp3_count1([(0, 1)], n_frames=1,
                                      protected=True))
    bad[8] ^= 0x40
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_mp3(bytes(bad))


def test_hypothesis_fuzz_encode_decode_chain():
    """Property fuzz over the encoder's whole parameter space: any
    legal count1 line set, gain, rate, block type and stereo flag must
    decode without error to the right shape, obey the streaming prefix
    property, and (for gain steps of 4) stay bitwise linear."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        lines=st.lists(
            st.tuples(st.integers(0, 199),
                      st.sampled_from([1, -1])),
            max_size=12, unique_by=lambda t: t[0]),
        gain=st.integers(190, 242),
        rate=st.sampled_from([44100, 48000, 32000]),
        bt=st.sampled_from([0, 2]),
        ms=st.booleans(),
    )
    def prop(lines, gain, rate, bt, ms):
        blob = encode_mp3_count1(lines, n_frames=2, sample_rate=rate,
                                 global_gain=gain, block_type=bt,
                                 ms_stereo=ms)
        s, info = decode_mp3(blob)
        nch = 2 if ms else 1
        assert s.shape == (72, 32, nch)
        assert info["sample_rate"] == rate
        assert np.isfinite(s).all()
        if not lines:
            assert not s.any()
        one, _ = decode_mp3(encode_mp3_count1(
            lines, n_frames=1, sample_rate=rate, global_gain=gain,
            block_type=bt, ms_stereo=ms))
        np.testing.assert_array_equal(s[:36], one)
        up, _ = decode_mp3(encode_mp3_count1(
            lines, n_frames=2, sample_rate=rate, global_gain=gain + 4,
            block_type=bt, ms_stereo=ms))
        np.testing.assert_array_equal(up, s * 2.0)

    prop()


def test_part23_overrun_is_loud():
    """A side info whose part2_3_length reaches past the buffered main
    data must raise a clear ValueError, not an IndexError out of the
    bit reader."""
    blob = bytearray(encode_mp3_count1([(0, 1)], n_frames=1))
    si = int.from_bytes(blob[4:21], "big")
    shift = 17 * 8 - 18 - 12
    si = (si & ~(0xFFF << shift)) | (4000 << shift)   # part23 = 4000
    blob[4:21] = si.to_bytes(17, "big")
    with pytest.raises(ValueError, match="overruns the bit reservoir"):
        decode_mp3(bytes(blob))


def test_intensity_stereo_long_blocks():
    """MPEG-1 intensity stereo (round 10): ratio = tan(is_pos·π/12),
    L = x·ratio/(1+ratio), R = x/(1+ratio) in the bands above the
    right channel's last nonzero line; is_pos 7 is the no-processing
    escape; the bound comes from the right channel's own spectrum.
    Each property checked against the mono twin."""
    mono, _ = decode_mp3(encode_mp3_count1([(0, 1)], n_frames=1))
    m = mono[:, :, 0]
    # is_pos 0: everything pans hard right
    s0, info = decode_mp3(encode_mp3_count1(
        [(0, 1)], n_frames=1, intensity=[0] * 21))
    assert info["channels"] == 2
    assert not s0[:, :, 0].any()
    np.testing.assert_array_equal(s0[:, :, 1], m)
    # is_pos 3: ratio = tan(π/4) (1 to within an ulp) → equal halves
    s3, _ = decode_mp3(encode_mp3_count1(
        [(0, 1)], n_frames=1, intensity=[3] * 21))
    np.testing.assert_allclose(s3[:, :, 0], m * 0.5, rtol=0,
                               atol=1e-15)
    np.testing.assert_allclose(s3[:, :, 1], m * 0.5, rtol=0,
                               atol=1e-15)
    # is_pos 7: escape — left passes through, right stays silent
    s7, _ = decode_mp3(encode_mp3_count1(
        [(0, 1)], n_frames=1, intensity=[7] * 21))
    np.testing.assert_array_equal(s7[:, :, 0], m)
    assert not s7[:, :, 1].any()
    # general is_pos: both channels scale by the exact formula factors
    for pos in (1, 2, 4, 5, 6):
        sp, _ = decode_mp3(encode_mp3_count1(
            [(0, 1)], n_frames=1, intensity=[pos] * 21))
        r = np.tan(pos * np.pi / 12.0)
        # the decoder scales SPECTRAL values then IMDCTs; scaling the
        # IMDCT output instead agrees to within accumulation ulps
        np.testing.assert_allclose(sp[:, :, 0], m * (r / (1.0 + r)),
                                   rtol=0, atol=1e-15)
        np.testing.assert_allclose(sp[:, :, 1], m * (1.0 / (1.0 + r)),
                                   rtol=0, atol=1e-15)


def test_intensity_bound_from_right_channel_spectrum():
    """right_lines=[(3, +1)] puts the right channel's last nonzero
    line at 3 → the intensity region starts at the next band boundary
    (line 4): band 0 stays plain stereo (left keeps its line-0
    content, right keeps its own line-3 content) while line 6 in
    band 1 pans right under is_pos 0. MS composes below the bound."""
    sb, _ = decode_mp3(encode_mp3_count1(
        [(0, 1), (6, 1)], n_frames=1, intensity=[0] * 21,
        right_lines=[(3, 1)]))
    only0, _ = decode_mp3(encode_mp3_count1([(0, 1)], n_frames=1))
    only3, _ = decode_mp3(encode_mp3_count1([(3, 1)], n_frames=1))
    only6, _ = decode_mp3(encode_mp3_count1([(6, 1)], n_frames=1))
    np.testing.assert_array_equal(sb[:, :, 0], only0[:, :, 0])
    np.testing.assert_allclose(sb[:, :, 1],
                               only3[:, :, 0] + only6[:, :, 0],
                               rtol=0, atol=1e-15)
    # MS+IS: below the bound the mid/side rotation applies
    sm, _ = decode_mp3(encode_mp3_count1(
        [(0, 1), (6, 1)], n_frames=1, intensity=[0] * 21,
        right_lines=[(3, 1)], ms_stereo=True))
    inv = 1.0 / np.sqrt(2.0)
    np.testing.assert_allclose(
        sm[:, :, 0], (only0[:, :, 0] + only3[:, :, 0]) * inv,
        rtol=0, atol=1e-15)
    np.testing.assert_allclose(
        sm[:, :, 1],
        (only0[:, :, 0] - only3[:, :, 0]) * inv + only6[:, :, 0],
        rtol=0, atol=1e-15)
