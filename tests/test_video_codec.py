"""MJPEG-in-AVI video path (operators/video.py): RIFF container
round trips, idx1 validation, loud non-MJPEG seams, and the
row-multiplying Spark frame-sample/decode plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.operators.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)
from climate_data_pipeline_spark.operators.video import (
    build_avi_mjpeg,
    parse_avi_mjpeg,
)


def _frames(n=4, seed=0):
    rng = np.random.default_rng(seed)
    q = np.ones((8, 8), np.int64)
    q[0, 0] = 8
    out = []
    for _ in range(n):
        vals = rng.integers(0, 256, 4, dtype=np.int64)
        px = np.repeat(np.repeat(vals.reshape(2, 2), 8, 0), 8, 1)
        out.append(encode_jpeg_baseline(px.astype(np.uint8),
                                        quant_tables=(q, q)))
    return out


def test_container_roundtrip_bytes_exact():
    frames = _frames(5)
    for with_index in (True, False):
        avi = build_avi_mjpeg(frames, 16, 16, fps=12,
                              with_index=with_index)
        meta = parse_avi_mjpeg(avi)
        assert (meta["width"], meta["height"], meta["fps"]) == (16, 16, 12)
        assert meta["frames"] == frames      # byte-exact through movi
        # every recovered frame still decodes
        for f in meta["frames"]:
            assert decode_jpeg_baseline(f).shape == (16, 16)


def test_odd_sized_frames_pad_to_word_boundary():
    """RIFF chunks are word-aligned; odd-length JPEG payloads must not
    shift the walk for subsequent frames."""
    frames = _frames(6, seed=3)
    odd = [f for f in frames if len(f) & 1]
    even = [f for f in frames if not len(f) & 1]
    assert odd and even, [len(f) for f in frames]  # both parities present
    avi = build_avi_mjpeg(frames, 16, 16)
    assert parse_avi_mjpeg(avi)["frames"] == frames


def test_idx1_mismatch_raises():
    frames = _frames(3)
    avi = bytearray(build_avi_mjpeg(frames, 16, 16, with_index=True))
    i = avi.rfind(b"idx1")
    # corrupt the first index entry's offset field
    pos = i + 8 + 8
    avi[pos] ^= 0xFF
    with pytest.raises(ValueError, match="idx1"):
        parse_avi_mjpeg(bytes(avi))


def test_non_mjpeg_and_non_video_raise_loudly():
    avi = build_avi_mjpeg(_frames(2), 16, 16)
    with pytest.raises(NotImplementedError, match="codec"):
        parse_avi_mjpeg(avi.replace(b"MJPG", b"H264", 1))
    with pytest.raises(NotImplementedError, match="stream"):
        parse_avi_mjpeg(avi.replace(b"vids", b"auds", 1))
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi_mjpeg(b"\x00" + avi)


def test_spark_frame_sampling_and_decode(spark):
    """decode_video_frames(every_n) emits exactly the sampled frames,
    decoded: frame f's mean equals the mean of its four cycled text
    bytes; skipped frames appear in no row."""
    from climate_data_pipeline_spark.operators.video import (
        decode_video_frames, synthesize_avi_mjpeg)

    rows = [(0, "a video from text"), (1, ""), (2, "ü 漢字 🙂 frames")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    media = synthesize_avi_mjpeg(df, "doc_id", "text", n_frames=6)
    out = decode_video_frames(media, every_n=2).collect()
    assert sorted({r["frame_idx"] for r in out}) == [0, 2, 4]
    assert len(out) == 3 * 3
    got = {(r["media_id"], r["frame_idx"]): r for r in out}
    for i, text in rows:
        raw = text.encode("utf-8") or b"\x00"
        bts = np.frombuffer(raw, np.uint8)
        for f in (0, 2, 4):
            vals = bts[(4 * f + np.arange(4)) % len(bts)]
            r = got[(i, f)]
            assert (r["width"], r["height"]) == (16, 16)
            assert abs(r["frame_mean"] - float(vals.mean())) < 1e-12
    # every_n=1 decodes all six
    assert decode_video_frames(media, every_n=1).count() == 18


def test_decode_media_real_dispatch_video(spark):
    from climate_data_pipeline_spark.operators.multimodal import (
        decode_media_real)
    from climate_data_pipeline_spark.operators.video import (
        synthesize_avi_mjpeg)

    df = spark.createDataFrame([(7, "dispatch me")],
                               "doc_id long, text string")
    media = synthesize_avi_mjpeg(df, "doc_id", "text", n_frames=6, fps=10)
    r = decode_media_real(media).collect()[0]
    raw = b"dispatch me"
    bts = np.frombuffer(raw, np.uint8)
    want = np.mean([bts[(4 * f + np.arange(4)) % len(bts)].mean()
                    for f in range(6)])
    assert (r["kind"], r["width"], r["height"]) == ("video", 16, 16)
    assert (r["sample_rate"], r["n_samples"]) == (10, 6)
    assert abs(r["mean_value"] - float(want)) < 1e-12


def test_streaming_media_decode_equals_batch(spark, tmp_path):
    """The streaming media decode (file-stream micro-batches through the
    same Arrow codecs) emits exactly the batch result — stateless twin,
    every container type represented."""
    from climate_data_pipeline_spark.operators.multimodal import (
        decode_media_real, synthesize_media, synthesize_png)
    from climate_data_pipeline_spark.operators.video import (
        synthesize_avi_mjpeg)
    from climate_data_pipeline_spark.streaming.rollup import (
        run_stream_to_memory, streaming_media_decode)

    docs = spark.createDataFrame(
        [(0, "an image doc"), (1, "an audio doc"), (2, "another image")],
        "doc_id long, text string")
    media = (synthesize_media(docs, "doc_id", "text")            # PGM+WAV
             .unionByName(synthesize_png(
                 docs.select((F.col("doc_id") + 10).alias("doc_id"),
                             "text"), "doc_id", "text"))          # PNG
             .unionByName(synthesize_avi_mjpeg(
                 docs.select((F.col("doc_id") + 20).alias("doc_id"),
                             "text"), "doc_id", "text")))         # AVI
    mdir = str(tmp_path / "media_stream")
    media.write.mode("overwrite").parquet(mdir)

    want = sorted(map(tuple, decode_media_real(
        spark.read.schema(
            "media_id long, media_type string, payload binary, "
            "n_bytes long").parquet(mdir)).collect()))
    run_stream_to_memory(streaming_media_decode(spark, mdir),
                         "media_decode_twin")
    got = sorted(map(tuple,
                     spark.sql("SELECT * FROM media_decode_twin")
                     .collect()))
    assert got == want and len(got) == 9


def test_idx1_absolute_offsets_accepted():
    """The other idx1 convention in the wild: offsets measured from the
    start of the FILE rather than the movi fourcc — the parser probes
    the first entry and validates against whichever base matches."""
    import struct

    frames = _frames(3)
    avi = bytearray(build_avi_mjpeg(frames, 16, 16, with_index=True))
    # the movi LIST payload start, the base the parser validates against
    movi_at = bytes(avi).index(b"movi")
    i = bytes(avi).rfind(b"idx1")
    n = struct.unpack_from("<I", avi, i + 4)[0] // 16
    for e in range(n):
        pos = i + 8 + 16 * e + 8
        (rel,) = struct.unpack_from("<I", avi, pos)
        struct.pack_into("<I", avi, pos, rel + movi_at)
    meta = parse_avi_mjpeg(bytes(avi))
    assert meta["frames"] == frames


def test_frame_dedup_report_counts(spark):
    """frame_dedup_report: byte-identical frames (within OR across
    videos) are counted without any decode; distinct counts are per
    video, duplicate counts are corpus-wide."""
    from climate_data_pipeline_spark.operators.video import (
        frame_dedup_report, video_frame_hashes)

    f = _frames(4, seed=9)
    # video 0: frames A B A B (2 distinct, all 4 duplicated in-video)
    # video 1: frames C D    (frame C repeats nowhere; D also in v2)
    # video 2: frames D A    (D shared with v1, A shared with v0)
    v0 = build_avi_mjpeg([f[0], f[1], f[0], f[1]], 16, 16)
    v1 = build_avi_mjpeg([f[2], f[3]], 16, 16)
    v2 = build_avi_mjpeg([f[3], f[0]], 16, 16)
    rows = [(0, "video/x-msvideo", bytearray(v0), len(v0)),
            (1, "video/x-msvideo", bytearray(v1), len(v1)),
            (2, "video/x-msvideo", bytearray(v2), len(v2))]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, "
              "n_bytes long")
    got = {r["media_id"]: r for r in frame_dedup_report(media).collect()}
    assert (got[0]["n_frames"], got[0]["n_distinct"],
            got[0]["n_duplicated"]) == (4, 2, 4)
    assert (got[1]["n_frames"], got[1]["n_distinct"],
            got[1]["n_duplicated"]) == (2, 2, 1)
    assert (got[2]["n_frames"], got[2]["n_distinct"],
            got[2]["n_duplicated"]) == (2, 2, 2)
    # the fingerprint pass hashes the raw frame bytes, verbatim
    import hashlib
    h = {(r["media_id"], r["frame_idx"]): r["frame_md5"]
         for r in video_frame_hashes(media).collect()}
    assert h[(0, 0)] == h[(0, 2)] == hashlib.md5(f[0]).hexdigest()
    assert h[(1, 1)] == h[(2, 0)] == hashlib.md5(f[3]).hexdigest()


def test_frame_dedup_report_covers_zero_frame_videos(spark):
    """A valid AVI with an empty movi list still gets a report row
    (all-zero counts) — the curation pass must see every video."""
    from climate_data_pipeline_spark.operators.video import (
        frame_dedup_report)

    empty = build_avi_mjpeg([], 16, 16)
    one = build_avi_mjpeg(_frames(1), 16, 16)
    media = spark.createDataFrame(
        [(0, "video/x-msvideo", bytearray(empty), len(empty)),
         (1, "video/x-msvideo", bytearray(one), len(one))],
        "media_id long, media_type string, payload binary, n_bytes long")
    got = {r["media_id"]: r for r in frame_dedup_report(media).collect()}
    assert (got[0]["n_frames"], got[0]["n_distinct"],
            got[0]["n_duplicated"]) == (0, 0, 0)
    assert got[1]["n_frames"] == 1


def test_mp4_roundtrip_and_sample_tables():
    """ISO-BMFF build/parse: byte-exact frames back through the
    stsd/stts/stsc/stsz/stco walk, including the odd-count tail chunk
    that forces a second stsc run."""
    from climate_data_pipeline_spark.operators.mp4 import (
        build_mp4_mjpeg, mp4_info, parse_mp4_mjpeg)

    for n in (1, 2, 5, 6):
        frames = _frames(n, seed=n)
        mp4 = build_mp4_mjpeg(frames, 16, 16, fps=12)
        meta = parse_mp4_mjpeg(mp4)
        assert (meta["width"], meta["height"], meta["fps"]) == (16, 16, 12)
        assert meta["frames"] == frames, n
        for f in meta["frames"]:
            assert decode_jpeg_baseline(f).shape == (16, 16)
        info = mp4_info(mp4)
        assert (info["codec"], info["n_samples"]) == ("jpeg", n)


def test_mp4_metadata_only_for_foreign_codecs():
    """A non-JPEG sample entry: mp4_info still reads codec/dims/count
    (the curation signal that needs no decoder); the frame path raises
    loudly."""
    from climate_data_pipeline_spark.operators.mp4 import (
        build_mp4_mjpeg, mp4_info, parse_mp4_mjpeg)

    avc = build_mp4_mjpeg(_frames(2), 16, 16).replace(b"jpeg", b"avc1")
    info = mp4_info(avc)
    assert (info["codec"], info["width"], info["n_samples"]) \
        == ("avc1", 16, 2)
    with pytest.raises(NotImplementedError, match="avc1"):
        parse_mp4_mjpeg(avc)


def test_mp4_truncated_and_malformed_raise_loudly():
    from climate_data_pipeline_spark.operators.mp4 import (
        build_mp4_mjpeg, parse_mp4_mjpeg)

    frames = _frames(3)
    mp4 = build_mp4_mjpeg(frames, 16, 16)
    # cut the moov off entirely
    with pytest.raises(ValueError, match="moov"):
        parse_mp4_mjpeg(mp4[:len(mp4) // 2])
    # keep moov, shrink the file so sample ranges point past the end:
    # drop bytes from inside mdat (offsets now dangle)
    import struct as st
    cut = mp4[:50] + mp4[50 + 64:]
    try:
        got = parse_mp4_mjpeg(cut)
        # if ranges still fit the shorter file the frames must differ
        assert got["frames"] != frames
    except ValueError:
        pass  # loud is also acceptable
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4_mjpeg(b"\x00\x01\x02\x03" * 8)


def test_parse_video_dispatch():
    from climate_data_pipeline_spark.operators.mp4 import build_mp4_mjpeg
    from climate_data_pipeline_spark.operators.video import parse_video

    frames = _frames(2)
    assert parse_video(build_avi_mjpeg(frames, 16, 16))["frames"] == frames
    assert parse_video(build_mp4_mjpeg(frames, 16, 16))["frames"] == frames
    with pytest.raises(NotImplementedError, match="container magic"):
        parse_video(b"\x1aE\xdf\xa3 webm-ish garbage")


def test_mixed_container_frame_ops_agree(spark):
    """The same text rows synthesized as AVI and as mixed AVI/MP4 must
    produce identical frame hashes and dedup reports — the container
    never changes the frame bytes."""
    from climate_data_pipeline_spark.operators.video import (
        frame_dedup_report, synthesize_avi_mjpeg, video_frame_hashes)

    rows = [(i, f"mixed container video {i} " * (i + 1)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    avi = synthesize_avi_mjpeg(df, "doc_id", "text", n_frames=4)
    mixed = synthesize_avi_mjpeg(df, "doc_id", "text", n_frames=4,
                                 container="mixed")
    cols = ["media_id", "frame_idx", "frame_md5", "frame_bytes"]
    a = sorted(map(tuple, video_frame_hashes(avi).select(cols).collect()))
    m = sorted(map(tuple, video_frame_hashes(mixed).select(cols).collect()))
    assert a == m
    ra = sorted(map(tuple, frame_dedup_report(avi).collect()))
    rm = sorted(map(tuple, frame_dedup_report(mixed).collect()))
    assert ra == rm
    # the mixed set really contains both container types
    types = {r["media_type"] for r in mixed.select("media_type").collect()}
    assert types == {"video/x-msvideo", "video/mp4"}


def test_fused_frame_hashes_equal_unfused_chain(spark):
    """synthesize_frame_hashes (one mapInPandas, no payload Arrow
    round trip) must emit exactly the rows of the generic
    synthesize_avi_mjpeg → video_frame_hashes chain — same md5 over
    the same encoded frame bytes — and the report built from it must
    match row-for-row."""
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.operators import video as VID

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the quick brown fox", "the quick brown fox",
             "jumps over the lazy dog", "", "aaaabbbbcccc",
             "the quick brown fox jumps"])],
        "doc_id long, text string")
    unfused = (VID.video_frame_hashes(
        VID.synthesize_avi_mjpeg(docs, "doc_id", "text", n_frames=6))
        .select("media_id", "frame_md5"))
    fused = VID.synthesize_frame_hashes(docs, "doc_id", "text",
                                        n_frames=6)
    a = sorted(map(tuple, unfused.collect()))
    b = sorted(map(tuple, fused.collect()))
    assert a == b
    ids = docs.select(F.col("doc_id").alias("media_id"))
    ra = sorted(map(tuple, VID.frame_dedup_report(
        VID.synthesize_avi_mjpeg(docs, "doc_id", "text", n_frames=6),
        ids=ids).collect()))
    rb = sorted(map(tuple, VID.frame_dedup_report(
        None, ids=ids, hashes=fused).collect()))
    assert ra == rb
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ids="):
        VID.frame_dedup_report(None, hashes=fused).collect()


def test_frame_decode_memo_matches_direct_decode(spark):
    """r12: decode_video_frames' content-addressed frame memo must
    produce exactly the per-frame direct-decode stats — repeated frames
    (duplicate texts, overlapping 4-gram windows) included."""
    import numpy as np

    from climate_data_pipeline_spark.operators import video as VID
    from climate_data_pipeline_spark.operators.video import (decode_jpeg,
                                                             parse_video)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["dup dup dup", "dup dup dup", "zzz", "",
             "abcdefghijklmnop" * 3])],
        "doc_id long, text string")
    media = VID.synthesize_avi_mjpeg(docs, "doc_id", "text", n_frames=6)
    got = sorted(map(tuple, VID.decode_video_frames(media, every_n=2)
                     .collect()))
    want = []
    for r in media.collect():
        meta = parse_video(bytes(r["payload"]))
        for idx in range(0, len(meta["frames"]), 2):
            px = decode_jpeg(meta["frames"][idx])
            want.append((r["media_id"], idx, px.shape[1], px.shape[0],
                         float(px.astype(np.float64).mean())))
    assert got == sorted(want)
