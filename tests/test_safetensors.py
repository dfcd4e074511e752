"""safetensors / .npy embedding sources: spec-golden bytes, BF16 exactness,
distributed chunk-per-task reads, and ANN-operator integration."""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from climate_data_pipeline_spark.sources import safetensors as st


def _golden_safetensors(path: str) -> np.ndarray:
    """Hand-assemble a file byte-for-byte per the PUBLIC spec —
    independent of write_safetensors — so the reader is checked against
    the wire format, not our own writer."""
    emb = np.arange(12, dtype="<f4").reshape(3, 4) * 0.5
    ids = np.array([10, 11, 12], dtype="<i8")
    header = {
        "__metadata__": {"source": "golden"},
        "embedding": {"dtype": "F32", "shape": [3, 4],
                      "data_offsets": [0, emb.nbytes]},
        "ids": {"dtype": "I64", "shape": [3],
                "data_offsets": [emb.nbytes, emb.nbytes + ids.nbytes]},
    }
    hj = json.dumps(header).encode()
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(hj)))
        fh.write(hj)
        fh.write(emb.tobytes())
        fh.write(ids.tobytes())
    return emb


def test_reader_parses_spec_golden_bytes(tmp_path):
    p = str(tmp_path / "g.safetensors")
    emb = _golden_safetensors(p)
    out = st.read_safetensors(p)
    np.testing.assert_array_equal(out["embedding"], emb)
    np.testing.assert_array_equal(out["ids"], [10, 11, 12])
    header, base = st.read_safetensors_header(p)
    assert "__metadata__" not in header and base == 8 + (
        len(json.dumps({"__metadata__": {"source": "golden"},
                        **header}).encode()))


def test_write_read_round_trip_all_dtypes(tmp_path):
    p = str(tmp_path / "rt.safetensors")
    tensors = {
        "f32": np.arange(6, dtype="<f4").reshape(2, 3),
        "f64": np.arange(6, dtype="<f8").reshape(3, 2),
        "f16": np.arange(4, dtype="<f2"),
        "i32": np.arange(5, dtype="<i4"),
        "u8": np.arange(7, dtype="u1"),
        "flags": np.array([True, False, True]),
    }
    st.write_safetensors(p, tensors, metadata={"k": "v"})
    out = st.read_safetensors(p)
    for k, v in tensors.items():
        np.testing.assert_array_equal(out[k], v)


def test_bf16_round_trip_is_truncating_and_decode_exact(tmp_path):
    p = str(tmp_path / "bf.safetensors")
    a = np.array([[1.0, -2.5, 3.14159, 1e-8]], dtype="<f4")
    st.write_safetensors(p, {"e": a}, bf16=("e",))
    out = st.read_safetensors(p)["e"]
    # decode must equal the manual truncation of the f32 bits
    want = ((a.view(np.uint32) >> 16) << 16).view(np.float32)
    np.testing.assert_array_equal(out, want)
    # and exactly representable values survive unchanged
    assert out[0, 0] == 1.0 and out[0, 1] == -2.5


def test_distributed_read_equals_driver_side(spark, tmp_path):
    rng = np.random.default_rng(5)
    emb = rng.normal(size=(1000, 16)).astype("<f4")
    p = str(tmp_path / "emb.safetensors")
    st.write_safetensors(p, {"embedding": emb})
    df = st.read_safetensors_embeddings(spark, p, rows_per_task=128)
    assert df.rdd.getNumPartitions() == 8        # ceil(1000/128) tasks
    rows = df.collect()
    assert len(rows) == 1000
    got = {r["vec_id"]: np.array(r["embedding"], dtype=np.float32)
           for r in rows}
    for i in (0, 127, 128, 999):
        np.testing.assert_array_equal(got[i], emb[i])
    # BF16 variant upcasts exactly
    pb = str(tmp_path / "emb_bf.safetensors")
    st.write_safetensors(pb, {"embedding": emb}, bf16=("embedding",))
    got_b = {r["vec_id"]: np.array(r["embedding"], dtype=np.float32)
             for r in st.read_safetensors_embeddings(
                 spark, pb, rows_per_task=300).collect()}
    want = ((emb.view(np.uint32) >> 16) << 16).view(np.float32)
    np.testing.assert_array_equal(got_b[999], want[999])


def test_npy_distributed_read(spark, tmp_path):
    emb = (np.arange(60, dtype="<f8") / 7.0).reshape(20, 3)
    p = str(tmp_path / "emb.npy")
    np.save(p, emb)                       # real numpy writer = the spec
    info, base = st.read_npy_header(p)
    assert info["shape"] == (20, 3)
    rows = st.read_npy_embeddings(spark, p, rows_per_task=7).collect()
    assert len(rows) == 20
    got = {r["vec_id"]: r["embedding"] for r in rows}
    np.testing.assert_allclose(got[13], emb[13].astype(np.float32))
    # loud error on non-npy bytes
    bad = str(tmp_path / "bad.npy")
    open(bad, "wb").write(b"notnumpyatall")
    with pytest.raises(ValueError, match="magic"):
        st.read_npy_header(bad)


def test_npy_unsigned_dtypes_decode_exact(spark, tmp_path):
    """Regression: unsigned .npy values above the signed range must
    NOT be reinterpreted as negative (u2 60000 stays 60000.0)."""
    for dt, vals in (("u1", [255, 128, 1]),
                     ("<u2", [60000, 1, 40000]),
                     ("<u4", [2**31 + 5, 2, 7])):
        p = str(tmp_path / f"emb_{np.dtype(dt).name}.npy")
        np.save(p, np.array([vals], dtype=dt))
        got = {r["vec_id"]: r["embedding"] for r in
               st.read_npy_embeddings(spark, p).collect()}
        np.testing.assert_array_equal(
            np.array(got[0]), np.array(vals, dtype="f8").astype("f4"))


def test_unsigned_safetensors_round_trip(tmp_path):
    """U16/U32/U64 are official safetensors dtypes — write+read must
    preserve full-range unsigned values."""
    p = str(tmp_path / "u.safetensors")
    tensors = {"u16": np.array([0, 60000, 65535], dtype="<u2"),
               "u32": np.array([2**31 + 1, 3], dtype="<u4"),
               "u64": np.array([2**63 + 9], dtype="<u8")}
    st.write_safetensors(p, tensors)
    out = st.read_safetensors(p)
    for k, v in tensors.items():
        np.testing.assert_array_equal(out[k], v)
        assert out[k].dtype == v.dtype


def test_ann_operators_run_on_safetensors_source(spark, tmp_path):
    """Integration: vectors loaded from safetensors drive the same ANN
    operator as the parquet embeddings table, with identical results
    for identical values."""
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.operators import similarity as SIM
    from climate_data_pipeline_spark.sources.io import load_table

    emb_df = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    pdf = emb_df.orderBy("vec_id").toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype="<f4")
    p = str(tmp_path / "corpus.safetensors")
    st.write_safetensors(p, {"embedding": mat})
    loaded = st.read_safetensors_embeddings(spark, p, rows_per_task=64)

    def topk(src):
        q = (src.where(F.col("vec_id") < 3)
                .select(F.col("vec_id").alias("q_id"),
                        F.col("embedding").alias("q_vec")))
        return {(r["q_id"], r["vec_id"], r["rank"], r["cosine"])
                for r in SIM.cosine_topk(q, src, k=3).collect()}

    assert topk(loaded) == topk(emb_df.select("vec_id", "embedding"))
