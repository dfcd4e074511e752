"""safetensors / .npy embedding-matrix sources — pure numpy + struct,
built from the PUBLIC format specs (the safetensors file format is
documented in the huggingface/safetensors README; .npy is numpy's NEP-1
format). No safetensors/torch dependency.

Why here: embedding pipelines exchange vectors as safetensors (the LLM
ecosystem's tensor container) or raw .npy matrices at least as often as
parquet. The readers below turn a 2-D float tensor into the engine's
``(vec_id BIGINT, embedding ARRAY<FLOAT>)`` long shape — the schema of
the `embeddings` testdata table — so every ANN / semantic-dedup operator
runs unchanged on them.

Scale shape: the DRIVER reads only the fixed-size header (8-byte length
prefix + JSON for safetensors; the NEP-1 dict for .npy); row ranges are
then byte arithmetic, and each Spark task seeks and reads ITS OWN row
slice of the file — the chunk-per-task discipline of
`hdf5.read_hdf5_long_distributed` (a multi-GB matrix never materializes
on the driver).

safetensors layout (spec): u64-LE header length N, then N bytes of JSON
mapping tensor name → {"dtype", "shape", "data_offsets": [begin, end]}
(offsets relative to the end of the header, bytes row-major), plus an
optional "__metadata__" string map. BF16 has no numpy dtype and is
decoded by bit-shifting the u16 payload into the high half of a u32
float32 view — exact (BF16 is float32's top 16 bits by definition).
"""

from __future__ import annotations

import ast
import json
import struct

import numpy as np

_ST_DTYPES = {
    "F64": np.dtype("<f8"), "F32": np.dtype("<f4"), "F16": np.dtype("<f2"),
    "I64": np.dtype("<i8"), "I32": np.dtype("<i4"), "I16": np.dtype("<i2"),
    "I8": np.dtype("i1"), "BOOL": np.dtype("?"),
    "U64": np.dtype("<u8"), "U32": np.dtype("<u4"), "U16": np.dtype("<u2"),
    "U8": np.dtype("u1"),
    # BF16: stored as raw u16, decoded specially
    "BF16": np.dtype("<u2"),
}
_ST_NAMES = {np.dtype("<f8"): "F64", np.dtype("<f4"): "F32",
             np.dtype("<f2"): "F16", np.dtype("<i8"): "I64",
             np.dtype("<i4"): "I32", np.dtype("<i2"): "I16",
             np.dtype("i1"): "I8", np.dtype("u1"): "U8",
             np.dtype("<u8"): "U64", np.dtype("<u4"): "U32",
             np.dtype("<u2"): "U16",
             np.dtype("?"): "BOOL"}


def _bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    """Exact BF16 → float32: BF16 is the top 16 bits of an IEEE f32."""
    return (raw.astype(np.uint32) << 16).view(np.float32)


# ------------------------------ writer --------------------------------------

def write_safetensors(path: str, tensors: dict[str, np.ndarray],
                      metadata: dict[str, str] | None = None,
                      bf16: tuple[str, ...] = ()) -> None:
    """Serialize named arrays per the public spec (row-major, offsets
    relative to header end, names in insertion order). ``bf16`` lists
    tensors to store as BF16 (truncating round — the storage-efficient
    embedding dtype); they must be float32 inputs."""
    entries: dict[str, dict] = {}
    blobs: list[bytes] = []
    off = 0
    for name, arr in tensors.items():
        if name in bf16:
            a = np.ascontiguousarray(arr, dtype="<f4")
            raw = (a.view(np.uint32) >> 16).astype("<u2").tobytes()
            dtype_name = "BF16"
        else:
            a = np.ascontiguousarray(arr)
            if a.dtype.byteorder == ">":
                a = a.astype(a.dtype.newbyteorder("<"))
            if a.dtype not in _ST_NAMES:
                raise ValueError(f"unsupported dtype {a.dtype} for {name}")
            raw = a.tobytes()
            dtype_name = _ST_NAMES[a.dtype]
        entries[name] = {"dtype": dtype_name,
                         "shape": list(a.shape),
                         "data_offsets": [off, off + len(raw)]}
        blobs.append(raw)
        off += len(raw)
    header: dict = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v)
                                  for k, v in metadata.items()}
    header.update(entries)
    hj = json.dumps(header, separators=(",", ":")).encode()
    hj += b" " * (-len(hj) % 8)          # spec allows space padding
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(hj)))
        fh.write(hj)
        for b in blobs:
            fh.write(b)


# ------------------------------ readers -------------------------------------

def read_safetensors_header(path: str) -> tuple[dict, int]:
    """→ (header dict without __metadata__, data-section file offset).
    Reads ONLY the header bytes — driver-safe for any file size."""
    with open(path, "rb") as fh:
        (hlen,) = struct.unpack("<Q", fh.read(8))
        header = json.loads(fh.read(hlen))
    header.pop("__metadata__", None)
    return header, 8 + hlen


def read_safetensors(path: str) -> dict[str, np.ndarray]:
    """Materialize every tensor (driver-side; fixtures/small files)."""
    header, base = read_safetensors_header(path)
    out = {}
    with open(path, "rb") as fh:
        for name, ent in header.items():
            b0, b1 = ent["data_offsets"]
            fh.seek(base + b0)
            raw = np.frombuffer(fh.read(b1 - b0), dtype=_st_dtype(ent))
            arr = _bf16_to_f32(raw) if ent["dtype"] == "BF16" else raw
            out[name] = arr.reshape(ent["shape"])
    return out


def _st_dtype(ent: dict) -> np.dtype:
    d = ent["dtype"]
    if d not in _ST_DTYPES:
        raise NotImplementedError(f"safetensors dtype {d!r} not supported")
    return _ST_DTYPES[d]


def _embedding_batches(path: str, base: int, ent: dict, id_base: int,
                       spans):
    """Executor-side: yield (vec_id, embedding float32) Arrow batches
    for this task's row spans — one bounded seek+read per span."""
    import pandas as pd

    n_rows, dim = ent["shape"]
    dt = _st_dtype(ent)
    row_bytes = dim * dt.itemsize
    with open(path, "rb") as fh:
        for r0, r1 in spans:
            fh.seek(base + ent["data_offsets"][0] + r0 * row_bytes)
            raw = np.frombuffer(fh.read((r1 - r0) * row_bytes), dtype=dt)
            mat = (_bf16_to_f32(raw) if ent["dtype"] == "BF16"
                   else raw.astype(np.float32)).reshape(r1 - r0, dim)
            yield pd.DataFrame({
                "vec_id": np.arange(id_base + r0, id_base + r1,
                                    dtype=np.int64),
                "embedding": list(mat),
            })


def _spanned_embedding_df(spark, path: str, base: int, ent: dict,
                          id_base: int, rows_per_task: int):
    """One Spark task per ``rows_per_task`` row slice of a 2-D matrix;
    each task seeks/reads only its own byte range (shared by the
    safetensors and .npy readers)."""
    n_rows = ent["shape"][0]
    spans = [(r, min(r + rows_per_task, n_rows))
             for r in range(0, max(n_rows, 1), rows_per_task)]

    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield from _embedding_batches(
                    path, base, ent, id_base, [(int(row.r0), int(row.r1))])

    specs = spark.createDataFrame(spans, "r0 long, r1 long") \
                 .repartition(len(spans))
    return specs.mapInPandas(
        gen, "vec_id long, embedding array<float>")


def read_safetensors_embeddings(spark, path: str, tensor: str = "embedding",
                                id_base: int = 0,
                                rows_per_task: int = 65536):
    """A 2-D float tensor → DataFrame(vec_id BIGINT, embedding
    ARRAY<FLOAT>), one task per ``rows_per_task`` row slice (each task
    seeks/reads only its own bytes). F16/BF16 upcast to float32
    exactly; vec_id = id_base + row index."""
    header, base = read_safetensors_header(path)
    if tensor not in header:
        raise ValueError(f"tensor {tensor!r} not in {sorted(header)}")
    ent = header[tensor]
    if len(ent["shape"]) != 2:
        raise ValueError(f"tensor {tensor!r} is not 2-D: {ent['shape']}")
    _st_dtype(ent)                        # loud on unsupported dtypes
    return _spanned_embedding_df(spark, path, base, ent, id_base,
                                 rows_per_task)


# ------------------------------ .npy ----------------------------------------

def read_npy_header(path: str) -> tuple[dict, int]:
    """Parse the NEP-1 header: magic, version, header length, then a
    Python dict literal {'descr','fortran_order','shape'}. → (info,
    data offset)."""
    with open(path, "rb") as fh:
        magic = fh.read(6)
        if magic != b"\x93NUMPY":
            raise ValueError("not a .npy file (bad magic)")
        major, _minor = fh.read(1)[0], fh.read(1)[0]
        if major == 1:
            (hlen,) = struct.unpack("<H", fh.read(2))
            base = 10 + hlen
        else:
            (hlen,) = struct.unpack("<I", fh.read(4))
            base = 12 + hlen
        info = ast.literal_eval(fh.read(hlen).decode("latin1").strip())
    if info.get("fortran_order"):
        raise NotImplementedError("fortran-order .npy not supported")
    return info, base


def read_npy_embeddings(spark, path: str, id_base: int = 0,
                        rows_per_task: int = 65536):
    """A 2-D .npy float matrix → (vec_id, embedding) rows with the same
    chunk-per-task byte-range reads as the safetensors path."""
    info, base = read_npy_header(path)
    shape = info["shape"]
    if len(shape) != 2:
        raise ValueError(f".npy is not 2-D: {shape}")
    dt = np.dtype(info["descr"])
    if dt.kind not in ("f", "i", "u"):
        raise NotImplementedError(f".npy dtype {dt} not supported")
    if dt.byteorder == ">":
        raise NotImplementedError("big-endian .npy not supported")
    # reuse the safetensors slicer by describing the matrix the same way;
    # the sign-aware name keeps unsigned values exact (u2 60000 stays 60000)
    name = {"f": {2: "F16", 4: "F32", 8: "F64"},
            "i": {1: "I8", 2: "I16", 4: "I32", 8: "I64"},
            "u": {1: "U8", 2: "U16", 4: "U32", 8: "U64"}}[dt.kind].get(
        dt.itemsize)
    if name is None:
        raise NotImplementedError(f".npy dtype {dt} not supported")
    ent = {"dtype": name, "shape": list(shape), "data_offsets": [0, 0]}
    return _spanned_embedding_df(spark, path, base, ent, id_base,
                                 rows_per_task)
