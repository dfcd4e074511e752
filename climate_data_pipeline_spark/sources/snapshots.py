"""Versioned parquet tables: snapshot isolation + time travel without a
table format dependency (the Delta-less counterpart of
`operators/merge.py`'s Delta-less MERGE).

Design = the manifest core of every table format (Delta/Iceberg): data
files are immutable and write-once under ``data/``; a numbered JSON
manifest lists exactly the files that make up each version; readers
resolve a manifest (latest or pinned) and load ONLY its files. Commits
are atomic via write-temp + ``os.rename`` of the manifest, so a reader
never sees a half-written version; old versions stay readable until
explicitly vacuumed. Single-writer by design (multi-writer needs a
coordination service — documented, not half-implemented).

At scale this is exactly how the real formats behave on an object
store: data-file writes are the big parallel job; the commit is one
tiny metadata operation.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "manifests"
_DATA_DIR = "data"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{version:06d}.json")


def table_versions(table_dir: str) -> list[int]:
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)


def _commit(table_dir: str, version: int, files: list[str],
            parent: int | None, operation: str) -> dict:
    manifest = {
        "version": version,
        "parent": parent,
        "operation": operation,
        "files": sorted(files),
    }
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    final = _manifest_path(table_dir, version)
    try:
        # os.link is atomic AND exclusive (EEXIST if final exists) —
        # an exists() check before rename() is a TOCTOU race where two
        # writers both pass the check and rename() silently clobbers
        # the loser's manifest
        os.link(tmp, final)
    except FileExistsError:
        raise RuntimeError(
            f"concurrent commit detected for version {version} — this "
            "layer is single-writer; serialize writers externally")
    finally:
        os.remove(tmp)
    return manifest


def snapshot_write(df: DataFrame, table_dir: str,
                   mode: str = "append") -> dict:
    """Commit a new table version. ``mode='append'`` adds the batch's
    files to the parent version's list; ``'overwrite'`` starts the list
    fresh (the old files stay on disk — previous versions remain
    readable). Returns the committed manifest."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    batch_dir = os.path.join(table_dir, _DATA_DIR, uuid.uuid4().hex)
    df.write.mode("errorifexists").parquet(batch_dir)
    new_files = sorted(
        os.path.join(batch_dir, f) for f in os.listdir(batch_dir)
        if f.endswith(".parquet"))
    versions = table_versions(table_dir)
    parent = versions[-1] if versions else None
    files = list(new_files)
    if mode == "append" and parent is not None:
        files += _read_manifest(table_dir, parent)["files"]
    return _commit(table_dir, parent + 1 if parent is not None else 1,
                   files, parent, mode)


def snapshot_read(spark: SparkSession, table_dir: str,
                  version: int | None = None) -> DataFrame:
    """Read the table at a version (default: latest). Loads exactly the
    manifest's file list — files committed later (or never committed)
    are invisible, which IS the snapshot-isolation guarantee."""
    versions = table_versions(table_dir)
    if not versions:
        raise ValueError(f"no committed versions under {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not found (have {versions})")
    files = _read_manifest(table_dir, v)["files"]
    if not files:
        raise ValueError(f"version {v} is empty")
    return spark.read.parquet(*files)


def snapshot_rollback(table_dir: str, version: int) -> dict:
    """Commit a NEW version whose file list equals an older version's —
    roll-forward semantics (history is append-only; nothing is
    deleted), the same rollback model as the real table formats."""
    versions = table_versions(table_dir)
    if version not in versions:
        raise ValueError(f"version {version} not found (have {versions})")
    files = _read_manifest(table_dir, version)["files"]
    return _commit(table_dir, versions[-1] + 1, files, versions[-1],
                   f"rollback-to-v{version}")


def vacuum(table_dir: str, keep_versions: int = 1,
           remove_orphans: bool = False) -> list[str]:
    """Delete data files referenced ONLY by expired versions (all but
    the newest ``keep_versions`` manifests, which are also dropped;
    ``keep_versions=0`` drops everything). Returns the deleted file
    paths. The one destructive operation, kept separate and explicit
    like the formats it mirrors.

    ``remove_orphans=True`` additionally deletes data files no kept
    manifest references — batch dirs from writers that crashed before
    their commit, stale ``.tmp-*`` manifests, and emptied batch dirs.
    Only safe when no write is in flight (the table is single-writer;
    run orphan removal from the writer's own maintenance window, the
    retention discipline every real table format documents)."""
    import shutil

    versions = table_versions(table_dir)
    if keep_versions > 0 and len(versions) <= keep_versions:
        return []
    cut = len(versions) - keep_versions
    keep, drop = versions[cut:], versions[:cut]
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(table_dir, v)["files"])
    deleted = []
    for v in drop:
        for f in _read_manifest(table_dir, v)["files"]:
            if f not in live and os.path.exists(f):
                os.remove(f)
                deleted.append(f)
        os.remove(_manifest_path(table_dir, v))
    if remove_orphans:
        mdir = os.path.join(table_dir, _MANIFEST_DIR)
        if os.path.isdir(mdir):
            for f in os.listdir(mdir):
                if f.startswith(".tmp-"):
                    os.remove(os.path.join(mdir, f))
                    deleted.append(os.path.join(mdir, f))
        ddir = os.path.join(table_dir, _DATA_DIR)
        if os.path.isdir(ddir):
            for batch in os.listdir(ddir):
                bdir = os.path.join(ddir, batch)
                refd = any(f.startswith(bdir + os.sep) for f in live)
                if not refd:
                    for root, _d, fs in os.walk(bdir):
                        deleted += [os.path.join(root, x) for x in fs]
                    shutil.rmtree(bdir)
                elif not os.listdir(bdir):
                    shutil.rmtree(bdir)
    return deleted


def snapshot_merge(spark: SparkSession, table_dir: str, updates: DataFrame,
                   keys: list[str]) -> dict:
    """MERGE-into-table: read the latest version, upsert ``updates`` on
    ``keys`` (`operators/merge.merge_upsert` — updates win on
    collision), commit the result as a new overwrite version. The full
    Delta-style `MERGE INTO` loop with history: the pre-merge version
    stays readable/rollback-able. Rewrites the whole table — at scale,
    partition-restrict the read (merge only affected partitions) the
    same way the formats' file-pruning does."""
    from ..operators.merge import merge_upsert

    current = snapshot_read(spark, table_dir)
    merged = merge_upsert(current, updates, keys)
    return snapshot_write(merged, table_dir, mode="overwrite")


def snapshot_diff(spark: SparkSession, table_dir: str,
                  v_old: int, v_new: int) -> DataFrame:
    """Row-level change feed between two versions: full-row comparison
    yielding ``change ∈ {insert, delete}`` (an update appears as
    delete+insert of the row's two states) — the CDC read the real
    formats expose, derived purely from the manifests' file sets."""
    from pyspark.sql import functions as F

    old = snapshot_read(spark, table_dir, v_old)
    new = snapshot_read(spark, table_dir, v_new)
    ins = new.exceptAll(old).withColumn("change", F.lit("insert"))
    dels = old.exceptAll(new).withColumn("change", F.lit("delete"))
    return ins.unionByName(dels)
