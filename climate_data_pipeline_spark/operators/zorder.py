"""Z-order (Morton) multi-dimensional clustering (beyond-reference
extension to the layout presets in ``sources/io.py``).

The reference tunes Zarr chunk geometry per access pattern
(`/root/reference/ingest/arco_converter.py:20-107`,
`processing/chunking.py:17-103`): "timeseries" chunks are long in time,
"spatial" chunks are wide in lat/lon — each serves ONE pattern well. A
space-filling curve is the classic answer when queries range over BOTH
dimensions: sorting rows by the interleaved-bit Morton code of
(quantized lat, quantized lon) makes every parquet file cover a small
*rectangle* of the grid, so row-group min/max stats prune bbox queries
on lat AND lon simultaneously — the long-table analogue of square
chunks, and the same technique behind Delta/Iceberg Z-ordering.

Everything is plain integer arithmetic (shift/mask/multiply/add), so the
key is engine-portable and the kernel is DuckDB-oracle-checkable
(`zorder_cluster_key`); the layout win is measured in tests/test_zorder.py
(per-file lat AND lon spreads both shrink vs a single-column sort).

At scale: computing the key is a narrow per-row map (no shuffle);
``zorder_by`` adds exactly one range-repartition — the shuffle any
sorted write pays — and the sort key is a single long, so the range
exchange is as cheap as sorting by one column.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column | str, lo: float, hi: float, bits: int) -> Column:
    """Clamp ``col`` to [lo, hi] and scale to an integer cell index in
    [0, 2^bits - 1]. Pure arithmetic, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    cells = (1 << bits) - 1
    idx = F.floor((c - lo) / (hi - lo) * cells).cast("long")
    return F.least(F.greatest(idx, F.lit(0)), F.lit(cells))


def morton_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: bit i of x lands at position 2i, bit i of y at 2i+1. Built
    as a sum of shift/mask terms — arithmetic any engine reproduces
    bit-for-bit (see ``sql_morton_key``)."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    terms = []
    for i in range(bits):
        terms.append(F.shiftright(xc, i).bitwiseAND(F.lit(1))
                     * F.lit(1 << (2 * i)))
        terms.append(F.shiftright(yc, i).bitwiseAND(F.lit(1))
                     * F.lit(1 << (2 * i + 1)))
    return reduce(add, terms).cast("long")


def sql_morton_key(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """ANSI-SQL mirror of ``morton_key`` (DuckDB-compatible bit ops)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_by(df: DataFrame, x_col: str, y_col: str,
              x_range: tuple[float, float], y_range: tuple[float, float],
              bits: int = 16, n_partitions: int | None = None) -> DataFrame:
    """Cluster rows along the Z-order curve of (x, y): one range
    repartition + in-partition sort on the interleaved key. Write the
    result with ``df.write.parquet`` and each file covers a compact
    (x, y) rectangle, so min/max stats prune 2-D range predicates."""
    key = morton_key(quantize(x_col, *x_range, bits=bits),
                     quantize(y_col, *y_range, bits=bits), bits=bits)
    n = n_partitions or max(
        df.sparkSession.sparkContext.defaultParallelism, 1)
    return (df.withColumn("__zkey", key)
              .repartitionByRange(n, "__zkey")
              .sortWithinPartitions("__zkey")
              .drop("__zkey"))
