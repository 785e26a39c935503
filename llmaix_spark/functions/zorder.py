"""Z-order (Morton) interleaving for multi-column data clustering.

The 100 TB data-skipping play (Delta Lake's OPTIMIZE ZORDER BY, the
lakehouse descendant of the classic Orenstein/Merrett Z-order curve):
sort the table by the bit-interleave of two filter columns before
writing, and parquet row-group min/max statistics become selective for
BOTH columns at once — a range predicate on either column prunes most
row groups at scan time, where a single-column sort only serves one
predicate. The curve key itself is 10 integer ops per column — pure
bigint mask/shift/or, bit-identical in any engine (the DuckDB oracle
reproduces it as a CTE chain), no UDF.

Layout contract: ``cluster_by_zorder`` = repartitionByRange on the
key + sortWithinPartitions — each output partition owns a contiguous
z-range, i.e. a compact rectangle-ish region of (x, y) space, which is
exactly what makes per-file min/max stats tight. The range exchange
samples the key (one extra pass over the key column only — Spark's
RangePartitioner reservoir), the standard price of a global layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASK31 = 0x7FFFFFFF
# the classic 32→64 bit-spread ladder (Morton encoding); inputs are
# masked to 31 bits so the final interleave fits in 62 bits and the
# y-side << 1 can never overflow a signed 64-bit checked shift
_SPREAD_STEPS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread31(c: Column) -> Column:
    c = c.cast("bigint").bitwiseAND(F.lit(_MASK31))
    for shift, mask in _SPREAD_STEPS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def zorder2_expr(x: Column, y: Column) -> Column:
    """The 62-bit Morton key of two non-negative integer columns
    (each truncated to its low 31 bits): bit i of x lands at position
    2i, bit i of y at 2i+1. Monotone per quadrant — points close in
    (x, y) are close in key, the property range-partitioning by the
    key turns into tight per-file column statistics."""
    return _spread31(x).bitwiseOR(F.shiftleft(_spread31(y), 1))


def cluster_by_zorder(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int,
    key_col: str = "_zkey",
) -> DataFrame:
    """Re-lay ``df`` along the Z-curve of (``x_col``, ``y_col``):
    contiguous z-ranges per partition, sorted within. Write the result
    with ``maxRecordsPerFile`` to get the skipping-friendly file
    layout; the key column is kept (drop it after writing if the sink
    schema must stay clean)."""
    keyed = df.withColumn(
        key_col, zorder2_expr(F.col(x_col), F.col(y_col))
    )
    return keyed.repartitionByRange(num_partitions, key_col).sortWithinPartitions(
        key_col
    )
