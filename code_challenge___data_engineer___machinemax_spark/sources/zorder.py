"""Z-order (Morton-interleaved) table layout: multi-dimensional pruning.

Bucketing (bucketed.py) removes the shuffle for ONE join key; partitioning
(test_layouts.py) prunes on ONE column. When queries filter on EITHER of
two columns (events by user OR by time, vectors by centroid OR by label),
a single-column sort makes the second column's min/max stats useless —
every file spans the full domain. Interleaving the bits of both columns
into one Morton code and range-partitioning + sorting by it keeps BOTH
columns locally clustered, so parquet footer min/max stats stay tight on
both dimensions and a reader (or Spark's row-group pushdown) skips most of
the table for either predicate.

All expressions are JVM-side bit arithmetic (shiftleft/or/and codegen) —
the classic magic-number bit spread, 5 ops per column — so writing the
layout costs one range shuffle, exactly like a plain sort-by-one-column
ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) steps spreading a 16-bit int so its bits occupy even
# positions of a 32-bit lane: abcdefgh -> a0b0c0d0...
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(col: Column) -> Column:
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_code(col_a: Column, col_b: Column) -> Column:
    """Interleave the low 16 bits of two non-negative int columns into one
    32-bit Morton code (a in even bit positions, b in odd). Inputs larger
    than 16 bits should be pre-bucketed (e.g. ``col / step``) — the code
    orders buckets, the data keeps full precision."""
    return _spread_bits(col_a).bitwiseOR(F.shiftleft(_spread_bits(col_b), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    scale_a: int = 1,
    scale_b: int = 1,
) -> None:
    """Persist ``df`` Z-ordered on (col_a, col_b): range-partition into
    ``n_files`` splits of the Morton code and sort within each, so every
    output file covers a compact square-ish region of the (a, b) grid and
    its parquet footer min/max are tight on BOTH columns. ``scale_*``
    divide the raw values into <= 16-bit bucket indexes (e.g. seconds ->
    hours) before interleaving; the stored columns keep full precision.

    One range shuffle at write time — the same cost as any sorted ingest —
    amortized over every subsequent single- or two-dimension scan."""
    code = morton_code(
        (F.col(col_a) / scale_a).cast("long"),
        (F.col(col_b) / scale_b).cast("long"),
    )
    (
        df.withColumn("__z", code)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
