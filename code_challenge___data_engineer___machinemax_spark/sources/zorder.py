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


# --- Hilbert curve ---------------------------------------------------------
# The quadrant label at each level: (rx, ry) -> which of the 4 curve cells
# the point falls in. (3*rx) XOR ry, written as an engine-neutral CASE so
# the DuckDB oracle generator (plans/layout_queries.py) emits the same
# decision table without depending on an xor operator spelling.
_QUAD_CASE = (
    "CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
    " WHEN {rx} = 0 THEN 1 WHEN {ry} = 0 THEN 3 ELSE 2 END"
)


def with_hilbert(
    df: DataFrame, x_col: str, y_col: str, bits: int, out_col: str
) -> DataFrame:
    """Append the Hilbert-curve index of (``x_col``, ``y_col``) on the
    2^bits x 2^bits grid as ``out_col`` (inputs are masked to ``bits``
    bits, the morton_code convention).

    The classic top-down construction (one quadrant decision + frame
    rotation per level, Wikipedia's xy2d) is a SEQUENTIAL recurrence, so
    it unrolls into ``bits`` chained projections — each a constant-width
    `withColumns` over named state columns (hx, hy, accumulated d), which
    keeps the expression tree LINEAR in ``bits`` (inlining would grow it
    ~5x per level) and lets whole-stage codegen fuse the chain into one
    pass. No shuffle, no UDF — same write-cost profile as morton_code,
    different locality: the Hilbert curve never makes the diagonal jumps
    Morton makes between quadrants, so consecutive index ranges are
    spatially tighter (fewer probe-box overlaps per file; measured by the
    hilbert_layout query)."""
    n = 1 << bits
    mask = n - 1
    df = df.withColumns(
        {
            "__hx": F.col(x_col).cast("bigint").bitwiseAND(F.lit(mask)),
            "__hy": F.col(y_col).cast("bigint").bitwiseAND(F.lit(mask)),
            out_col: F.lit(0).cast("bigint"),
        }
    )
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = f"(CASE WHEN (__hx DIV {s}) % 2 = 1 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (__hy DIV {s}) % 2 = 1 THEN 1 ELSE 0 END)"
        quad = _QUAD_CASE.format(rx=rx, ry=ry)
        df = df.withColumns(
            {
                out_col: F.expr(f"{out_col} + {s * s} * ({quad})"),
                "__hx": F.expr(
                    f"CASE WHEN {ry} = 1 THEN __hx"
                    f" WHEN {rx} = 1 THEN {n - 1} - __hy ELSE __hy END"
                ),
                "__hy": F.expr(
                    f"CASE WHEN {ry} = 1 THEN __hy"
                    f" WHEN {rx} = 1 THEN {n - 1} - __hx ELSE __hx END"
                ),
            }
        )
    return df.drop("__hx", "__hy")
