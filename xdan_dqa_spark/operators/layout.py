"""Physical-layout operators: Z-order (Morton) interleaving for
multi-column data skipping — the table-layout optimization that makes
min/max row-group statistics effective on MORE than one predicate
column at once.

Why it matters at 100 TB: parquet readers skip row groups whose
column min/max ranges miss the predicate. A table sorted by ONE column
skips beautifully on that column and not at all on any other; a
Z-ordered sort key interleaves the bits of two (or more) columns so
every row group covers a tight RECTANGLE in (x, y) space — a box
predicate on either or both columns prunes most groups. This is the
same technique Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is
a pure Column expression + a range-partitioned sorted write, no table
format required.

The Morton spread is integer bit-twiddling only (shifts/AND/OR with
magic masks) — bit-identical in any engine, so the z-value computation
itself is oracle-checkable, and the layout evidence (row groups
overlapping a box query, read from parquet footer metadata) is
measured in tests rather than asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SPREADS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: F.Column) -> F.Column:
    """Interleave-ready spread of a 16-bit value: bit i moves to bit 2i
    (the classic magic-mask Morton dilation, 4 shift/mask rounds)."""
    out = c.bitwiseAND(F.lit(0xFFFF))
    for sh, mask in _SPREADS:
        out = (out.bitwiseOR(F.shiftleft(out, sh))).bitwiseAND(F.lit(mask))
    return out


def zvalue(x: F.Column, y: F.Column) -> F.Column:
    """Morton code of two 16-bit non-negative ints: x's bits at even
    positions, y's at odd — points close in (x, y) are close in z, so
    a z-sorted layout gives every row group a tight 2-D bounding box.
    Inputs are masked to 16 bits; result is a 32-bit value in a long."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def zorder_write(df: DataFrame, path: str, x_col: str, y_col: str,
                 n_files: int = 16, mode: str = "overwrite") -> None:
    """Write ``df`` parquet Z-ORDERED on (x_col, y_col): rows are
    range-partitioned and sorted by the Morton code, so each output
    file's row group covers a tight rectangle in (x, y) and a reader's
    min/max statistics prune most files for box predicates on EITHER
    column. repartitionByRange samples the z distribution for balanced
    files (the sort is per-partition after ranging — no single-task
    global sort); the z column itself is dropped from the payload
    (recomputable, and layouts should not leak helper columns)."""
    z = zvalue(F.col(x_col).cast("long"), F.col(y_col).cast("long"))
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
