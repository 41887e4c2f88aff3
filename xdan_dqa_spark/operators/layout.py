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


def compact_parquet(spark, src_path: str, dst_path: str,
                    target_mb: int = 128, mode: str = "error") -> int:
    """Compact a small-files parquet directory into ~``target_mb``-sized
    files; returns the output file count. The operational fix for the
    100 TB small-files problem: streaming ingests and fine-grained
    partitions leave thousands of KB-scale files whose per-file open /
    footer / task-schedule overhead dominates scans (and strains the
    namenode / object-store listing long before bytes do).

    Sizing is MEASURED, not guessed: the input's actual on-disk bytes
    come from the file listing (via the Hadoop FS API — works on any
    scheme Spark can read), and the file count is ceil(bytes/target).
    coalesce() merges partitions WITHOUT a shuffle (partition counts
    only ever shrink here, which is exactly coalesce's no-exchange
    case); rows are not globally re-sorted — compaction must not
    destroy an existing z-order/sort layout within files it merges.
    Write to a NEW directory then swap, never in place (a failed
    in-place rewrite loses data; ``mode="error"`` refuses to clobber)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, -(-total // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    df.coalesce(int(n_files)).write.mode(mode).parquet(dst_path)
    return int(n_files)
