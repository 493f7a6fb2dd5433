"""Multi-dimensional data layout: Z-order (Morton) clustering for
multi-column file skipping.

A table sorted by one column skips files for predicates on THAT column
only; predicates on any other column touch every file. Z-ordering
interleaves the bits of rank-normalized column values so rows close in
ANY clustered dimension land close in the layout — per-file min/max
ranges stay narrow on every clustered column at once, and a reader's
row-group/file pruning works for each of them (the Delta/Iceberg
OPTIMIZE ZORDER idea, expressed as plain DataFrame ops + a range
repartition).

Scale: rank normalization is one ntile window per clustered column over
a SAMPLE-sized rank space (256 buckets — the window carries bucket ids,
not a global sort of values); the write itself is the same
repartitionByRange + sortWithinPartitions any clustered write pays.
Effectiveness is data-dependent (works when value locality exists);
``tests/test_layout.py`` measures pruning fractions on both clustered
columns against the unsorted layout.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered"]

#: bits per dimension in the interleaved key (256 rank buckets)
ZBITS = 8


def zorder_key(df: DataFrame, cols: list[str]) -> DataFrame:
    """Append a Morton-interleaved ``_zkey`` over ``cols``: each column is
    rank-normalized to ZBITS bits with ntile (distribution-insensitive —
    skewed value ranges still fill the bucket space), then bit b of every
    dimension d lands at interleaved position b * ndims + d."""
    out = df
    ndims = len(cols)
    for d, c in enumerate(cols):
        w = Window.orderBy(F.col(c))
        out = out.withColumn(f"_r{d}", F.ntile(1 << ZBITS).over(w) - 1)
    parts = [
        F.shiftleft(
            F.shiftright(F.col(f"_r{d}"), b).bitwiseAND(F.lit(1)).cast("long"),
            b * ndims + d,
        )
        for d in range(ndims)
        for b in range(ZBITS)
    ]
    zkey = reduce(lambda a, x: a + x, parts).alias("_zkey")
    return out.withColumn("_zkey", zkey).drop(*[f"_r{d}" for d in range(ndims)])


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered in Z-order over
    ``cols``: range-partition on the interleaved key (contiguous key
    ranges per file), sort within each file, drop the key from the data.

    Note the ntile windows in ``zorder_key`` are unpartitioned — fine for
    the 256-bucket rank space because the window carries only bucket
    assignments; a production writer over billions of rows swaps ntile
    for approx-quantile bucket boundaries (one pass, no window) with the
    same downstream layout."""
    keyed = zorder_key(df, cols)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
