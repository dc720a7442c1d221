"""Z-order (Morton) clustering: interleave the bits of two columns so
that one physical sort order gives zone-map locality on BOTH
dimensions at once.

Why this exists at 100 TB: file- or bucket-level min/max statistics
(the merge table's zone maps, parquet row-group stats) only prune
scans when the layout is clustered on the filtered column. A linear
layout (sort by date) prunes date predicates but does nothing for a
customer predicate; Z-ordering by (customer, date) makes a 2-D
predicate prune on both — the same idea behind Delta Lake's
``OPTIMIZE ... ZORDER BY`` and Databricks' liquid clustering.

Everything here is a columnar bit-interleave expression (whole-stage
codegen); clustering is then just ``repartitionByRange`` /
``sortWithinPartitions`` on the z-value before writing.

``zorder_pruning_report`` quantifies the win without writing files:
bucket both layouts, compute each bucket's min/max zone maps, apply a
2-D predicate to the zone maps, and report how many buckets and rows
each layout would scan. The assertion "z-order scans fewer rows" is a
data-independent consequence of the math, so the report is both a
demo and a regression test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map ``col`` in [lo, hi] onto the integer grid [0, 2^bits):
    rank-preserving, engine-portable arithmetic (exact integer
    multiply, one IEEE double divide, floor). Out-of-range values
    CLAMP to the boundary cells (the zone-map convention — a stray
    sentinel below ``lo`` otherwise yields a negative cell whose
    bit-interleave is garbage Spark-side and a hard error in engines
    that refuse to shift negatives; keyfuzz finding, r12). NULLs stay
    NULL (no cell)."""
    n = 1 << bits
    raw = F.floor((col - lo) * n / (hi - lo + 1)).cast("long")
    return F.least(F.lit(n - 1).cast("long"), F.greatest(F.lit(0).cast("long"), raw))


def zvalue(a: Column, b: Column, bits: int) -> Column:
    """Morton interleave of two ``bits``-wide non-negative ints:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Pure integer expression — 2*bits shift/mask terms fused by
    codegen."""
    return zvalue_n([a, b], bits)


def zvalue_n(cols: list[Column], bits: int) -> Column:
    """Morton interleave of k ``bits``-wide non-negative ints,
    round-robin: bit i of column j lands at position i*k + j. The
    result needs k*bits bits — keep that ≤ 63 (e.g. 4 columns × 15
    bits). Still one flat integer expression for codegen."""
    k = len(cols)
    if k < 2:
        raise ValueError("zvalue_n needs at least two columns")
    if k * bits > 63:
        raise ValueError(f"{k} cols × {bits} bits exceeds a signed long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z + F.shiftleft(F.shiftright(c, i) % 2, i * k + j)
    return z


def zone_map_scan_report(
    df: DataFrame,
    bucket: Column,
    a: Column,
    b: Column,
    a_range: tuple[int, int],
    b_range: tuple[int, int],
    layout: str,
) -> DataFrame:
    """Group rows into layout buckets, build per-bucket (min, max)
    zone maps for both dimensions, and report what a 2-D predicate
    ``a ∈ a_range AND b ∈ b_range`` would scan: a bucket is read iff
    its zone maps overlap BOTH ranges. One aggregation pass."""
    zm = df.select(bucket.alias("__bkt"), a.alias("__a"), b.alias("__b")).groupBy(
        "__bkt"
    ).agg(
        F.min("__a").alias("a_min"),
        F.max("__a").alias("a_max"),
        F.min("__b").alias("b_min"),
        F.max("__b").alias("b_max"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    scanned = (
        (F.col("a_max") >= a_range[0])
        & (F.col("a_min") <= a_range[1])
        & (F.col("b_max") >= b_range[0])
        & (F.col("b_min") <= b_range[1])
    )
    agg = zm.agg(
        F.count(F.lit(1)).alias("buckets_total"),
        F.sum(scanned.cast("long")).alias("buckets_scanned"),
        F.sum(F.when(scanned, F.col("n_rows")).otherwise(F.lit(0))).alias("rows_scanned"),
    )
    return agg.select(
        F.lit(layout).alias("layout"),
        "buckets_total",
        "buckets_scanned",
        "rows_scanned",
    )
