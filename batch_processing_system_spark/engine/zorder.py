"""Z-order (Morton) multidimensional layout — the lakehouse
data-skipping technique (Delta OPTIMIZE ZORDER / Iceberg sort-order
shape): interleave the bits of two clustering keys so that files
sorted by the interleaved code are simultaneously clustered in BOTH
dimensions, and a range predicate on EITHER key prunes most files via
parquet footer min/max stats.

All JVM-side bit arithmetic (shiftleft/shiftright/bitwiseAND/OR
unrolled per bit — whole-stage codegen folds the 2*bits-term tree
into straight-line code); no UDF anywhere. At 100 TB this is a
write-time layout choice: one repartitionByRange shuffle on the code,
then every later scan with a selective predicate on either key reads
~sqrt-fraction of the files instead of all of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton2(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative integral
    columns: x supplies even result bits, y odd. BIGINT-safe for
    bits <= 31."""
    xm = x.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    code = F.lit(0).cast("bigint")
    for i in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return code


def morton2_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as portable SQL (DuckDB oracle twin):
    disjoint bit positions, so + is a safe OR."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({x} & {mask}) >> {i}) & 1) << {2 * i}")
        terms.append(f"((({y} & {mask}) >> {i}) & 1) << {2 * i + 1}")
    return "(" + " + ".join(f"({t})" for t in terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    Morton code of (xcol, ycol): repartitionByRange on the code
    (range boundaries from Spark's reservoir sample — one extra
    sampling pass, same as any global sort), sorted within each file
    so parquet page/row-group stats are tight in both dimensions."""
    z = morton2(F.col(xcol), F.col(ycol), bits).alias("_zcode")
    (
        df.select("*", z)
        .repartitionByRange(n_files, "_zcode")
        .sortWithinPartitions("_zcode")
        .drop("_zcode")
        .write.mode("overwrite")
        .parquet(path)
    )
