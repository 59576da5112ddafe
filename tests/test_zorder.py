"""Z-order layout evidence (engine/zorder.py): morton2 vs a pure-
Python interleave reference, and the actual data-skipping claim —
files written by zorder_write are clustered in BOTH dimensions, so
range predicates on EITHER key prune most files by parquet footer
min/max stats, while a single-key sort prunes one dimension and scans
everything for the other."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from batch_processing_system_spark.engine.zorder import (
    morton2,
    zorder_write,
)


def _morton_ref(x: int, y: int, bits: int = 16) -> int:
    code = 0
    for i in range(bits):
        code |= ((x >> i) & 1) << (2 * i)
        code |= ((y >> i) & 1) << (2 * i + 1)
    return code


class TestMortonCode:
    def test_matches_pure_python_reference(self, spark):
        pts = [(0, 0), (1, 0), (0, 1), (1, 1), (5, 3), (255, 1), (65535, 65535)]
        df = spark.createDataFrame(pts, "x bigint, y bigint").select(
            "x", "y", morton2(F.col("x"), F.col("y")).alias("z")
        )
        for r in df.collect():
            assert r["z"] == _morton_ref(r["x"], r["y"]), (r["x"], r["y"])

    def test_masks_above_bit_budget(self, spark):
        # values past the bit budget must wrap by masking, not corrupt
        df = spark.createDataFrame([(65536 + 5, 3)], "x bigint, y bigint")
        got = df.select(morton2(F.col("x"), F.col("y")).alias("z")).collect()[0]["z"]
        assert got == _morton_ref(5, 3)

    def test_locality_unit_squares_are_contiguous(self, spark):
        # the defining property: each 2x2-aligned square occupies 4
        # CONSECUTIVE codes
        pts = [(x, y) for x in range(8) for y in range(8)]
        df = spark.createDataFrame(pts, "x bigint, y bigint")
        codes = {
            (r["x"], r["y"]): r["z"]
            for r in df.select(
                "x", "y", morton2(F.col("x"), F.col("y")).alias("z")
            ).collect()
        }
        for bx in range(0, 8, 2):
            for by in range(0, 8, 2):
                quad = sorted(
                    codes[(x, y)]
                    for x in range(bx, bx + 2)
                    for y in range(by, by + 2)
                )
                assert quad == list(range(quad[0], quad[0] + 4))


def _file_ranges(path: str, cols: tuple[str, str]):
    """Per parquet file: {col: (min, max)} from footer stats."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for c in cols:
                st = row_group.column(names.index(c)).statistics
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def _files_touched(ranges, col, q_lo, q_hi) -> int:
    return sum(1 for r in ranges if not (r[col][1] < q_lo or r[col][0] > q_hi))


class TestFilePruning:
    @pytest.fixture(scope="class")
    def layouts(self, spark, tmp_path_factory):
        base = tmp_path_factory.mktemp("zorder")
        pts = [(x, y) for x in range(64) for y in range(64)]
        df = spark.createDataFrame(pts, "x bigint, y bigint").repartition(8)
        zpath = str(base / "zordered")
        xpath = str(base / "xsorted")
        zorder_write(df, zpath, "x", "y", n_files=16, bits=6)
        (
            df.repartitionByRange(16, "x")
            .sortWithinPartitions("x", "y")
            .write.mode("overwrite")
            .parquet(xpath)
        )
        return _file_ranges(zpath, ("x", "y")), _file_ranges(xpath, ("x", "y"))

    def test_zorder_prunes_both_dimensions(self, layouts):
        zranges, _ = layouts
        n = len(zranges)
        assert n >= 12  # the layout actually produced ~16 files
        # an eighth-width slice in EITHER dimension touches at most
        # half the files (ideal tiling: 1/4 + boundary slop)
        for col in ("x", "y"):
            touched = _files_touched(zranges, col, 8, 15)
            assert touched <= n // 2, (col, touched, n)

    def test_single_key_sort_scans_everything_for_the_other_key(self, layouts):
        zranges, xranges = layouts
        # x-sorted: great on x ...
        assert _files_touched(xranges, "x", 8, 15) <= len(xranges) // 2
        # ... but every file spans the full y domain
        assert _files_touched(xranges, "y", 8, 15) == len(xranges)
        # and z-order beats it on the y query
        assert _files_touched(zranges, "y", 8, 15) < _files_touched(
            xranges, "y", 8, 15
        )
