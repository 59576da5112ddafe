"""Round-11 fixes pinned (VERDICT/ADVICE r10).

- bucketed-table GC: regenerating a source in place mints a new
  fingerprint-named bucketed table; the stale same-spec sibling must be
  pruned from spark-warehouse/bucketed instead of orphaned forever.
"""

from __future__ import annotations

import os
import shutil

from batch_processing_system_spark.engine.bucketing import (
    _BUCKET_ROOT,
    bucketed_table,
)
from batch_processing_system_spark.engine.session import default_driver_memory

from .conftest import SF_SMALL


class TestDriverMemoryGuard:
    """VERDICT r10 item 4: the factory's local-JVM heap scales with the
    executor-thread count so a 32-thread sf>=3 catalog run never OOMs
    at the stock config (SCALE.md: 8 GiB OOMed once mid-catalog)."""

    def test_scales_with_local_thread_count(self, monkeypatch):
        monkeypatch.delenv("SPARK_DRIVER_MEMORY", raising=False)
        assert default_driver_memory("local[32]") == "16g"
        assert default_driver_memory("local[8]") == "8g"   # floor is 8g
        assert default_driver_memory("local[2]") == "8g"

    def test_local_star_uses_host_cpus(self, monkeypatch):
        monkeypatch.delenv("SPARK_DRIVER_MEMORY", raising=False)
        n = os.cpu_count() or 8
        assert default_driver_memory("local[*]") == f"{max(8, n // 2)}g"

    def test_env_override_wins(self, monkeypatch):
        monkeypatch.setenv("SPARK_DRIVER_MEMORY", "24g")
        assert default_driver_memory("local[32]") == "24g"

    def test_cluster_master_keeps_driver_small(self, monkeypatch):
        monkeypatch.delenv("SPARK_DRIVER_MEMORY", raising=False)
        assert default_driver_memory("spark://host:7077") == "8g"


class TestBucketedGC:
    def test_stale_generation_is_pruned(self, spark, tmp_path):
        # private sf_dir so the fingerprint churn never touches the
        # shared testdata generations other tests route through
        sf_dir = str(tmp_path / "sf")
        os.makedirs(sf_dir)
        shutil.copy(
            os.path.join(SF_SMALL, "region.parquet"),
            os.path.join(sf_dir, "region.parquet"),
        )

        name1 = bucketed_table(spark, sf_dir, "region", "r_regionkey", 4)
        path1 = os.path.join(_BUCKET_ROOT, name1)
        assert os.path.isdir(path1)

        # in-place regeneration: same path, new mtime -> new fingerprint
        os.utime(
            os.path.join(sf_dir, "region.parquet"),
            ns=(1_000_000_000, 1_000_000_000),
        )
        name2 = bucketed_table(spark, sf_dir, "region", "r_regionkey", 4)
        assert name2 != name1
        path2 = os.path.join(_BUCKET_ROOT, name2)
        assert os.path.isdir(path2)
        # the stale generation's files AND catalog entry are gone
        assert not os.path.isdir(path1), "stale bucketed generation not pruned"
        assert not spark.catalog.tableExists(name1)
        # a DIFFERENT spec at the same source is a second layout, not a
        # stale generation — it must survive a same-spec rewrite
        other = bucketed_table(spark, sf_dir, "region", "r_regionkey", 8)
        os.utime(
            os.path.join(sf_dir, "region.parquet"),
            ns=(2_000_000_000, 2_000_000_000),
        )
        name3 = bucketed_table(spark, sf_dir, "region", "r_regionkey", 4)
        assert name3 not in (name1, name2)
        assert not os.path.isdir(path2)
        assert os.path.isdir(os.path.join(_BUCKET_ROOT, other)), (
            "different-spec layout was wrongly GC'd"
        )
        # cleanup this test's tables
        for n in (name3, other):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(os.path.join(_BUCKET_ROOT, n), ignore_errors=True)
