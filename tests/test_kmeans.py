"""r57 k-means vs an independently written pure-Python Lloyd
implementation that mirrors the documented arithmetic: DECIMAL(12,6)
quantization as scaled integers, exact integer distances, HALF_UP
6dp centroid re-quantization through the double's shortest decimal
representation (Java BigDecimal.valueOf semantics). Plus 6dp rounding
margins and a planted-blob recovery test."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.queries.similarity import (
    _KM_ITERS,
    _KM_K,
    r57_kmeans,
)
from tests.conftest import SF_SMALL

_Q = Decimal("0.000001")


def _quant6(x: float) -> int:
    """double -> DECIMAL(12,6) as a scaled int (HALF_UP, like both
    engines' double->decimal cast)."""
    return int(Decimal(repr(x)).quantize(_Q, rounding=ROUND_HALF_UP) * 10**6)


_DIV_MEANS: list[float] = []  # every centroid-division result (pre-ROUND)


def _lloyd_reference(vecs: dict[int, list[float]]):
    pts = {vid: [_quant6(x) for x in v] for vid, v in vecs.items()}
    seeds = sorted(pts)[:_KM_K]
    cents = {i: list(pts[vid]) for i, vid in enumerate(seeds)}
    assign = {}
    dists = {}
    for _ in range(_KM_ITERS):
        for vid, p in pts.items():
            best = None
            for cid, c in sorted(cents.items()):
                d = sum((a - b) ** 2 for a, b in zip(p, c))
                if best is None or (d, cid) < best:
                    best = (d, cid)
            dists[vid] = best[0]
            assign[vid] = best[1]
        new = {}
        for cid in set(assign.values()):
            members = [pts[v] for v in pts if assign[v] == cid]
            n = len(members)
            dims = len(members[0])
            cvec = []
            for d in range(dims):
                s_int = sum(m[d] for m in members)
                mean_double = (float(s_int) / 1e6) / n
                _DIV_MEANS.append(mean_double)
                cvec.append(_quant6(mean_double))
            new[cid] = cvec
        cents = new
    return assign, dists, cents


class TestKmeans:
    def test_matches_independent_reference(self, spark):
        emb = load_table(spark, SF_SMALL, "embeddings")
        vecs = {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.collect()
        }
        assign, dists, cents = _lloyd_reference(vecs)
        sizes = {}
        inertia = {}
        for vid, cid in assign.items():
            sizes[cid] = sizes.get(cid, 0) + 1
            inertia[cid] = inertia.get(cid, 0) + dists[vid]
        got = {r["cid"]: r for r in r57_kmeans(spark, SF_SMALL).collect()}
        assert set(got) == set(sizes)
        for cid, row in got.items():
            assert row["n_vecs"] == sizes[cid], cid
            # inertia: exact decimal(·,12) sum -> double; reference int
            ref_inertia = inertia[cid] / 1e12
            assert abs(row["inertia"] - ref_inertia) < 1e-6 * max(
                1.0, ref_inertia
            ), cid
            ref_l1 = sum(abs(c) for c in cents[cid]) / 1e6
            assert abs(row["centroid_l1"] - ref_l1) < 1e-9, cid

    def test_both_engines_round_every_actual_division_identically(
        self, spark
    ):
        # margins are NOT the right check here: centroid means are
        # rationals S/(10^6 n), and EXACT half-boundary values occur
        # legitimately (min recorded margin on sf0.001 is 0.0). The
        # property the oracle's hash-exactness actually rests on is
        # that Spark ROUND (BigDecimal shortest-repr HALF_UP) and
        # DuckDB ROUND (C round, half away from zero) agree on the
        # IDENTICAL doubles both engines compute — assert that
        # directly for every division the 3 rounds perform.
        import duckdb

        emb = load_table(spark, SF_SMALL, "embeddings")
        vecs = {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.collect()
        }
        _DIV_MEANS.clear()
        _lloyd_reference(vecs)
        assert _DIV_MEANS
        vals = sorted(set(_DIV_MEANS))
        con = duckdb.connect()
        duck = [
            con.execute("SELECT round(CAST(? AS DOUBLE), 6)", [v]).fetchone()[0]
            for v in vals
        ]
        sdf = spark.createDataFrame([(v,) for v in vals], "v double")
        from pyspark.sql import functions as F

        sp = [
            r["r"] for r in sdf.select(F.round("v", 6).alias("r"))
            .orderBy("v").collect()
        ]
        assert duck == sp

    def test_planted_blobs_recovered(self, spark, tmp_path):
        # 8 tight blobs, one per seed region: each blob's points sit
        # within 0.01 of its center, centers 10 apart -> k-means with
        # lowest-id seeds from DIFFERENT blobs must keep blobs intact
        import itertools

        rows = []
        vid = 0
        for b in range(_KM_K):
            center = [10.0 * b] * 4
            for j in range(12):
                vec = [c + 0.001 * ((j + i) % 5) for i, c in enumerate(center)]
                rows.append((vid, vec, b))
                vid += 1
        # interleave ids so seed ids 0..7 land in 8 different blobs
        order = list(
            itertools.chain(*zip(*[range(b * 12, b * 12 + 12) for b in range(_KM_K)]))
        )
        remap = {old: new for new, old in enumerate(order)}
        rows = [(remap[r[0]], r[1], r[2]) for r in rows]
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "embeddings.parquet")
        )
        got = r57_kmeans(spark, str(tmp_path)).collect()
        assert len(got) == _KM_K
        assert all(r["n_vecs"] == 12 for r in got)
        # blob tightness: total inertia tiny vs the 10-apart spacing
        assert sum(r["inertia"] for r in got) < 1.0


class TestCovariance:
    def test_matches_numpy_reference(self, spark):
        """r58 vs an integer-exact numpy X^T X on the same DECIMAL(12,6)
        quantization: all 2080 upper-triangle cells within ROUND noise."""
        import numpy as np

        from batch_processing_system_spark.queries.similarity import (
            r58_embedding_covariance,
        )

        emb = load_table(spark, SF_SMALL, "embeddings")
        rows = sorted(
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.collect()
        )
        X = np.array(
            [[_quant6(x) for x in e] for _, e in rows], dtype=np.int64
        )
        n = X.shape[0]
        sxy = X.T @ X  # |cells| <= 1e12 * n — exact in int64
        sx = X.sum(axis=0)
        cov = (
            sxy.astype(np.float64) / 1e12
            - np.outer(sx, sx).astype(np.float64) / 1e12 / n
        ) / n
        got = r58_embedding_covariance(spark, SF_SMALL).collect()
        assert len(got) == X.shape[1] * (X.shape[1] + 1) // 2
        for r in got:
            ref = cov[r["dim_i"], r["dim_j"]]
            assert abs(r["cov"] - ref) <= 2e-6, (r, ref)

    def test_diagonal_is_nonnegative_variance(self, spark):
        from batch_processing_system_spark.queries.similarity import (
            r58_embedding_covariance,
        )

        got = r58_embedding_covariance(spark, SF_SMALL).collect()
        for r in got:
            if r["dim_i"] == r["dim_j"]:
                assert r["cov"] >= 0.0, r


class TestDbscan:
    def test_planted_core_border_noise(self, spark, tmp_path):
        """Two planted density clusters in orthogonal planes, one
        border point (exactly one core neighbor), one noise point."""
        import math

        def vec(plane, deg):
            a = math.radians(deg)
            v = [0.0, 0.0, 0.0, 0.0]
            if plane == 0:
                v[0], v[2] = math.cos(a), math.sin(a)
            else:
                v[1], v[3] = math.cos(a), math.sin(a)
            return v

        rows = [
            (0, vec(0, 0), 0),
            (1, vec(0, 20), 0),
            (2, vec(0, 40), 0),
            (3, vec(0, 95), 0),   # cos to id2 = cos55 ≈ .574 only -> border
            (4, vec(1, 0), 1),
            (5, vec(1, 20), 1),
            (6, vec(1, 40), 1),
            (7, vec(0, 170), 2),  # no neighbor ≥ .45 -> noise
        ]
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "embeddings.parquet")
        )
        from batch_processing_system_spark.queries.similarity import r59_dbscan

        got = {
            r["cluster"]: (r["n_core"], r["n_border"])
            for r in r59_dbscan(spark, str(tmp_path)).collect()
        }
        assert got == {-1: (0, 1), 0: (3, 1), 4: (3, 0)}


class TestThresholdSweep:
    def test_monotone_refinement(self, spark):
        from batch_processing_system_spark.queries.similarity import (
            r60_threshold_sweep,
        )

        rows = sorted(
            r60_threshold_sweep(spark, SF_SMALL).collect(),
            key=lambda r: r["tau"],
        )
        assert [r["tau"] for r in rows] == [0.45, 0.60, 0.75]
        # rising tau only removes edges: clustered mass and the largest
        # cluster can never grow
        for lo, hi in zip(rows, rows[1:]):
            assert hi["n_clustered"] <= lo["n_clustered"]
            assert hi["largest"] <= lo["largest"]
