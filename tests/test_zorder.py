"""Z-order layout: Morton key exactness, SQL twin, file-skipping win."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.zorder import (
    column_bounds, write_zordered, zorder_key, zorder_key_sql,
    zorder_stats, zorder_stats_sql)


def _ref_key(vals, bounds, bits):
    """Pure-python reference: clamp, pre-shift multiply-div quantize,
    interleave."""
    key = 0
    n = len(vals)
    top = (1 << bits) - 1
    for ci, (v, (lo, hi)) in enumerate(zip(vals, bounds)):
        if hi <= lo:
            q = 0
        else:
            s0 = max(0, (hi - lo).bit_length() + bits - 62)
            q = (((min(max(v, lo), hi) - lo) >> s0) * top) \
                // ((hi - lo) >> s0)
        for i in range(bits):
            key |= ((q >> i) & 1) << (i * n + ci)
    return key


@pytest.fixture(scope="module")
def points(spark):
    import random
    rng = random.Random(13)
    rows = [(i, rng.randint(0, 10_000), rng.randint(-500, 500))
            for i in range(400)]
    return spark.createDataFrame(rows, "id long, x long, y long")


class TestZorderKey:
    def test_matches_python_reference(self, spark, points):
        bounds = column_bounds(points, ["x", "y"])
        got = points.select(
            "x", "y", zorder_key(["x", "y"], bounds, bits=12)
            .alias("k")).collect()
        for r in got:
            assert r.k == _ref_key((r.x, r.y), bounds, 12)

    def test_matches_sql_twin(self, spark, points):
        import duckdb
        bounds = column_bounds(points, ["x", "y"])
        pdf = points.toPandas()
        con = duckdb.connect()
        con.register("pts", pdf)
        sql = con.execute(
            f"SELECT id, {zorder_key_sql(['x', 'y'], bounds, 12)} AS k "
            "FROM pts ORDER BY id").fetchall()
        got = sorted((r.id, r.k) for r in points.select(
            "id", zorder_key(["x", "y"], bounds, 12).alias("k")).collect())
        assert got == [(int(i), int(k)) for i, k in sql]

    def test_out_of_bounds_clamps(self, spark):
        df = spark.createDataFrame(
            [(0, -100, 5), (1, 99999, 5)], "id long, x long, y long")
        ks = df.select(zorder_key(["x", "y"], [(0, 100), (0, 10)], 8)
                       .alias("k")).collect()
        lo = _ref_key((0, 5), [(0, 100), (0, 10)], 8)
        hi = _ref_key((100, 5), [(0, 100), (0, 10)], 8)
        assert [r.k for r in ks] == [lo, hi]

    def test_wide_domain_stays_exact(self, spark):
        """Nanosecond-scale domains: a float quantizer would lose bits
        past 2^53; the shift quantizer must not."""
        big = 3 * 10**17 + 12345
        df = spark.createDataFrame(
            [(0, big, 7)], "id long, t long, y long")
        bounds = [(0, 4 * 10**17), (0, 10)]
        [r] = df.select(zorder_key(["t", "y"], bounds, 20)
                        .alias("k")).collect()
        assert r.k == _ref_key((big, 7), bounds, 20)

    def test_validation(self, spark):
        with pytest.raises(ValueError, match=">= 2 columns"):
            zorder_key(["x"], [(0, 1)], 8)
        with pytest.raises(ValueError, match="62 key bits"):
            zorder_key(["x", "y", "z"], [(0, 1)] * 3, 21)


class TestZorderStats:
    def test_stats_match_sql_twin(self, spark, points):
        import duckdb
        bounds = column_bounds(points, ["x", "y"])
        got = sorted(
            tuple(r) for r in zorder_stats(
                points, ["x", "y"], bounds, bits=12,
                bucket_bits=3).collect())
        con = duckdb.connect()
        con.register("pts", points.toPandas())
        exp = sorted(tuple(r) for r in con.execute(zorder_stats_sql(
            "pts", ["x", "y"], bounds, bits=12, bucket_bits=3)).fetchall())
        assert got == exp

    def test_buckets_are_local(self, spark, points):
        """Every leading-Z-prefix bucket spans at most ~half the global
        range in each dimension (3 bucket bits = at least one full bit
        fixed per dimension plus the partial third)."""
        bounds = column_bounds(points, ["x", "y"])
        (xlo, xhi), (ylo, yhi) = bounds
        rows = zorder_stats(points, ["x", "y"], bounds, bits=12,
                            bucket_bits=2).collect()
        assert len(rows) > 1
        for r in rows:
            assert (r.max_x - r.min_x) <= 0.55 * (xhi - xlo)
            assert (r.max_y - r.min_y) <= 0.55 * (yhi - ylo)


class TestWriteZordered:
    def test_file_stats_prune_multidim(self, spark, tmp_path):
        """The pay-off test: footer min/max of Z-ordered files cover a
        small fraction of the 2-D domain, while a hash layout covers
        ~all of it — the file-skipping win, measured from the actual
        parquet statistics a reader would prune on."""
        import glob
        import pyarrow.parquet as pq
        import random
        rng = random.Random(29)
        rows = [(i, rng.randint(0, 1 << 20), rng.randint(0, 1 << 20))
                for i in range(20_000)]
        df = spark.createDataFrame(rows, "id long, x long, y long")

        zpath = str(tmp_path / "zorder")
        write_zordered(df, zpath, ["x", "y"], bits=10, n_files=16)
        hpath = str(tmp_path / "hashed")
        df.repartition(16).write.parquet(hpath)

        def mean_area(path):
            areas = []
            for f in glob.glob(f"{path}/*.parquet"):
                md = pq.ParquetFile(f).metadata
                lo = {"x": None, "y": None}
                hi = {"x": None, "y": None}
                for rg in range(md.num_row_groups):
                    for col in range(md.num_columns):
                        cc = md.row_group(rg).column(col)
                        name = cc.path_in_schema
                        if name in lo:
                            st = cc.statistics
                            lo[name] = st.min if lo[name] is None \
                                else min(lo[name], st.min)
                            hi[name] = st.max if hi[name] is None \
                                else max(hi[name], st.max)
                areas.append(((hi["x"] - lo["x"]) / (1 << 20))
                             * ((hi["y"] - lo["y"]) / (1 << 20)))
            return sum(areas) / len(areas)

        z, h = mean_area(zpath), mean_area(hpath)
        # hash layout: every file spans ~the whole square (area ~1);
        # z-order: compact hyper-rectangles
        assert h > 0.9
        assert z < 0.35 * h

    def test_roundtrip_preserves_rows(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, i % 7, i % 11) for i in range(500)],
            "id long, x long, y long")
        p = str(tmp_path / "z2")
        write_zordered(df, p, ["x", "y"], bits=8, n_files=4)
        back = spark.read.parquet(p)
        assert back.columns == ["id", "x", "y"]
        assert sorted(r.id for r in back.collect()) == list(range(500))


class TestManifestPruning:
    def test_pruned_read_skips_files_and_stays_correct(self, spark,
                                                       tmp_path):
        """The planner-side win: a small 2-D box predicate over the
        Z-ordered layout reads a small fraction of the files, and the
        result equals the unpruned filter exactly (the residual filter
        makes pruning a pure fast-path)."""
        import random
        from rgd_rnaseq_workflows_spark.operators.zorder import (
            file_manifest, pruned_read)
        rng = random.Random(37)
        rows = [(i, rng.randint(0, 1 << 16), rng.randint(0, 1 << 16))
                for i in range(20_000)]
        df = spark.createDataFrame(rows, "id long, x long, y long")
        path = str(tmp_path / "zlake")
        write_zordered(df, path, ["x", "y"], bits=10, n_files=16)

        man = file_manifest(spark, path, ["x", "y"])
        assert len(man) == 16
        box = {"x": (1000, 5000), "y": (60000, 64000)}
        got, n_read, n_total = pruned_read(spark, path, man, box)
        exp = df.filter((df.x >= 1000) & (df.x <= 5000)
                        & (df.y >= 60000) & (df.y <= 64000))
        assert sorted(r.id for r in got.collect()) == \
            sorted(r.id for r in exp.collect())
        assert n_total == 16
        assert n_read <= 6          # the box touches few hyper-rectangles

    def test_missing_stats_kept_conservatively(self, spark, tmp_path):
        from rgd_rnaseq_workflows_spark.operators.zorder import pruned_read
        df = spark.createDataFrame([(1, 5, 5)], "id long, x long, y long")
        p = str(tmp_path / "one")
        # one part file: a multi-part write would let glob()[0] pick an
        # EMPTY part and turn this into a flake
        df.coalesce(1).write.parquet(p)
        import glob
        f = glob.glob(f"{p}/*.parquet")[0]
        man = [{"file": f, "min_x": None, "max_x": None,
                "min_y": 0, "max_y": 10}]
        got, n_read, _ = pruned_read(spark, p, man, {"x": (0, 10),
                                                     "y": (0, 10)})
        assert n_read == 1 and got.count() == 1
