"""Z-order clustering: Morton-code correctness against a python
reference, and the pruning claim itself — z-ordered files are
rectangles in (a, b) space, so box queries overlap FEW files on
either dimension, while a linear sort leaves one dimension unpruned."""

from __future__ import annotations

from pyspark.sql import functions as F

from alternating_least_squares_spark.operators.zorder import (
    morton_code,
    zorder_write,
)


def _morton_ref(a: int, b: int, bits: int = 21) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_code_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (5, 9), (1023, 77), (2**21 - 1, 2**21 - 1)],
        "a long, b long",
    )
    rows = df.select(
        "a", "b", morton_code(F.col("a"), F.col("b")).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == _morton_ref(r["a"], r["b"]), (r["a"], r["b"])
    # spot identities: interleave places a in even bits, b in odd
    got = {(r["a"], r["b"]): r["z"] for r in rows}
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1 and got[(0, 1)] == 2


def _file_boxes(spark, path):
    """Per-file (min, max) of both dimensions — what parquet footer
    stats give a scan planner."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("a").alias("a0"), F.max("a").alias("a1"),
            F.min("b").alias("b0"), F.max("b").alias("b1"),
        )
        .collect()
    )


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """1M-point grid into 16 files. Linear sort on a: a box query on b
    overlaps EVERY file (each spans the full b domain). Z-order: the
    same box overlaps a fraction of the files on either dimension."""
    n_files = 16
    pts = (
        spark.range(200_000)
        .select(
            (F.hash("id") % 1024 + 1024).cast("long").bitwiseAND(F.lit(1023)).alias("a"),
            (F.hash("id", F.lit(1)) % 1024 + 1024).cast("long").bitwiseAND(F.lit(1023)).alias("b"),
        )
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    zorder_write(pts, zpath, "a", "b", n_files, bits=10)
    (
        pts.repartitionByRange(n_files, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def overlaps(boxes, dim, lo, hi):
        d0, d1 = (f"{dim}0", f"{dim}1")
        return sum(1 for r in boxes if not (r[d1] < lo or r[d0] > hi))

    zb = _file_boxes(spark, zpath)
    lb = _file_boxes(spark, lpath)
    assert len(zb) == n_files and len(lb) == n_files
    # narrow band on b (1/16 of the domain)
    z_hits_b = overlaps(zb, "b", 0, 63)
    l_hits_b = overlaps(lb, "b", 0, 63)
    assert l_hits_b == n_files  # linear-on-a never prunes b
    assert z_hits_b <= n_files // 2, (z_hits_b, n_files)
    # and z-order still prunes on a as well
    z_hits_a = overlaps(zb, "a", 0, 63)
    assert z_hits_a <= n_files // 2, (z_hits_a, n_files)
    # correctness: same rows both layouts
    assert (
        spark.read.parquet(zpath).orderBy("a", "b").collect()
        == spark.read.parquet(lpath).orderBy("a", "b").collect()
    )


def test_zorder_write_rejects_reserved_column(spark, tmp_path):
    import pytest

    df = spark.range(10).select(
        F.col("id").alias("a"), F.col("id").alias("b"), F.lit(1).alias("_z")
    )
    with pytest.raises(ValueError, match="_z"):
        zorder_write(df, str(tmp_path / "x"), "a", "b", 2)


def test_morton_code_py_matches_column_expression(spark):
    """The driver-side twin must equal the codegen expression bit for
    bit (it prices the z-interval that read_key_range prunes with)."""
    from alternating_least_squares_spark.operators.zorder import (
        morton_code,
        morton_code_py,
    )

    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 100, 2**20) for b in (0, 3, 77, 2**21 - 1)],
        "a long, b long",
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", morton_code(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    assert got == {(a, b): morton_code_py(a, b) for (a, b) in got}


def test_morton_monotone_rectangle_interval(spark):
    """The pruning contract of read_key_range's z-interval: every
    point of a rectangle has its Morton code inside
    [morton(lo_a, lo_b), morton(hi_a, hi_b)]."""
    import random

    from alternating_least_squares_spark.operators.zorder import (
        morton_code_py,
    )

    rng = random.Random(11)
    for _ in range(200):
        a0, a1 = sorted(rng.randrange(1 << 12) for _ in range(2))
        b0, b1 = sorted(rng.randrange(1 << 12) for _ in range(2))
        zlo, zhi = morton_code_py(a0, b0), morton_code_py(a1, b1)
        a = rng.randint(a0, a1)
        b = rng.randint(b0, b1)
        assert zlo <= morton_code_py(a, b) <= zhi


def test_cluster_optimize_prunes_range_reads(spark, tmp_path):
    """ac11's physical claim, pinned: after cluster_optimize on a
    Morton key, a rectangle's z-interval read touches a strict
    minority of files, while the z-hostile v0 layout reads all of
    them; both reads return identical rectangle rows; history records
    the layout commit."""
    from alternating_least_squares_spark.operators.zorder import (
        morton_code,
        morton_code_py,
    )
    from alternating_least_squares_spark.sources import snapshot as SN

    n_files = 8
    rows = spark.range(4000).select(
        (F.col("id") % 64).alias("a"),
        ((F.col("id") * 7919) % 64).alias("b"),
        F.col("id").alias("payload"),
    )
    df = rows.select(
        "a", "b", "payload",
        morton_code(F.col("a"), F.col("b")).alias("zcode"),
    )
    path = str(tmp_path / "t")
    # hostile v0: clustered by payload (uncorrelated with z)
    SN.create_table(
        df.repartitionByRange(n_files, "payload"), path, key="zcode"
    )
    stats = SN.cluster_optimize(spark, path, n_files)
    assert stats["files_after"] == n_files and stats["rows"] == 4000
    zlo, zhi = morton_code_py(8, 8), morton_code_py(23, 23)
    opt, f_opt, f_tot = SN.read_key_range(spark, path, zlo, zhi)
    v0, f_v0, _ = SN.read_key_range(spark, path, zlo, zhi, version=0)
    assert f_v0 == n_files  # every hostile file spans the z domain
    assert f_opt <= n_files // 2, (f_opt, n_files)
    rect = F.col("a").between(8, 23) & F.col("b").between(8, 23)
    got_opt = sorted(
        (r["a"], r["b"], r["payload"])
        for r in opt.filter(rect).collect()
    )
    got_v0 = sorted(
        (r["a"], r["b"], r["payload"])
        for r in v0.filter(rect).collect()
    )
    assert got_opt == got_v0 and len(got_opt) > 0
    ops = [h["operation"] for h in SN.history(path)]
    assert ops == ["create", "cluster_optimize"]
