"""Z-order layout: Morton key correctness and write round-trip."""

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import layout as ly


def _py_morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z += ((a >> i) & 1) << (2 * i + 1)
        z += ((b >> i) & 1) << (2 * i)
    return z


def test_morton_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 2, 3, 255, 65535) for b in (0, 1, 7, 1024, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", ly.morton_z(F.col("a"), F.col("b"), 16).alias("z")).collect()
    }
    for (a, b), z in got.items():
        assert z == _py_morton(a, b)
    # interleave is a bijection on the sample
    assert len(set(got.values())) == len(rows)


def test_morton_locality_rectangles(spark):
    # all 16 cells of a 4x4 grid: z-values of a 2x2 aligned sub-square
    # are CONTIGUOUS — the property that turns row groups into
    # axis-aligned rectangles
    rows = [(a, b) for a in range(4) for b in range(4)]
    df = spark.createDataFrame(rows, "a long, b long")
    z = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", ly.morton_z(F.col("a"), F.col("b"), 2).alias("z")).collect()
    }
    quad = sorted(z[(a, b)] for a in (0, 1) for b in (0, 1))
    assert quad == list(range(quad[0], quad[0] + 4))
    quad2 = sorted(z[(a, b)] for a in (2, 3) for b in (2, 3))
    assert quad2 == list(range(quad2[0], quad2[0] + 4))


def test_zorder_write_roundtrip(spark, tmp_path):
    rows = [(i, i % 7, i * 11 % 13, float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "event_id long, u long, h long, value double")
    out = str(tmp_path / "zo")
    ly.zorder_write(df, out, a_col="u", b_col="h", bits=8, n_files=4)
    back = spark.read.parquet(out)
    assert sorted(back.columns) == sorted(df.columns)  # __z dropped
    got = {tuple(r) for r in back.collect()}
    assert got == {tuple(r) for r in rows}
