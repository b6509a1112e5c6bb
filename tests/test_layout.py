"""Output layout (sources/layout.py): file sizing + Z-order clustering.

The z-order check is physical, not circumstantial: parquet footer
min/max statistics per row group, read back with pyarrow, must show
NARROW ranges on BOTH clustered columns (that narrowness IS what lets a
reader skip row groups), versus ~full-range stats for an unclustered
control write of the same data.
"""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.sources import load_table
from anomalyzer_spark.sources.layout import (
    write_sized_parquet, write_zordered, zvalue)


def test_zvalue_bit_interleave(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (2, 1)], "x long, y long")
    got = [r["z"] for r in df.select(
        zvalue(["x", "y"], bits=2).alias("z")).collect()]
    # bit layout (low→high): x0, y0, x1, y1
    assert got == [0b0101, 0b1010, 0b0110]
    with pytest.raises(ValueError, match=">= 2"):
        zvalue(["x"])
    with pytest.raises(ValueError, match="fit a long"):
        zvalue(["x", "y", "x", "y"], bits=16)


def _rowgroup_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            out.append((float(st.min), float(st.max)))
    return out


def test_write_zordered_narrows_rowgroup_stats(spark, sf_dir, tmp_path):
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    zpath, cpath = str(tmp_path / "z"), str(tmp_path / "control")
    # 32 z-ranges over 2 dims → expected per-dim file range ≈ 1/sqrt(32)
    # plus Morton boundary effects (measured 0.21-0.31 on the fixtures)
    write_zordered(od, zpath, ["o_custkey", "o_totalprice"], n_files=32)
    # control: random (hash) distribution, no clustering
    od.repartition(8).write.mode("overwrite").parquet(cpath)

    # content survives the rewrite exactly
    back = spark.read.parquet(zpath)
    assert back.count() == od.count()
    assert back.agg(F.sum("o_orderkey")).collect()[0][0] == \
        od.agg(F.sum("o_orderkey")).collect()[0][0]

    for col in ("o_custkey", "o_totalprice"):
        lo = float(od.agg(F.min(col)).collect()[0][0])
        hi = float(od.agg(F.max(col)).collect()[0][0])
        span = hi - lo

        def avg_frac(path):
            rng = _rowgroup_ranges(path, col)
            assert rng
            return sum((b - a) for a, b in rng) / len(rng) / span

        z_frac, c_frac = avg_frac(zpath), avg_frac(cpath)
        # control row groups see ~the whole domain; z-ordered ones see a
        # narrow slice of BOTH dimensions at once
        assert c_frac > 0.8, (col, c_frac)
        assert z_frac < 0.5 * c_frac, (col, z_frac, c_frac)


def test_write_sized_parquet_bounds_file_rows(spark, sf_dir, tmp_path):
    od = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "sized")
    n_per_file = write_sized_parquet(od, out, target_mb=1)
    assert n_per_file > 0
    files = glob.glob(f"{out}/*.parquet")
    assert files
    for f in files:
        assert pq.ParquetFile(f).metadata.num_rows <= n_per_file
    with pytest.raises(ValueError, match="target_mb"):
        write_sized_parquet(od, out, target_mb=0)


def test_write_sized_parquet_partition_by(spark, sf_dir, tmp_path):
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    out = str(tmp_path / "sized_parts")
    write_sized_parquet(od, out, target_mb=64,
                        partition_by=["o_orderstatus"])
    parts = glob.glob(f"{out}/o_orderstatus=*")
    assert len(parts) >= 2
    assert spark.read.parquet(out).count() == od.count()
