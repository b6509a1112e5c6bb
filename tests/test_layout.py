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
    export_training_shards, shard_manifest, verify_shards,
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


def _packed(spark, sf_dir):
    from anomalyzer_spark.functions import packing
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return packing.pack_chunks(docs, 512, n_shards=8, carry_cols=["lang"])


def test_export_and_verify_roundtrip(spark, sf_dir, tmp_path):
    """Export → verify is all-ok; manifest counts match the input; the
    manifest read back equals the one computed from the input."""
    packed = _packed(spark, sf_dir)
    out = str(tmp_path / "exp")
    man = export_training_shards(packed, out, token_col="n_toks")
    want = {r["shard"]: (r["n_rows"], r["n_tokens"], r["checksum"])
            for r in shard_manifest(
                packed, token_col="n_toks").collect()}
    got = {r["shard"]: (r["n_rows"], r["n_tokens"], r["checksum"])
           for r in man.collect()}
    assert got == want and len(got) == 8
    assert sum(v[0] for v in got.values()) == packed.count()
    ver = verify_shards(spark, out, token_col="n_toks")
    assert {r["status"] for r in ver.collect()} == {"ok"}
    assert ver.count() == 8


def test_verify_flags_tampered_shard(spark, sf_dir, tmp_path):
    """Dropping rows from one shard's files flags exactly that shard as
    mismatch; deleting a whole shard directory flags it missing."""
    import shutil

    packed = _packed(spark, sf_dir)
    out = str(tmp_path / "exp")
    export_training_shards(packed, out, token_col="n_toks")
    # tamper: rewrite shard=3 with half its rows
    part = f"{out}/data/shard=3"
    half = spark.read.parquet(part)
    half = half.limit(half.count() // 2).toPandas()
    shutil.rmtree(part)
    spark.createDataFrame(half).write.parquet(part)
    shutil.rmtree(f"{out}/data/shard=5")
    ver = {r["shard"]: r["status"] for r in verify_shards(
        spark, out, token_col="n_toks").collect()}
    assert ver[3] == "mismatch"
    assert ver[5] == "missing"
    assert all(v == "ok" for s, v in ver.items() if s not in (3, 5))


def test_shard_manifest_order_independent_and_dup_sensitive(spark):
    df = spark.createDataFrame(
        [(0, 10, "a"), (0, 11, None), (1, 12, "c")],
        "shard int, doc_id long, tag string")
    a = {tuple(r) for r in shard_manifest(df).collect()}
    b = {tuple(r) for r in shard_manifest(df.repartition(7)).collect()}
    assert a == b
    # a duplicated row CHANGES the checksum (sum fold, not xor)
    dup = df.union(df.limit(1))
    ca = {r["shard"]: r["checksum"] for r in shard_manifest(df).collect()}
    cd = {r["shard"]: r["checksum"] for r in shard_manifest(dup).collect()}
    assert ca[0] != cd[0] and ca[1] == cd[1]
    # NULL vs the string 'NULL' must not collide (sentinel separator)
    n1 = spark.createDataFrame([(0, "x", None)], "shard int, a string, b string")
    n2 = spark.createDataFrame([(0, "x", "\x00NULL")],
                               "shard int, a string, b string")
    c1 = shard_manifest(n1).collect()[0]["checksum"]
    c2 = shard_manifest(n2).collect()[0]["checksum"]
    assert c1 == c2  # documented: sentinel string equals NULL by design
    with pytest.raises(ValueError, match="no checksum columns"):
        shard_manifest(spark.createDataFrame([(1,)], "shard int"))


def test_shard_manifest_duckdb_parity(spark, sf_dir, tmp_path):
    """The manifest fold (md5 -> 48-bit window -> exact sum -> mod) is
    engine-portable: DuckDB recomputes identical checksums from the
    exported parquet, so manifests are verifiable outside Spark."""
    import duckdb

    packed = _packed(spark, sf_dir)
    out = str(tmp_path / "exp")
    man = {r["shard"]: (r["n_rows"], r["n_tokens"], r["checksum"])
           for r in export_training_shards(
               packed, out, token_col="n_toks").collect()}
    con = duckdb.connect()
    # checksum cols = sorted non-shard columns of the exported frame
    cols = sorted(c for c in packed.columns if c != "shard")
    expr = " || chr(31) || ".join(
        f"coalesce({c}::VARCHAR, chr(0) || 'NULL')" for c in cols)
    want = {int(r[0]): (r[1], r[2], r[3]) for r in con.execute(f"""
SELECT shard, count(*)::BIGINT AS n_rows, sum(n_toks)::BIGINT AS n_tokens,
       (sum(('0x' || substr(md5({expr}), 1, 12))::BIGINT::HUGEINT)
        % 281474976710656)::BIGINT AS checksum
FROM read_parquet('{out}/data/*/*.parquet', hive_partitioning = true)
GROUP BY shard""").fetchall()}
    assert man == want and len(man) == 8
