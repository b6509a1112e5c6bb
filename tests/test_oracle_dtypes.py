"""Dtype-kind parity between every registry slot's Spark schema and its
DuckDB oracle's materialized pandas dtypes — the standing guard against
the round-7/8 `text_pipeline` failure class: DuckDB's integer `sum`
returns HUGEINT, which ``fetchdf()`` materializes as float64, so an
uncast aggregate hash-mismatches Spark's int64 on every row even though
the values are numerically equal. The driver hashes serialized values,
so int 123 vs float 123.0 is a red slot.

The check is cheap by construction: the Spark side never executes (the
declared schema is enough — batch frames build lazily; streaming slots
do drain, bounded at sf0.001), and the oracle runs under ``LIMIT 0`` so
DuckDB materializes dtypes without scanning. That keeps the whole
50-slot audit to seconds of oracle time.
"""

import duckdb
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry_mod
from tools.check_correctness import TABLES

#: slow tier (r16): the streaming slots' sf0.001 drains in the module
#: fixtures cost ~60 s; the dtype-kind class is also caught by
#: test_entry_oracle (default tier) and the driver's value hashes
pytestmark = pytest.mark.slow

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOATING = (T.FloatType, T.DoubleType)


def _spark_kind(dt) -> str:
    if isinstance(dt, _INTEGRAL):
        return "i"
    if isinstance(dt, _FLOATING):
        return "f"
    return "other"


def _pandas_kind(dtype) -> str:
    k = dtype.kind
    if k == "u":
        return "i"
    return k if k in ("i", "f") else "other"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def oracles(sf_dir):
    return entry_mod.oracle_sql(sf_dir=sf_dir)


@pytest.fixture(scope="module")
def spark_schemas(spark, sf_dir):
    # building the frames is lazy for batch slots; only streaming slots
    # pay a real drain — all bounded at the unit-test SF
    return {name: {f.name: _spark_kind(f.dataType) for f in
                   fn(spark, sf_dir).schema.fields}
            for name, fn in entry_mod.queries().items()}


def test_every_oracle_dtype_kind_matches_spark(duck, oracles,
                                               spark_schemas):
    problems = []
    for name, sql in oracles.items():
        kinds = spark_schemas[name]
        pdf = duck.execute(
            f"SELECT * FROM ({sql}) _dtype_probe LIMIT 0").fetchdf()
        for col in pdf.columns:
            dk = _pandas_kind(pdf[col].dtype)
            sk = kinds.get(col, "missing")
            if {dk, sk} <= {"i", "f"} and dk != sk:
                problems.append(
                    f"{name}.{col}: spark={sk} duck={pdf[col].dtype} "
                    f"(uncast HUGEINT/DECIMAL aggregate? add ::BIGINT / "
                    f"::DOUBLE in the oracle)")
    assert not problems, "\n".join(problems)
