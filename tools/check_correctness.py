"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry through Spark AND its ``oracle_sql()`` through
DuckDB at the given scale factor, then compares row count, column names, and
values (order-insensitive: both frames sorted by all columns). Exact match
required — floats were already rounded identically on both sides by design.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from anomalyzer_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        a, b = s[c], d[c]
        # Driver-faithful: the driver hashes serialized values, so int64 123
        # vs float64 123.0 is a hash MISMATCH even though the values are
        # numerically equal.  Flag dtype-kind disagreement instead of
        # coercing it away (the round-7/8 text_pipeline failure mode).
        ka, kb = a.dtype.kind, b.dtype.kind
        if ka != kb and {ka, kb} <= {"i", "u", "f"}:
            problems.append(
                f"col {c}: dtype kind mismatch spark={a.dtype} duck={b.dtype}"
                " (driver value-hash would fail even if values are equal)")
            continue
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = a.astype(float)
            b = b.astype(float)
            bad = ~((a.isna() & b.isna()) | (a == b))
            if bad.any():
                i = bad.idxmax()
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                    f"spark={a[i]!r} duck={b[i]!r} diff={a[i]-b[i]!r}")
        else:
            av, bv = a.astype(object), b.astype(object)
            bad = ~((a.isna() & b.isna()) | (av == bv))
            if bad.any():
                i = bad.idxmax()
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                    f"spark={av[i]!r} duck={bv[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-dependent oracle constants (ivf_topk centroids) must fit on the
    # SAME scale factor the comparison runs at: pass sf_dir explicitly (the
    # documented contract); the env var stays only as a fallback for
    # callers that cannot pass it (the driver's own runner)
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark("correctness-check")
    con = duck_con(sf_dir)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql(sf_dir=sf_dir)
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS-ONLY"
            print(f"{status:9s} {name}: {len(spark_pdf)} rows "
                  f"(no oracle; schema={sorted(spark_pdf.columns)})")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: " + "; ".join(problems[:4]))
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows match")
    spark.stop()
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
