"""Vectorized Monte-Carlo kernel for the permutation tests.

The four permutation-based tests (diff, highrank, lowrank, bootstrap-ks —
/root/reference/algorithms.go:105-205, 290-309) are not expressible as
closed-form SQL, so they run as ONE Arrow-batched ``pandas_udf`` over the
per-key tail-window array. The per-key payload is tiny (act+ref points,
default perm_count=500), so kernel cost is O(perm_count · n log n) ≈
microseconds per key; parallelism comes from the number of keys — the
100 TB axis (SURVEY.md §2.5, §4.3).

The kernel shares its math with the NumPy oracle (``anomalyzer_spark.oracle``)
— oracle and engine are literally the same code, seeded identically from
``crc32(key)``, so batch results are reproducible and testable.

Design note: this is a scalar ``pandas_udf`` over an already-aggregated
array column, NOT ``applyInPandas`` — the groupBy that built the arrays is
the only shuffle, and the UDF then rides the same partitioning (no second
exchange, plain Arrow batch transfer).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from .. import oracle
from ..config import AnomalyzerConf

MC_METHODS = ("diff", "highrank", "lowrank", "ks")

_RESULT_TYPE = StructType(
    [StructField(m, DoubleType(), nullable=True) for m in MC_METHODS]
)


def mc_probs_udf(conf: AnomalyzerConf, methods: tuple[str, ...]):
    """Build a pandas UDF computing the requested MC probs.

    Signature: (vec array<double>, kseed bigint) -> struct<diff,highrank,
    lowrank,ks double>. Methods not requested come back NULL (and cost
    nothing).
    """
    want = tuple(m for m in MC_METHODS if m in methods)

    @F.pandas_udf(_RESULT_TYPE)
    def _kernel(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.DataFrame]:
        for vecs, seeds in it:
            out = {m: [] for m in MC_METHODS}
            for vec, kseed in zip(vecs, seeds):
                v = np.asarray(vec, dtype=np.float64)
                ks = int(kseed)
                for m in MC_METHODS:
                    if m not in want:
                        out[m].append(None)
                    elif m == "diff":
                        out[m].append(oracle.diff_test(v, conf, ks))
                    elif m == "highrank":
                        out[m].append(oracle.rank_test(v, conf, ks, reverse=False))
                    elif m == "lowrank":
                        out[m].append(oracle.rank_test(v, conf, ks, reverse=True))
                    else:
                        out[m].append(oracle.bootstrap_ks_test(v, conf, ks))
            yield pd.DataFrame(out, dtype="float64")

    return _kernel


def key_seed_col(key_cols: list[str]) -> Column:
    """crc32 of the '|'-joined key string — matches ``oracle.key_seed``."""
    return F.crc32(
        F.concat_ws("|", *[F.col(k).cast("string") for k in key_cols]).cast("binary")
    )
