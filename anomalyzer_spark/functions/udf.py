"""SQL-callable detector surface.

The reference's ``Algorithms`` map is an extension point: any
``func(Vector, Conf) float64`` plugs in (/root/reference/algorithms.go:9-21).
Here the equivalent ad-hoc surface is a registered SQL function over an
ordered value array, so ``spark.sql`` users can score windows without the
DataFrame API:

    SELECT series_id, anomaly_prob(vec, series_id) AS prob
    FROM (SELECT series_id, collect_sorted_tail(...) AS vec ...)

Registration binds a validated ``AnomalyzerConf`` (configs are plan-time
constants, never per-row) — register multiple names for multiple configs.
The kernel is the same hash-permutation NumPy implementation as
batch/streaming, so all three surfaces agree bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .. import oracle
from ..config import AnomalyzerConf


def register_anomaly_prob(
    spark: SparkSession,
    conf: AnomalyzerConf | None = None,
    name: str = "anomaly_prob",
) -> None:
    """Register ``name(vec array<double>, key string) -> double``.

    ``vec`` must be the per-key tail window in ascending time order (the
    caller owns ordering/truncation — e.g. via ``tail_window``); ``key``
    keys the Monte-Carlo permutation streams per series (pass the series
    id / '|'-joined key string; the same key reproduces the same prob).
    """
    conf = conf or AnomalyzerConf()

    @F.pandas_udf(DoubleType())
    def _prob(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for vecs, keys in it:
            out = [
                oracle.eval_prob(np.asarray(v, dtype=np.float64), conf, str(k))
                for v, k in zip(vecs, keys)
            ]
            yield pd.Series(out, dtype="float64")

    spark.udf.register(name, _prob)
