"""SQL surface: registered anomaly_prob must equal detect() and the oracle."""

import numpy as np
import pytest

from anomalyzer_spark import AnomalyzerConf, oracle
from anomalyzer_spark.functions.udf import register_anomaly_prob


def test_anomaly_prob_sql(spark):
    conf = AnomalyzerConf(active_size=1, n_seasons=4, perm_count=100,
                          methods=("magnitude", "ks", "cdf"))
    register_anomaly_prob(spark, conf, "anomaly_prob_t")
    vec = [0.1, 2.05, 1.5, 2.5, 2.55]
    row = spark.sql(
        "SELECT anomaly_prob_t(array({}), 'series7') AS p".format(
            ",".join(f"{v}D" for v in vec))
    ).collect()[0]
    exp = oracle.eval_prob(np.asarray(vec), conf, "series7")
    assert row["p"] == pytest.approx(exp, abs=1e-15)


def test_anomaly_prob_over_grouped_view(spark, sf_dir):
    from anomalyzer_spark import detect
    from anomalyzer_spark.sources import load_table

    conf = AnomalyzerConf(active_size=2)
    register_anomaly_prob(spark, conf, "anomaly_prob_g")
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("ev_udf_test")
    got = {
        r["event_type"]: r["p"]
        for r in spark.sql(f"""
            WITH tails AS (
              SELECT event_type,
                     slice(array_sort(collect_list(struct(ts_ns, event_id, value))),
                           -{conf.window_size}, {conf.window_size}).value AS vec
              FROM ev_udf_test GROUP BY event_type)
            SELECT event_type,
                   anomaly_prob_g(vec, event_type) AS p
            FROM tails""").collect()
    }
    exp = {
        r["event_type"]: r["prob"]
        for r in detect(ev, ["event_type"], "ts_ns", "value", conf,
                        tiebreak_cols=["event_id"]).collect()
    }
    assert got == exp
