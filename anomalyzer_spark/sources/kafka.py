"""Kafka streaming source wiring.

The production ingestion path for the streaming detectors: Kafka topic →
JSON value parsing → the same (keys, ts, value) long format every
``detect_stream``/``resample_stream`` consumer takes. The connector JAR
(``spark-sql-kafka-0-10``) is not shipped in this environment, so the
builder raises a documented ``NotImplementedError`` when the format is
unavailable — the plumbing (options, value parsing, column contract) is
the tested surface (tests/test_streaming.py), and the parse stage is also
exercised against file streams, which share the post-source pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_kafka_json_stream(
    spark: SparkSession,
    *,
    brokers: str,
    topic: str,
    value_schema: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Streaming DataFrame over a Kafka topic of JSON messages.

    ``value_schema`` is a DDL string (e.g. ``"event_id long, ts timestamp,
    event_type string, value double"``). Output: the parsed value columns
    plus ``kafka_ts`` (broker append time) and ``kafka_partition`` —
    feed it straight into ``detect_stream`` with ``ts`` watermarking.

    Raises ``NotImplementedError`` when the Kafka connector is not on the
    classpath (add ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:
    <spark-version>`` on a real cluster).
    """
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # DATA_SOURCE_NOT_FOUND at load()
        raise NotImplementedError(
            "the spark-sql-kafka connector is not on the classpath in this "
            "environment; on a cluster add --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        ) from e
    return raw.select(
        F.from_json(F.col("value").cast("string"), value_schema).alias("_j"),
        F.col("timestamp").alias("kafka_ts"),
        F.col("partition").alias("kafka_partition"),
    ).select("_j.*", "kafka_ts", "kafka_partition")
