"""Client registration + monitoring publishers (T8, A1 outputs).

Re-expresses data_pipeline/registrar.py:33-183 and client.py:170-347
publication sides: clients periodically announce themselves (registration
messages, registration_message_v1.avsc) and publish per-window message
counts (monitoring_message_v1.avsc).  Here both are DataFrame builders the
driver publishes into internal topics on a schedule — on a cluster, a
StreamingQueryListener triggers them per progress event.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# registration_message_v1.avsc (public reference schema) re-stated
REGISTRATION_SCHEMA = {
    "type": "record",
    "name": "registration_message",
    "fields": [
        {"name": "team_name", "type": "string"},
        {"name": "client_name", "type": "string"},
        {"name": "client_type", "type": "string"},  # producer | consumer
        {"name": "timestamp", "type": "long"},  # millis (timestamp-millis)
        {"name": "expected_frequency_seconds", "type": "int"},
        {"name": "schema_id", "type": "int"},
    ],
}

# monitoring_message_v1.avsc re-stated
MONITORING_SCHEMA = {
    "type": "record",
    "name": "monitoring_message",
    "fields": [
        {"name": "topic", "type": "string"},
        {"name": "client_name", "type": "string"},
        {"name": "client_type", "type": "string"},
        {"name": "message_count", "type": "long"},
        {"name": "start_timestamp", "type": "long"},  # 600 s epoch-aligned
        {"name": "host_info", "type": "string"},
    ],
}


def registration_frame(
    spark: SparkSession,
    team_name: str,
    client_name: str,
    client_type: str,
    schema_ids: list[int],
    expected_frequency_seconds: int = 600,  # registrar.py default cadence
) -> DataFrame:
    """One registration row per schema the client touches."""
    now_ms = int(time.time() * 1000)
    return spark.createDataFrame(
        [
            (team_name, client_name, client_type, now_ms, expected_frequency_seconds, s)
            for s in schema_ids
        ],
        "team_name STRING, client_name STRING, client_type STRING, "
        "timestamp LONG, expected_frequency_seconds INT, schema_id INT",
    )


def monitoring_frame(
    window_counts: DataFrame,
    client_name: str,
    client_type: str,
    host_info: str = "spark",
) -> DataFrame:
    """Adapt (topic, window_start, message_count) window counts — batch
    (operators.aggregates.tumbling_window_counts) or streaming
    (streaming.monitor.counts_with_gap_flush) — to the monitoring record
    shape."""
    return window_counts.select(
        F.col("topic"),
        F.lit(client_name).alias("client_name"),
        F.lit(client_type).alias("client_type"),
        F.col("message_count").cast("long"),
        F.col("window_start").cast("long").alias("start_timestamp"),
        F.lit(host_info).alias("host_info"),
    )
