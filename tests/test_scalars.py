"""Scalar function tests: namespace codec, redaction, canonical JSON."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_spark.functions import scalars


def test_parse_namespace(spark):
    df = spark.createDataFrame(
        [("prod.us-west.main.transformed.v2",), ("dev.local.testdb",)], "ns STRING"
    ).select(scalars.parse_namespace("ns").alias("p"))
    rows = df.collect()
    assert rows[0].p.environment == "prod"
    assert rows[0].p.cluster == "us-west"
    assert rows[0].p.database == "main"
    assert rows[0].p.suffixes == ["transformed", "v2"]
    assert rows[1].p.suffixes == []


def test_redact(spark):
    df = spark.createDataFrame([("secret",), (None,)], "v STRING").select(
        scalars.redact("v").alias("r")
    )
    assert [r.r for r in df.collect()] == ["<string>", None]


def test_row_json_sorts_keys(spark):
    df = spark.createDataFrame([(1, "x")], "b INT, a STRING").select(
        scalars.row_json(["b", "a"]).alias("j")
    )
    assert df.collect()[0].j == '{"a":"x","b":1}'
