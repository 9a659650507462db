"""Every catalog query vs its DuckDB oracle at sf0.01 (the driver's t2 tier)."""

from __future__ import annotations

import pytest

import data_pipeline_spark.queries_llm  # noqa: F401  (registers LLM ops)
import data_pipeline_spark.queries_pipeline  # noqa: F401  (registers wire ops)
import data_pipeline_spark.queries_tpch  # noqa: F401  (registers TPC-H shapes)
from data_pipeline_spark.queries import QUERIES
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare_query, register_duck_views

ORACLE_SPECS = [spec for spec in QUERIES.values() if spec.oracle is not None]
ROWS_ONLY_SPECS = [spec for spec in QUERIES.values() if spec.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_match(spark, duck, spec):
    register_duck_views(duck, SF_CORRECT)
    ok, detail = compare_query(spark, duck, spec, SF_CORRECT)
    assert ok, f"{spec.name}: {detail}"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS])
def test_rows_only_runs(spark, spec):
    df = spec.spark(spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
