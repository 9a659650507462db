"""Relational operator surface (SURVEY.md §2).

Each module maps a family of reference behaviors to idiomatic DataFrame
operators; docstrings cite the reference file:line the semantics come from.
"""

from data_pipeline_spark.operators import (  # noqa: F401
    aggregates,
    bucketing,
    cdc,
    dedup,
    joins,
    ordering,
)
