from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

SF_SMOKE = "/root/testdata/sf0.001"
# override to run the oracle suite at another scale factor, e.g.
# SPARK_GRAFT_TEST_SF=/root/testdata/sf0.1 (verified green at 0.001/0.01/0.1)
SF_CORRECT = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from data_pipeline_spark.session import get_spark

    # override to prove results are partitioning-independent, e.g.
    # SPARK_GRAFT_TEST_SHUFFLE=3 (oracle suite verified at 3, 8 and 64)
    n = int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "8"))
    s = get_spark("tests", shuffle_partitions=n)
    yield s
    s.stop()


@pytest.fixture(params=["flock", "epoch"])
def lock_backend(request, monkeypatch):
    """Run a coordination-protocol test under BOTH storage backends: the
    POSIX-flock one and the create-if-absent epoch one (the HDFS /
    object-store shape with no flock anywhere).  Env-based so locks built
    deep inside TopicStore / SemanticGatedIngest dispatch too."""
    monkeypatch.setenv("SPARK_GRAFT_LOCK_BACKEND", request.param)
    return request.param


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
