from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spamscope_spark.config import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="spamscope-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra={"spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield s
    s.stop()


@pytest.fixture()
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
