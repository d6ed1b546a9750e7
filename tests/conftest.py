import os
import sys

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVMs small


@pytest.fixture(scope="session")
def spark():
    from oshdb_spark.session import build_session

    s = build_session("oshdb-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
