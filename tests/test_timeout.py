"""Query timeout + cancellation (reference O14 parity)."""

from __future__ import annotations

import time

import pytest

from oshdb_spark.session import QueryTimeout, run_with_timeout


def test_fast_query_completes(spark):
    out = run_with_timeout(
        spark, lambda: spark.range(1000).count(), seconds=60
    )
    assert out == 1000


def test_slow_query_cancelled(spark):
    def slow():
        # ~forever without cancellation: cartesian of two big ranges
        return (
            spark.range(0, 200_000, 1, 4)
            .crossJoin(spark.range(0, 200_000, 1, 4))
            .selectExpr("count(*)")
            .collect()
        )

    t0 = time.time()
    with pytest.raises(QueryTimeout):
        run_with_timeout(spark, slow, seconds=5)
    assert time.time() - t0 < 60  # cancelled promptly, not run to completion
