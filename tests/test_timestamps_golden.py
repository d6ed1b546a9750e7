"""OSHDBTimestampsTest port (oshdb-util/src/test/.../time/
OSHDBTimestampsTest.java:16-78): every Interval enum member, with the
reference's own expected series — including the java.time month-end
clamping cases (Jan 31 + 1 month = Feb 29 in a leap year, + 1 quarter =
Apr 30) that a naive seconds-delta generator gets wrong."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from oshdb_spark.api.timestamps import timestamp_list

CASES = [
    # (start, end, ISO period ≙ Interval, expected series)
    ("2008-01-31T12:34:56", "2010-01-31T12:34:56", "P1Y",
     ["2008-01-31T12:34:56", "2009-01-31T12:34:56", "2010-01-31T12:34:56"]),
    ("2008-01-31T12:34:56", "2008-07-31T12:34:56", "P3M",
     ["2008-01-31T12:34:56", "2008-04-30T12:34:56", "2008-07-31T12:34:56"]),
    ("2008-01-31T12:34:56", "2008-03-31T12:34:56", "P1M",
     ["2008-01-31T12:34:56", "2008-02-29T12:34:56", "2008-03-31T12:34:56"]),
    ("2008-01-31T12:34:56", "2008-02-14T12:34:56", "P1W",
     ["2008-01-31T12:34:56", "2008-02-07T12:34:56", "2008-02-14T12:34:56"]),
    ("2008-01-31T12:34:56", "2008-02-02T12:34:56", "P1D",
     ["2008-01-31T12:34:56", "2008-02-01T12:34:56", "2008-02-02T12:34:56"]),
    ("2008-01-31T12:34:56", "2008-01-31T15:00:00", "PT1H",
     ["2008-01-31T12:34:56", "2008-01-31T13:34:56", "2008-01-31T14:34:56"]),
]


@pytest.mark.parametrize("start,end,period,expected", CASES,
                         ids=[c[2] for c in CASES])
def test_time_intervals(start, end, period, expected):
    got = [
        datetime.fromtimestamp(t, tz=timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
        for t in timestamp_list(start, end, period)
    ]
    assert got == expected


def test_timestamp_formatter():
    """TimestampFormatterTest port (util/time/TimestampFormatterTest.java
    :18-44): the reference's exact expected strings."""
    from oshdb_spark.api.timestamps import format_date, format_iso

    assert format_date(1510052557) == "2017-11-07"
    assert format_iso(1510052557) == "2017-11-07T11:02:37Z"
    # round-trip with the parser
    from oshdb_spark.api.timestamps import parse_iso

    assert parse_iso(format_iso(1510052557)) == 1510052557
