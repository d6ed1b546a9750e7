"""Timestamp list generation (reference: time/OSHDBTimestamps.java).

`timestamp_list("2000-01-01", "2018-01-01", "P1Y")` → sorted unix seconds,
start + k*period while <= end (the reference's counter loop,
OSHDBTimestamps.java:152-180). Periods: PnY, PnM, PnD, PTnH, PTnM, PTnS
and combinations (e.g. P1Y6M). Calendar-aware like java.time.Period.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta, timezone

_PERIOD_RE = re.compile(
    r"^P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?$"
)


def parse_iso(s: str) -> int:
    """ISO date/datetime → unix seconds (UTC)."""
    s = s.strip().rstrip("Z")
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d", "%Y-%m", "%Y"):
        try:
            return int(
                datetime.strptime(s, fmt).replace(tzinfo=timezone.utc).timestamp()
            )
        except ValueError:
            continue
    raise ValueError(f"unparseable ISO timestamp: {s}")


def _add_period(dt: datetime, years: int, months: int, delta: timedelta) -> datetime:
    y = dt.year + years + (dt.month - 1 + months) // 12
    m = (dt.month - 1 + months) % 12 + 1
    d = min(dt.day, calendar.monthrange(y, m)[1])
    return dt.replace(year=y, month=m, day=d) + delta


def timestamp_list(start: str, end: str | None = None, period: str | None = None) -> list[int]:
    if end is None:
        return [parse_iso(start)]
    if period is None:
        a, b = parse_iso(start), parse_iso(end)
        return sorted({a, b})
    m = _PERIOD_RE.match(period)
    if not m or not any(m.groups()):
        raise ValueError(f"invalid ISO period: {period}")
    yy, mo, wk, dd, hh, mi, ss = (int(g) if g else 0 for g in m.groups())
    delta = timedelta(weeks=wk, days=dd, hours=hh, minutes=mi, seconds=ss)
    t0 = datetime.fromtimestamp(parse_iso(start), tz=timezone.utc)
    t_end = parse_iso(end)
    out = []
    k = 0
    while True:
        # start + k*period (multiplied, not accumulated — java.time semantics)
        cur = _add_period(t0, yy * k, mo * k, delta * k)
        ts = int(cur.timestamp())
        if ts > t_end:
            break
        out.append(ts)
        k += 1
        if k > 1_000_000:
            raise ValueError("period too small / runaway timestamp list")
    return out


def format_iso(ts: int) -> str:
    """unix seconds → ISO 8601 Zulu (ref TimestampFormatter.isoDateTime,
    util/time/TimestampFormatter.java — thread-local UTC formatters; here
    a plain pure function)."""
    return datetime.fromtimestamp(int(ts), tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def format_date(ts: int) -> str:
    """unix seconds → yyyy-MM-dd (ref TimestampFormatter.date)."""
    return datetime.fromtimestamp(int(ts), tz=timezone.utc).strftime("%Y-%m-%d")
