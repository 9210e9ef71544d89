"""Time-range -> partition-prefix enumeration (SURVEY §2.1 S3).

Reference: duo/src/utils.rs:36-181 (`TimePeriod::generate_prefixes`),
spec pinned by its 9 rstest cases (utils.rs:184-266), which
tests/test_pruning.py replicates verbatim.

On Spark this enumeration is NOT needed for correctness or speed:
writing `partitionBy("date","hour","minute")` and filtering on those
columns gives Catalyst partition pruning for free (SURVEY §4). We keep
the explicit enumerator because (a) it pins parity with the reference's
pruning semantics under test, and (b) a multi-path reader can use it to
bound file listing on object stores where listing a huge table's root
is itself expensive (the reference's motivation, partition/query.rs:48-60).

Semantics: start minute floors (seconds ignored), end minute ceils
(any trailing seconds extend the range); a full 0-59 minute span
collapses to the hour prefix, a full 0-23 hour span collapses to the
date prefix.
"""

from __future__ import annotations

from datetime import datetime, timedelta


def _minute_slot(minute: int, granularity: int) -> str | None:
    if minute >= 60:
        return None
    block_start = (minute // granularity) * granularity
    if granularity == 1:
        return f"{block_start:02d}"
    return f"{block_start:02d}-{block_start + granularity - 1:02d}"


def generate_prefixes(start: datetime, end: datetime, granularity: int = 1) -> list[str]:
    """Minimal `date=…/hour=…/minute=…/` prefixes covering [start, end]."""
    assert end > start
    end_minute = end.minute + (1 if (end.second or end.microsecond) else 0)
    return _date_prefixes(
        start.date(),
        end.date(),
        (start.hour, start.minute),
        (end.hour, end_minute),
        granularity,
    )


def _minute_prefixes(prefix: str, start_minute: int, end_minute: int, g: int) -> list[str]:
    if start_minute == end_minute:
        return []
    start_block, end_block = start_minute // g, end_minute // g
    if end_block - start_block >= 60 // g:
        return [prefix]  # whole hour covered
    out = []
    blocks = list(range(start_block, end_block))
    if g > 1:
        blocks.append(end_block)
    for block in blocks:
        slot = _minute_slot(block * g, g)
        if slot is not None:
            out.append(f"{prefix}minute={slot}/")
    return out


def _hour_prefixes(
    prefix: str, start_hour: int, start_minute: int, end_hour: int, end_minute: int, g: int
) -> list[str]:
    if end_hour - start_hour >= 24:
        return [prefix]  # whole day covered
    out = []
    for hour in range(start_hour, min(end_hour, 23) + 1):
        hp = f"{prefix}hour={hour:02d}/"
        is_start, is_end = hour == start_hour, hour == end_hour
        if is_start or is_end:
            out.extend(
                _minute_prefixes(
                    hp,
                    start_minute if is_start else 0,
                    end_minute if is_end else 60,
                    g,
                )
            )
        else:
            out.append(hp)
    return out


def _date_prefixes(start_date, end_date, start_time, end_time, g: int) -> list[str]:
    out = []
    date = start_date
    while date <= end_date:
        prefix = f"date={date.isoformat()}/"
        is_start, is_end = date == start_date, date == end_date
        if is_start or is_end:
            sh, sm = start_time if is_start else (0, 0)
            eh, em = end_time if is_end else (24, 60)
            out.extend(_hour_prefixes(prefix, sh, sm, eh, em, g))
        else:
            out.append(prefix)
        date = date + timedelta(days=1)
    return out
