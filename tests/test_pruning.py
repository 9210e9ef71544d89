"""Partition-prefix enumeration parity — replicates the reference's 9
rstest cases verbatim (duo/src/utils.rs:184-266)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from duo_spark.sources.pruning import generate_prefixes


def _dt(s: str) -> datetime:
    return datetime.fromisoformat(s).astimezone(timezone.utc)


@pytest.mark.parametrize(
    ("start", "end", "expected"),
    [
        # same_minute
        ("2022-06-11T16:30:00+00:00", "2022-06-11T16:30:59+00:00",
         ["date=2022-06-11/hour=16/minute=30/"]),
        # same_hour_different_minute
        ("2022-06-11T16:57:00+00:00", "2022-06-11T16:59:00+00:00",
         ["date=2022-06-11/hour=16/minute=57/", "date=2022-06-11/hour=16/minute=58/"]),
        # same_hour_with_00_to_59_minute_block
        ("2022-06-11T16:00:00+00:00", "2022-06-11T16:59:59+00:00",
         ["date=2022-06-11/hour=16/"]),
        # same_date_different_hours_coherent_minute
        ("2022-06-11T15:00:00+00:00", "2022-06-11T17:00:00+00:00",
         ["date=2022-06-11/hour=15/", "date=2022-06-11/hour=16/"]),
        # same_date_different_hours_incoherent_minutes
        ("2022-06-11T15:59:00+00:00", "2022-06-11T16:01:00+00:00",
         ["date=2022-06-11/hour=15/minute=59/", "date=2022-06-11/hour=16/minute=00/"]),
        # same_date_different_hours_whole_hours_between_incoherent_minutes
        ("2022-06-11T15:59:00+00:00", "2022-06-11T17:01:00+00:00",
         ["date=2022-06-11/hour=15/minute=59/", "date=2022-06-11/hour=16/",
          "date=2022-06-11/hour=17/minute=00/"]),
        # different_date_coherent_hours_and_minutes
        ("2022-06-11T00:00:00+00:00", "2022-06-13T00:00:00+00:00",
         ["date=2022-06-11/", "date=2022-06-12/"]),
        # different_date_incoherent_hours_coherent_minutes
        ("2022-06-11T23:00:01+00:00", "2022-06-12T01:59:59+00:00",
         ["date=2022-06-11/hour=23/", "date=2022-06-12/hour=00/", "date=2022-06-12/hour=01/"]),
        # different_date_incoherent_hours_incoherent_minutes
        ("2022-06-11T23:59:59+00:00", "2022-06-12T00:01:00+00:00",
         ["date=2022-06-11/hour=23/minute=59/", "date=2022-06-12/hour=00/minute=00/"]),
    ],
)
def test_prefix_generation(start, end, expected):
    assert generate_prefixes(_dt(start), _dt(end), granularity=1) == expected
