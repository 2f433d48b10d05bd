"""Catalog run schedule: cron matching, due-set computation, dispatch
isolation (the engine analog of the reference's per-source GitHub
Actions workflows)."""

from __future__ import annotations

from datetime import datetime

import pytest

from open_data_pipelines_spark.plans.schedule import (
    SCHEDULES,
    cron_due,
    due_sources,
    run_due,
)
from open_data_pipelines_spark.sources.catalog import CATALOG


def test_every_scheduled_source_is_catalogued():
    assert set(SCHEDULES) <= set(CATALOG)


def test_cron_exact_minute():
    assert cron_due("0 3 4 * *", datetime(2024, 3, 4, 3, 0))
    assert not cron_due("0 3 4 * *", datetime(2024, 3, 4, 3, 1))
    assert not cron_due("0 3 4 * *", datetime(2024, 3, 5, 3, 0))


def test_cron_step_months():
    # "0 0 1 */2 *" (os_usrn_uprn): every other month from January
    assert cron_due("0 0 1 */2 *", datetime(2024, 1, 1, 0, 0))
    assert not cron_due("0 0 1 */2 *", datetime(2024, 2, 1, 0, 0))
    assert cron_due("0 0 1 */2 *", datetime(2024, 3, 1, 0, 0))


def test_cron_ranges_lists_and_dow():
    assert cron_due("0 9 * * 1-5", datetime(2024, 3, 4, 9, 0))  # Monday
    assert not cron_due("0 9 * * 1-5", datetime(2024, 3, 3, 9, 0))  # Sunday
    assert cron_due("15,45 6 * * *", datetime(2024, 1, 1, 6, 45))
    # POSIX rule: restricted dom AND restricted dow combine with OR
    assert cron_due("0 0 13 * 5", datetime(2024, 9, 13, 0, 0))  # Friday the 13th
    assert cron_due("0 0 13 * 5", datetime(2024, 2, 13, 0, 0))  # 13th, a Tuesday
    assert cron_due("0 0 13 * 5", datetime(2024, 2, 16, 0, 0))  # Friday, not 13th


def test_due_sources_known_instants():
    assert due_sources(datetime(2024, 5, 4, 3, 0)) == ["street_manager"]
    # naptan and geoplace_swa share "30 1 24 * *"
    assert due_sources(datetime(2024, 5, 24, 1, 30)) == ["geoplace_swa", "naptan_data"]
    assert due_sources(datetime(2024, 5, 4, 12, 0)) == []


def test_run_due_dispatches_and_isolates_failures():
    calls: list[tuple] = []

    def ok_runner(spark, name, **kw):
        calls.append((name, kw["year"], kw["month"]))
        return name

    out = run_due(None, datetime(2024, 5, 4, 3, 0), runner=ok_runner, url="u")
    assert out == {"street_manager": "street_manager"}
    assert calls == [("street_manager", 2024, 5)]

    def flaky_runner(spark, name, **kw):
        if name == "geoplace_swa":
            raise ValueError("feed down")
        calls.append((name,))
        return name

    with pytest.raises(RuntimeError, match="geoplace_swa"):
        run_due(None, datetime(2024, 5, 24, 1, 30), runner=flaky_runner)
    # the co-scheduled source still ran despite the failure
    assert ("naptan_data",) in calls
