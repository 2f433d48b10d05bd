"""Declarative run schedule for the source catalog (SURVEY.md §3.1's
automation layer).

The reference orchestrates its pipelines with one GitHub Actions cron
per source (``.github/workflows/street_manager.yml:4-5`` "0 3 4 * *",
``section_58.yml`` "0 3 3 * *", ``os_usrn_uprn.yml`` "0 0 1 */2 *",
etc.). This module reifies those triggers as data: the same cron
expressions keyed by catalog source name, a dependency-free 5-field
cron matcher, and :func:`run_due` which dispatches the due sources
through :func:`..sources.catalog.run_source` — so the whole fleet can
be driven by any scheduler that can call one function a minute (or an
Airflow/cron wrapper calling it hourly with a window).
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime

# Reference workflow crons, verbatim (minute hour day-of-month month
# day-of-week). nhs_prescriptions has no cron upstream (manual
# workflow_dispatch only) and is deliberately absent here too.
SCHEDULES: dict[str, str] = {
    "street_manager": "0 3 4 * *",
    "section_58": "0 3 3 * *",
    "naptan_data": "30 1 24 * *",
    "os_open_usrn": "30 1 11 * *",
    "os_usrn_uprn": "0 0 1 */2 *",
    "national_statistic_postcode_lookup": "30 1 17 * *",
    "code_point": "30 1 2 * *",
    "bods_timetables": "30 1 25 * *",
    "cadent_gas_underground_pipes": "0 2 20 * *",
    "geoplace_swa": "30 1 24 * *",
}


def _field_matches(field: str, value: int, base: int = 0) -> bool:
    """One cron field against one value: ``*``, ``*/n``, ``a-b``,
    comma lists, and plain numbers."""
    for part in field.split(","):
        if part == "*":
            return True
        if part.startswith("*/"):
            if (value - base) % int(part[2:]) == 0:
                return True
        elif "-" in part:
            lo, hi = part.split("-")
            if int(lo) <= value <= int(hi):
                return True
        elif int(part) == value:
            return True
    return False


def cron_due(expr: str, when: datetime) -> bool:
    """True when a 5-field cron expression fires at ``when`` (minute
    precision; day-of-month and day-of-week combine with OR only when
    both are restricted, matching the POSIX/GHA rule)."""
    minute, hour, dom, month, dow = expr.split()
    if not (
        _field_matches(minute, when.minute)
        and _field_matches(hour, when.hour)
        and _field_matches(month, when.month, base=1)
    ):
        return False
    dom_match = _field_matches(dom, when.day, base=1)
    dow_match = _field_matches(dow, when.isoweekday() % 7)  # cron: 0=Sunday
    if dom != "*" and dow != "*":
        return dom_match or dow_match
    return dom_match and dow_match


def due_sources(when: datetime, schedules: dict[str, str] | None = None) -> list[str]:
    """Catalog source names whose cron fires at ``when`` (sorted for
    deterministic dispatch order)."""
    schedules = SCHEDULES if schedules is None else schedules
    return sorted(name for name, expr in schedules.items() if cron_due(expr, when))


def run_due(
    spark,
    when: datetime,
    runner: Callable | None = None,
    schedules: dict[str, str] | None = None,
    **run_source_kwargs,
) -> dict[str, object]:
    """Dispatch every source due at ``when`` through the catalog.

    ``runner`` defaults to :func:`..sources.catalog.run_source`;
    inject a recorder in tests or a queue-submitter in production.
    Failures are captured per source (one bad feed must not block the
    rest — the reference gets this isolation for free from separate
    workflow files) and re-raised together at the end.
    """
    if runner is None:
        from ..sources.catalog import run_source as runner  # type: ignore[assignment]

    results: dict[str, object] = {}
    failures: dict[str, Exception] = {}
    for name in due_sources(when, schedules):
        try:
            results[name] = runner(
                spark, name, year=when.year, month=when.month, **run_source_kwargs
            )
        except Exception as exc:  # noqa: BLE001 - isolation per source
            failures[name] = exc
    if failures:
        raise RuntimeError(f"scheduled sources failed: {sorted(failures)}") from next(
            iter(failures.values())
        )
    return results
