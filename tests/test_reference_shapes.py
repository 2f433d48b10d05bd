"""Reference-shaped fixture tests (FIXTURES.md F1/F4/F8): the engine's
operators run over the reference's ACTUAL column names and value
domains — street-works permit events, the Geoplace SWA register, and
Section 58 SCD2 staging — proving a reference user could switch
without renaming their world."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_data_pipelines_spark.functions.cleaning import clean_org_name
from open_data_pipelines_spark.functions.scoring import (
    bucket_label,
    category_score,
    flag_bonus,
    tier_score,
)
from open_data_pipelines_spark.functions.spatial import wkt_point_x, wkt_point_y
from open_data_pipelines_spark.operators.dedup import top1_per_key
from open_data_pipelines_spark.operators.joins import anti_join
from open_data_pipelines_spark.operators.scd2 import scd2_initial_load, scd2_merge

# the reference's actual scoring rubric (impact_scores_england.sql:21-74)
WORK_CATEGORY_SCORES = {
    "Standard": 2.0,
    "Major": 5.0,
    "Minor": 1.0,
    "HS2 (Highway)": 2.0,
    "Immediate - urgent": 4.0,
    "Immediate - emergency": 4.0,
}
TM_TIERS = {  # traffic management tier, NULL -> 0.5
    "road_closure": 2.0,
    "contra_flow": 1.0,
    "lane_closure": 1.0,
    "multi_way_signals": 1.0,
    "two_way_signals": 0.5,
    "give_and_take": 0.0,
}
IMPACT_BUCKETS = [(20.0, "Minimal"), (40.0, "Low"), (60.0, "Moderate"), (80.0, "High")]


def test_f1_permit_events_pipeline(spark):
    rows = [
        # (permit_ref, event_ref, event_type, work_category, work_status_ref,
        #  is_ttro_required, is_traffic_sensitive, traffic_management_type_ref,
        #  actual_start_date_time, works_location_coordinates)
        ("PRN-1", 1, "PERMIT_GRANTED", "Major", "in_progress", "Yes", "No",
         "road_closure", "2024-01-01T10:00:00", "POINT (530100 180200)"),
        ("PRN-1", 2, "WORK_START", "Major", "in_progress", "Yes", "No",
         "road_closure", "2024-01-02T10:00:00", "POINT (530100 180200)"),
        ("PRN-2", 3, "PERMIT_GRANTED", "Standard", "in_progress", "No", "Yes",
         "two_way_signals", "2024-01-03T09:00:00", "POINT (531000 181000)"),
        ("PRN-3", 4, "WORK_STOP", "Minor", "completed", "No", "No",
         None, "2024-01-04T09:00:00", "POINT (532000 182000)"),
        # PRN-2 also completed -> must be anti-joined out of in-progress
        ("PRN-2", 5, "WORK_STOP", "Standard", "completed", "No", "Yes",
         "two_way_signals", "2024-01-05T09:00:00", "POINT (531000 181000)"),
    ]
    cols = [
        "permit_reference_number", "event_reference", "event_type",
        "work_category", "work_status_ref", "is_ttro_required",
        "is_traffic_sensitive", "traffic_management_type_ref",
        "actual_start_date_time", "works_location_coordinates",
    ]
    events = spark.createDataFrame(rows, cols)

    # W1: one row per permit, latest event (reference DISTINCT ON)
    latest = top1_per_key(
        events,
        ["permit_reference_number"],
        [F.col("actual_start_date_time").desc(), F.col("event_reference").desc()],
    )
    assert latest.count() == 3
    assert {
        r["permit_reference_number"]: r["event_type"] for r in latest.collect()
    }["PRN-1"] == "WORK_START"

    # J4: in-progress minus permits that also appear completed
    completed = latest.filter(F.col("work_status_ref") == "completed")
    in_prog = anti_join(
        events.filter(F.col("work_status_ref") == "in_progress"),
        completed.select(F.col("permit_reference_number").alias("c_ref")),
        F.col("permit_reference_number") == F.col("c_ref"),
    )
    assert {r["permit_reference_number"] for r in in_prog.collect()} == {"PRN-1"}

    # X1: the reference's real scoring rubric
    scored = latest.withColumn(
        "impact",
        category_score(F.col("work_category"), WORK_CATEGORY_SCORES)
        + flag_bonus(F.col("is_ttro_required") == "Yes", 0.5)
        + flag_bonus(F.col("is_traffic_sensitive") == "Yes", 0.5)
        + category_score(F.col("traffic_management_type_ref"), TM_TIERS, default=0.5),
    )
    got = {r["permit_reference_number"]: r["impact"] for r in scored.collect()}
    assert got["PRN-1"] == 5.0 + 0.5 + 0.0 + 2.0  # Major + TTRO + road_closure
    assert got["PRN-2"] == 2.0 + 0.0 + 0.5 + 0.5  # Standard + sensitive + signals
    assert got["PRN-3"] == 1.0 + 0.0 + 0.0 + 0.5  # Minor + NULL tm -> default

    # X8: BNG coordinates parse from the reference's WKT strings
    coords = latest.select(
        wkt_point_x("works_location_coordinates").alias("e"),
        wkt_point_y("works_location_coordinates").alias("n"),
    ).collect()
    assert all(100000 <= r["e"] <= 700000 and 0 <= r["n"] <= 1300000 for r in coords)

    # bucketing on a 0-100 scale
    lbl = spark.range(1).select(bucket_label(F.lit(72.0), IMPACT_BUCKETS, "Severe"))
    assert lbl.collect()[0][0] == "High"


def test_f4_swa_register_cleaning(spark):
    swa = spark.createDataFrame(
        [
            ("0116", "LONDON BOROUGH OF CAMDEN", "Active"),
            ("1585", "KENT COUNTY COUNCIL", "Active"),
            ("7377", "PETER", "Inactive"),  # reference fixup case
            ("0001", "CITY OF WESTMINSTER", "Active"),
        ],
        ["swa_code", "account_name", "account_status"],
    )
    cleaned = {r[0]: r[1] for r in swa.select("swa_code", clean_org_name("account_name")).collect()}
    assert cleaned["0116"] == "camden"
    assert cleaned["1585"] == "kent"
    assert cleaned["7377"] == "peterborough"
    # A7: nunique profiling as the reference does for metadata
    actives = swa.filter(F.col("account_status") == "Active").select(
        F.countDistinct("swa_code")
    ).collect()[0][0]
    assert actives == 3


def test_f8_section58_scd2(spark):
    cols = ["section_58_reference_number", "section_58_status", "event_time", "event_reference"]
    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    batch1 = spark.createDataFrame(
        [("S58-A", "proposed", t(1), 1), ("S58-A", "in_force", t(5), 2), ("S58-B", "proposed", t(2), 3)],
        cols,
    )
    dim = scd2_initial_load(
        batch1, "section_58_reference_number", "event_time",
        ["section_58_status"], ["section_58_status"], ["event_reference"],
    )
    batch2 = spark.createDataFrame(
        [("S58-A", "expired", t(20), 4), ("S58-B", "withdrawn", t(1), 5)],  # B is LATE
        cols,
    )
    out = scd2_merge(
        dim, batch2, "section_58_reference_number", "event_time",
        ["section_58_status"], ["section_58_status"], ["event_reference"],
    )
    rows = {(r["section_58_reference_number"], r["is_current"]): r for r in out.collect()}
    assert rows[("S58-A", True)]["section_58_status"] == "expired"
    assert rows[("S58-A", False)]["section_58_status"] == "in_force"
    assert rows[("S58-B", True)]["section_58_status"] == "proposed"  # late event ignored
