"""GTFS multi-table bundle loader (S5).

The reference streams a GTFS ZIP and maps member filenames to nine
warehouse tables (``src/data_processors/bods_timetables.py:58-77``,
templates ``src/data_sources/bods_timetables.py:77-162``, all VARCHAR).
Here: driver-side extract (``zip_source``) then one distributed
all-string CSV read per member -> a dict of DataFrames (the reference's
"namespace of tables"), optionally registered as temp views.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .csv_source import read_csv_bronze
from .zip_source import extract_zip

# member file -> (table name, expected columns) — FIXTURES.md F9
GTFS_TABLES: dict[str, list[str]] = {
    "agency": ["agency_id", "agency_name", "agency_url", "agency_timezone",
               "agency_lang", "agency_phone", "agency_noc"],
    "calendar": ["service_id", "monday", "tuesday", "wednesday", "thursday",
                 "friday", "saturday", "sunday", "start_date", "end_date"],
    "calendar_dates": ["service_id", "date", "exception_type"],
    "feed_info": ["feed_publisher_name", "feed_publisher_url", "feed_lang",
                  "feed_start_date", "feed_end_date", "feed_version"],
    "routes": ["route_id", "agency_id", "route_short_name", "route_long_name",
               "route_type"],
    "shapes": ["shape_id", "shape_pt_lat", "shape_pt_lon", "shape_pt_sequence",
               "shape_dist_traveled"],
    "stops": ["stop_id", "stop_code", "stop_name", "stop_lat", "stop_lon",
              "wheelchair_boarding", "location_type", "parent_station",
              "platform_code"],
    "stop_times": ["trip_id", "arrival_time", "departure_time", "stop_id",
                   "stop_sequence", "stop_headsign", "pickup_type",
                   "drop_off_type", "shape_dist_traveled", "timepoint"],
    "trips": ["route_id", "service_id", "trip_id", "trip_headsign",
              "direction_id", "block_id", "shape_id", "wheelchair_accessible",
              "vehicle_journey_code"],
}


def load_gtfs_bundle(
    spark: SparkSession,
    zip_path: str,
    landing_dir: str,
    register_views: bool = False,
    view_prefix: str = "gtfs_",
    strict: bool = True,
) -> dict[str, DataFrame]:
    """Extract a GTFS ZIP and load each known member as an all-string
    DataFrame keyed by table name. Unknown members are ignored (the
    reference skips unmapped files)."""
    members = extract_zip(zip_path, landing_dir, member_glob="*.txt")
    out: dict[str, DataFrame] = {}
    for path in members:
        table = Path(path).stem
        if table not in GTFS_TABLES:
            continue
        df = read_csv_bronze(spark, path, GTFS_TABLES[table], strict=strict)
        if register_views:
            df.createOrReplaceTempView(f"{view_prefix}{table}")
        out[table] = df
    return out
