"""Executor-side ZIP decompression (the many-zips backfill scale path):
binaryFile + mapInPandas must produce exactly what the driver-side
landing path produces on the same archives."""

from __future__ import annotations

import json
import zipfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_data_pipelines_spark.sources.zip_source import (
    extract_zip,
    read_zip_csv_distributed,
    zip_lines_distributed,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_reference", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _make_fleet(tmp_path, n_zips=3, rows_per=50):
    fleet = tmp_path / "fleet"
    fleet.mkdir()
    for z in range(n_zips):
        with zipfile.ZipFile(fleet / f"drop_{z:02d}.zip", "w") as zf:
            events = "\n".join(
                json.dumps(
                    {"event_reference": z * rows_per + i, "event_type": f"T{i % 3}"}
                )
                for i in range(rows_per)
            )
            zf.writestr(f"permits_{z}.json", "\ufeff" + events)
            csv = "id,name\n" + "\n".join(f"{z * rows_per + i},n{i}" for i in range(rows_per))
            zf.writestr(f"data_{z}.csv", csv)
    return fleet


def test_zip_lines_distributed_matches_landing_path(spark, tmp_path):
    fleet = _make_fleet(tmp_path)
    lines = zip_lines_distributed(spark, f"file://{fleet}/*.zip", "*.json")
    # JVM-side parse: from_json on the line column, schema declared
    parsed = lines.select(
        F.from_json("line", EVENT_SCHEMA).alias("e"), "zip_path", "member"
    ).select("e.event_reference", "e.event_type", "zip_path", "member")
    got = {r["event_reference"]: r["event_type"] for r in parsed.collect()}

    # driver-side landing path on the same archives
    members: list[str] = []
    for z in sorted(fleet.glob("*.zip")):
        members += extract_zip(str(z), str(tmp_path / "landing"), "*.json")
    expect_df = spark.read.schema(EVENT_SCHEMA).json([f"file://{m}" for m in members])
    expect = {r["event_reference"]: r["event_type"] for r in expect_df.collect()}

    assert got == expect and len(got) == 150
    assert parsed.filter(F.col("event_reference").isNull()).count() == 0  # BOM stripped
    # one archive = one provenance value per member
    assert parsed.select("zip_path").distinct().count() == 3


def test_read_zip_csv_distributed_sniffed_and_declared(spark, tmp_path):
    fleet = _make_fleet(tmp_path)
    glob = f"file://{fleet}/*.zip"

    sniffed = read_zip_csv_distributed(spark, glob, "*.csv")
    assert sniffed.columns == ["id", "name"]
    assert [f.dataType.simpleString() for f in sniffed.schema.fields] == ["string", "string"]
    assert sniffed.count() == 150
    assert sniffed.filter(F.col("id") == "120").count() == 1

    declared = read_zip_csv_distributed(spark, glob, "*.csv", columns=["id", "name"])
    assert sorted(r["id"] for r in declared.collect()) == sorted(
        r["id"] for r in sniffed.collect()
    )
