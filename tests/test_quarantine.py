"""Corrupt-record quarantine: CSV and JSON splits are exact (clean +
quarantined == input lines), the quarantine parquet is replayable and
attributed to its source file, and the reject count hits the K7 log."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_data_pipelines_spark.sources.quarantine import (
    quarantined_ingest,
    read_with_quarantine,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)

CSV_GOOD = ["1,alpha,10.5", "2,beta,20.25", "3,gamma,0.0"]
CSV_BAD = ["4,delta,not-a-number", "oops,epsilon,1.0"]

JSON_GOOD = ['{"id": 1, "name": "alpha", "amount": 10.5}']
JSON_BAD = ['{"id": 2, "name": "beta", "amount": ', "not json at all"]


def test_csv_split_exact(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("\n".join(["id,name,amount"] + CSV_GOOD + CSV_BAD) + "\n")
    clean, quar = read_with_quarantine(
        spark, str(src), SCHEMA, fmt="csv", options={"header": "true"}
    )
    assert clean.count() == len(CSV_GOOD)
    assert clean.columns == ["id", "name", "amount"]
    assert {r["id"] for r in clean.collect()} == {1, 2, 3}
    bad = quar.collect()
    assert len(bad) == len(CSV_BAD)
    assert {r["corrupt_record"] for r in bad} == set(CSV_BAD)
    assert all(r["source_file"].endswith("in.csv") for r in bad)


def test_json_split_exact(spark, tmp_path):
    src = tmp_path / "in.json"
    src.write_text("\n".join(JSON_GOOD + JSON_BAD) + "\n")
    clean, quar = read_with_quarantine(spark, str(src), SCHEMA, fmt="json")
    assert clean.count() == len(JSON_GOOD)
    assert quar.count() == len(JSON_BAD)


def test_quarantined_ingest_logs_and_replays(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("\n".join(["id,name,amount"] + CSV_GOOD + CSV_BAD) + "\n")
    qpath, lpath = str(tmp_path / "dead_letter"), str(tmp_path / "logs")
    clean, n_bad = quarantined_ingest(
        spark,
        str(src),
        SCHEMA,
        qpath,
        options={"header": "true"},
        log_path=lpath,
        table_name="toy_feed",
    )
    assert n_bad == len(CSV_BAD)
    # dead letter is replayable raw lines with provenance
    dead = spark.read.parquet(qpath)
    assert dead.count() == n_bad
    assert set(dead.columns) == {"corrupt_record", "source_file", "quarantined_at"}
    # K7 audit row carries the reject count
    logs = spark.read.parquet(lpath).filter(F.col("processor_type") == "quarantine")
    row = logs.collect()[0]
    assert row["rows_processed"] == n_bad
    assert row["table_name"] == "toy_feed"
    assert row["status"] == "SUCCESS"


def test_all_clean_writes_no_quarantine(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("\n".join(["id,name,amount"] + CSV_GOOD) + "\n")
    qpath = str(tmp_path / "dead_letter")
    clean, n_bad = quarantined_ingest(
        spark, str(src), SCHEMA, qpath, options={"header": "true"}
    )
    assert n_bad == 0
    assert clean.count() == len(CSV_GOOD)
    import os

    assert not os.path.exists(qpath)
