"""Driver-session robustness: the driver calls ``queries()`` with a
SparkSession the engine did NOT build, from a process whose OS zone is
not UTC. ``session.load_tables`` must inject everything the queries
need at runtime (nanos-as-long parquet conf, UTC session timezone) —
round 1's biggest failure mode, pinned here as a subprocess test with
``TZ=America/New_York`` and a plain ``SparkSession.builder``.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)

# timestamp-heavy sample: every one of these crashes or drifts if the
# nanos conf or UTC session TZ is missing from a driver-built session
SAMPLE = ["window_tumbling", "session_agg", "date_math", "asof_join", "audit_ts"]

SCRIPT = f"""
import sys
sys.path.insert(0, {REPO!r})
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .appName("driver-sim")
    .getOrCreate()
)
import __spark_entry__ as e

sf = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {{t}} AS SELECT * FROM '{{sf}}/{{t}}.parquet'")

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    # NULL-safe: NaN != NaN would fail tuple equality on NULL doubles
    df = df.astype(object).where(pd.notna(df), None)
    return sorted(map(tuple, df.itertuples(index=False)), key=repr)

assert len(e.entry(spark).collect()) > 0, "entry() empty under driver session"
for name in {SAMPLE!r}:
    sdf = e.queries()[name](spark, sf).toPandas()
    odf = con.execute(e.oracle_sql()[name]).fetchdf()
    assert canon(sdf) == canon(odf), f"{{name}} drifted under driver session"
print("DRIVER_SIM_OK")
"""


def test_queries_survive_plain_session_and_foreign_tz():
    env = dict(os.environ, TZ="America/New_York")
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=REPO,
    )
    assert "DRIVER_SIM_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
