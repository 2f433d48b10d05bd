"""Scale-up stress run: synthesize an N-fold larger copy of the
harness star schema (key-shifted unions of sf0.1) and run headline
queries on it through the normal ``queries()`` surface.

Evidence for the 100 TB posture: the engine's plans are size-oblivious
(same code path, partitioned scans, AQE), so throughput should scale
roughly linearly with rows on a fixed core count.

    python tools/stress.py [factor] [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

BASE = "/root/testdata/sf0.1"
FACT_KEYS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
}
QUERIES = ["impact_score", "distinct_on", "group_sum", "agg_battery", "scd2_merge", "window_tumbling"]


def build(spark, factor: int, dest: str) -> None:
    from pyspark.sql import functions as F

    from open_data_pipelines_spark.session import TESTDATA_TABLES, load_tables

    tables = load_tables(spark, BASE, register_views=False)
    os.makedirs(dest, exist_ok=True)
    for name in TESTDATA_TABLES:
        df = tables[name]
        out_path = os.path.join(dest, f"{name}.parquet")
        if name in FACT_KEYS:
            shift_cols = FACT_KEYS[name]
            maxes = {c: df.agg(F.max(c)).first()[0] + 1 for c in shift_cols}
            copies = []
            for i in range(factor):
                c = df
                for col in shift_cols:
                    c = c.withColumn(col, F.col(col) + F.lit(i * maxes[col]))
                copies.append(c)
            scaled = copies[0]
            for c in copies[1:]:
                scaled = scaled.unionByName(c)
            scaled.write.mode("overwrite").parquet(out_path)
        else:
            df.write.mode("overwrite").parquet(out_path)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    keep = "--keep" in sys.argv
    dest = f"/tmp/stress_x{factor}"

    import __spark_entry__ as e
    from open_data_pipelines_spark.session import get_spark

    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")

    from open_data_pipelines_spark.session import TESTDATA_TABLES

    complete = all(
        os.path.exists(os.path.join(dest, f"{t}.parquet")) for t in TESTDATA_TABLES
    )
    if not complete:  # partial builds (interrupted runs) are rebuilt
        t0 = time.perf_counter()
        build(spark, factor, dest)
        print(f"built x{factor} dataset in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    qs = e.queries()
    timings = {}
    for name in QUERIES:
        qs[name](spark, dest).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        qs[name](spark, dest).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    print(json.dumps({"factor": factor, "base": "sf0.1", "queries": timings,
                      "total_sec": round(sum(timings.values()), 3)}))
    if not keep:
        shutil.rmtree(dest, ignore_errors=True)


if __name__ == "__main__":
    main()
