"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet, then compares row count, sorted column
names, and an order-insensitive value hash (exact — bitwise on floats,
which is what a hash comparison implies). Run before every commit:

    python tools/check_oracle.py [sf_dir] [query ...]
    python tools/check_oracle.py all [query ...]   # sf0.001 + sf0.01 + sf0.1
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        # normalize temporal to ns, ints to int64
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[ns]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    return df


def value_hash(df: pd.DataFrame) -> str:
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(repr(tuple(tup)))
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\x00")
    return h.hexdigest()


def main() -> int:
    arg = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from open_data_pipelines_spark.session import get_spark

    spark = get_spark("check_oracle")
    qs = e.queries()
    oracles = e.oracle_sql()

    if arg == "all":
        # one JVM, three SFs — r3 lesson: some failures (HLL envelopes,
        # AQE plan flips) only show at particular scales
        rc = 0
        for sf in ("0.001", "0.01", "0.1"):
            print(f"=== sf{sf}")
            rc |= check_sf(spark, qs, oracles, f"/root/testdata/sf{sf}", only)
        return rc
    return check_sf(spark, qs, oracles, arg, only)


def check_sf(spark, qs, oracles, sf_dir: str, only: set[str]) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    unknown = set(only or ()) - set(qs)
    if unknown:
        # a misspelled name silently matching nothing printed
        # '0 failures' — a false green from the correctness-gate
        # replica (round-9 review find)
        sys.exit(f"unknown query name(s): {sorted(unknown)} — not in the registry")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {ex}")
            continue
        raw_dtype_mismatch = {
            c: (str(sdf[c].dtype), str(odf[c].dtype))
            for c in sorted(set(sdf.columns) & set(odf.columns))
            if str(sdf[c].dtype) != str(odf[c].dtype)
        }
        if raw_dtype_mismatch:
            print(f"DTYPE {name}: {raw_dtype_mismatch}")
        s, o = canon(sdf), canon(odf)
        problems = []
        if len(s) != len(o):
            problems.append(f"rowcount {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            problems.append(f"columns {list(s.columns)} vs {list(o.columns)}")
        elif value_hash(s) != value_hash(o):
            problems.append("value hash mismatch")
            # show a diff sample
            merged = s.merge(o, how="outer", indicator=True, on=list(s.columns))
            diff = merged[merged["_merge"] != "both"]
            if not diff.empty:
                print(diff.head(6).to_string())
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(s)} rows  ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
