"""Subprocess worker for the exactly-once retry/speculation tests
(VERDICT r14 #4). Runs in its OWN JVM because task retries need a
``local[N, maxFailures]`` master, which the shared test session does
not use (plain ``local[N]`` fails the job on the first task failure).

Modes (argv[1]), all writing machine-readable results to argv[2]:

- ``local_before``  — a write task dies AFTER its tar bytes are
  written but BEFORE any shard publish (attempt 0 only). The retry
  must publish exactly once; the first attempt's uuid-tmp files stay
  orphaned but dot-prefixed (reader-invisible).
- ``local_after``   — the task dies AFTER publishing its first shard
  (the zombie/speculative-twin shape: a publish that Spark will
  discard and re-run). The retry re-publishes over it; consistency
  holds because shard assignment + in-shard order are deterministic.
- ``remote_after``  — same zombie shape through the recording mock
  object store (atomic-at-close route, no renames).
- ``index_retry``   — a parquet write task inside
  ``commit_generation``'s write_fn dies once; the committed
  generation must read back exactly, one generation, _SUCCESS marker
  present.

The injector proves it fired by touching a marker file before
raising — a vacuous run (injection never reached) fails the test.
"""

from __future__ import annotations

import hashlib
import json
import os
import posixpath
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class FailOnce:
    """Raise on attempt 0 of EVERY task at one phase (each task dies
    once, each retry must win); picklable. Fires for all partitions
    because shard-id -> partition is a hash, so any single pinned
    partition can be empty and make the injection vacuous."""

    def __init__(self, phase: str, marker: str):
        self.phase = phase
        self.marker = marker

    def __call__(self, ctx, phase, sid):
        if phase != self.phase:
            return
        if ctx.attemptNumber() == 0:
            with open(self.marker, "a") as fh:
                fh.write(f"p{ctx.partitionId()} {phase} sid={sid}\n")
            raise RuntimeError(f"injected {phase} failure (attempt 0)")


class FailingMap:
    """mapInPandas fn for the index mode: passthrough that dies once
    on attempt 0 of partition 0."""

    def __init__(self, marker: str):
        self.marker = marker

    def __call__(self, batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            with open(self.marker, "w") as fh:
                fh.write("index map attempt 0\n")
            raise RuntimeError("injected index write failure (attempt 0)")
        yield from batches


def _sample_df(spark, n=200):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
        F.concat(F.lit("text for "), F.col("id").cast("string")).alias("text"),
        F.to_json(F.struct(F.col("id"))).alias("meta"),
    )


def run_wds(
    spark, out_dir: str, uri: str, phase: str, marker: str, read_uri=None
) -> dict:
    from open_data_pipelines_spark.sinks.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    df = _sample_df(spark)
    manifest = write_webdataset(
        df,
        uri,
        "key",
        {"text": "txt", "meta": "json"},
        n_shards=8,
        fault_injector=FailOnce(phase, marker),
    )
    # manifest vs the actual on-disk bytes, shard by shard
    shard_checks = []
    listed = set()
    for sh in manifest["shards"]:
        p = os.path.join(out_dir, sh["path"])
        data = open(p, "rb").read()
        listed.add(sh["path"])
        shard_checks.append(
            {
                "shard": sh["shard"],
                "bytes_match": len(data) == sh["bytes"],
                "sha_match": hashlib.sha256(data).hexdigest() == sh["sha256"],
            }
        )
    # directory hygiene: every non-manifest, non-listed file must be
    # reader-invisible (dot-prefixed orphan tmp of the killed attempt)
    extras = [
        name
        for name in os.listdir(out_dir)
        if name not in listed
        and name not in ("manifest.json", "__ops.log")
        and not name.startswith(".")
    ]
    # the reader refuses factory-claimed schemes by design (JVM
    # binaryFile cannot see them) — remote mode reads the mock's local
    # backing dir, exactly how a real deployment reads s3a:// shards
    # the python-side factory wrote
    back = read_webdataset(spark, read_uri or uri)
    rows = {
        r["sample_key"]: (bytes(r["text"]).decode(), bytes(r["meta"]).decode())
        for r in back.collect()
    }
    expected = {
        f"k{i}": (f"text for {i}", json.dumps({"id": i}, separators=(",", ":")))
        for i in range(200)
    }
    return {
        "n_samples": manifest["n_samples"],
        "shard_checks": shard_checks,
        "all_bytes_match": all(c["bytes_match"] for c in shard_checks),
        "all_sha_match": all(c["sha_match"] for c in shard_checks),
        "visible_extras": extras,
        "roundtrip_exact": rows == expected,
        "n_read": len(rows),
        "injector_fired": os.path.exists(marker),
    }


def run_index(spark, base: str, marker: str) -> dict:
    from open_data_pipelines_spark.operators.index_commit import (
        commit_generation,
        read_index,
    )

    df = _sample_df(spark)

    def write_fn(gen_dir: str) -> None:
        df.repartition(4).mapInPandas(
            FailingMap(marker), df.schema
        ).write.mode("overwrite").parquet(gen_dir)

    gen_dir = commit_generation(spark, base, write_fn)
    back = {r["key"]: r["text"] for r in read_index(spark, base).collect()}
    expected = {f"k{i}": f"text for {i}" for i in range(200)}
    gens = [n for n in os.listdir(base) if n.startswith("gen-")]
    return {
        "roundtrip_exact": back == expected,
        "n_read": len(back),
        "one_generation": gens == [posixpath.basename(gen_dir)],
        "success_marker": os.path.exists(os.path.join(gen_dir, "_SUCCESS")),
        "injector_fired": os.path.exists(marker),
    }


def main() -> None:
    mode, out_json, work = sys.argv[1], sys.argv[2], sys.argv[3]
    marker = os.path.join(work, "injector.fired")

    from open_data_pipelines_spark.session import get_spark

    # 3 attempts per task: attempt 0 dies by injection, attempt 1 wins
    spark = get_spark(
        f"wds-retry-{mode}", master="local[4, 3]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")

    ds = os.path.join(work, "ds")
    if mode == "local_before":
        result = run_wds(spark, ds, ds, "before_publish", marker)
    elif mode == "local_after":
        result = run_wds(spark, ds, ds, "after_publish", marker)
    elif mode == "remote_after":
        os.environ["SPARK_GRAFT_WDS_FS_FACTORY"] = "tests.wds_mock_fs:factory"
        uri = f"mockremote://{work}!ds"
        os.makedirs(ds, exist_ok=True)
        result = run_wds(spark, ds, uri, "after_publish", marker, read_uri=ds)
    elif mode == "index_retry":
        result = run_index(spark, ds, marker)
    else:
        raise SystemExit(f"unknown mode {mode}")

    with open(out_json, "w") as fh:
        json.dump(result, fh)
    spark.stop()


if __name__ == "__main__":
    main()
