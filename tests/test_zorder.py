"""Z-order layout: row-group pruning measured from actual parquet
min/max statistics (pyarrow), against a ts-linear layout baseline —
plus key correctness (locality + bounds)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pa_pq
import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.session import load_tables
from open_data_pipelines_spark.sinks.layout import zorder_key, zorder_write
from tests.conftest import SF_T2

SF_BENCH = "/root/testdata/sf0.1"


def _touched(path: str, col: str, point) -> tuple[int, int]:
    """(row groups whose [min,max] contain point, total row groups)."""
    hit = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pa_pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            p = point
            if st is not None and getattr(st.min, "tzinfo", None) is not None:
                p = point.replace(tzinfo=st.min.tzinfo)
            if st is None or (st.min <= p <= st.max):
                hit += 1
    return hit, total


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    ev = load_tables(spark, SF_BENCH, register_views=False)["events"].select(
        "event_id", "ts", "user_id", "value"
    )
    zpath, lpath = str(base / "z"), str(base / "linear")
    # INT96 (Spark's default parquet timestamp) carries no row-group
    # stats at all — data skipping on time NEEDS INT64 timestamps
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        zorder_write(
            ev, zpath, ["user_id", "ts"], bits=10, n_files=4, row_group_bytes=128 * 1024
        )
        (
            ev.repartitionByRange(4, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .option("parquet.block.size", str(128 * 1024))
            .parquet(lpath)
        )
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    mid_user = ev.agg(F.expr("percentile_approx(user_id, 0.5)")).first()[0]
    mid_ts = ev.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
    return zpath, lpath, int(mid_user), mid_ts


def test_zorder_preserves_rows(spark, layouts):
    zpath, _, _, _ = layouts
    ev = load_tables(spark, SF_BENCH, register_views=False)["events"]
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert back.select(F.sum("event_id")).first()[0] == ev.select(F.sum("event_id")).first()[0]


def test_zorder_prunes_on_secondary_column(layouts):
    """The point of Z-order: the ts-linear layout cannot prune on
    user_id at all; the z-ordered one must skip a real share of row
    groups for the same point predicate."""
    zpath, lpath, mid_user, _ = layouts
    z_hit, z_total = _touched(zpath, "user_id", mid_user)
    l_hit, l_total = _touched(lpath, "user_id", mid_user)
    assert l_hit == l_total, "linear-by-ts should straddle every group on user_id"
    assert z_total >= 8, "need multiple row groups for pruning to mean anything"
    assert z_hit / z_total <= 0.6


def test_zorder_still_prunes_on_time(layouts):
    """Clustering on two columns keeps (weaker) time locality — and
    both layouts must actually carry ts stats (INT64, not INT96)."""
    zpath, lpath, _, mid_ts = layouts
    z_hit, z_total = _touched(zpath, "ts", mid_ts)
    l_hit, l_total = _touched(lpath, "ts", mid_ts)
    assert l_hit <= 2, "ts-linear layout should prune ts to ~one group"
    assert z_hit / z_total <= 0.6


def test_key_bounds_and_validation(spark, layouts):
    ev = load_tables(spark, SF_BENCH, register_views=False)["events"]
    src, z = zorder_key(ev, ["user_id", "value"], bits=8)
    lo, hi = src.select(F.min(z), F.max(z)).first()
    assert 0 <= lo <= hi < 1 << 16
    with pytest.raises(ValueError):
        zorder_key(ev, ["user_id", "value"], bits=40)
    # missing column: descriptive error, not a KeyError mid-agg
    with pytest.raises(ValueError, match="not in DataFrame"):
        zorder_key(ev, ["user_id", "no_such_col"], bits=8)
    # non-numeric column: would cast to all-null doubles and silently
    # contribute a constant bucket 0 — must fail loudly instead
    with pytest.raises(ValueError, match="non-clusterable"):
        zorder_key(ev.withColumn("name", F.lit("x")), ["user_id", "name"], bits=8)


def test_compaction_with_zorder(spark, tmp_path):
    """OPTIMIZE-style pairing: the compaction rewrite can Z-order rows
    within each retained partition; rows conserved, clustering real."""
    from open_data_pipelines_spark.sinks.writers import compact_partitions

    ev = (
        load_tables(spark, SF_T2, register_views=False)["events"]
        .select("event_id", "ts", "user_id", "value")
        .withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
    )
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    ev.write.partitionBy("year", "month").parquet(src)
    compact_partitions(
        spark, src, dest, target_files_per_partition=1, zorder_cols=("user_id", "ts")
    )
    back = spark.read.parquet(dest)
    assert back.count() == ev.count()
    assert back.select(F.sum("event_id")).first()[0] == ev.select(F.sum("event_id")).first()[0]
    # one file per retained partition
    import glob as g

    for part in g.glob(f"{dest}/year=*/month=*"):
        assert len(g.glob(f"{part}/*.parquet")) == 1


def test_compact_partitions_file_count_knob(spark, tmp_path):
    """target_files_per_partition must actually control files PER
    PARTITION DIRECTORY. The old repartition(N, part_cols) made N the
    TOTAL task count (each directory wholly inside one task -> always
    ~1 file, and N=1 funnelled the whole dataset through one task);
    the salted key spreads each directory over ~N tasks (round-9
    review find)."""
    import glob as g

    from open_data_pipelines_spark.sinks.writers import compact_partitions

    ev = (
        load_tables(spark, SF_T2, register_views=False)["events"]
        .select("event_id", "ts", "user_id", "value")
        .withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
    )
    src = str(tmp_path / "src")
    ev.write.partitionBy("year", "month").parquet(src)

    dest1 = str(tmp_path / "dest1")
    compact_partitions(spark, src, dest1, target_files_per_partition=1)
    for part in g.glob(f"{dest1}/year=*/month=*"):
        assert len(g.glob(f"{part}/*.parquet")) == 1

    dest4 = str(tmp_path / "dest4")
    compact_partitions(spark, src, dest4, target_files_per_partition=4)
    back = spark.read.parquet(dest4)
    assert back.count() == ev.count()
    counts = [
        len(g.glob(f"{part}/*.parquet"))
        for part in g.glob(f"{dest4}/year=*/month=*")
    ]
    # hash collisions can merge salt groups, but most directories must
    # split into more than one file, and none beyond the target
    assert max(counts) > 1
    assert all(c <= 4 for c in counts)
