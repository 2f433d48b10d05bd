"""Deterministic sampling/split operators: DuckDB parity (the hash is
cross-engine by construction), determinism under repartitioning, the
nested-sample property, and mix rebalancing arithmetic."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.sampling import (
    assign_split,
    deterministic_sample,
    mix_fractions,
    rebalance_to_mix,
    stratified_sample,
)
from open_data_pipelines_spark.session import load_tables
from tests.conftest import SF_SMOKE

_U = "(('0x' || substr(md5('{seed}' || doc_id::VARCHAR), 1, 15))::BIGINT / 1152921504606846976.0)"


@pytest.fixture(scope="module")
def docs(spark):
    return load_tables(spark, SF_SMOKE, register_views=False)["documents"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'")
    return c


def test_assign_split_matches_duckdb(docs, con):
    got = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs, "doc_id", seed="s1").select("doc_id", "split").collect()
    }
    u = _U.format(seed="s1")
    want = dict(
        con.execute(
            f"SELECT doc_id, CASE WHEN {u} < 0.98 THEN 'train' "
            f"WHEN {u} < 0.99 THEN 'val' ELSE 'test' END FROM documents"
        ).fetchall()
    )
    assert got == want
    # every row labeled, all three labels present at 500 rows is not
    # guaranteed for 1% buckets — but train must dominate
    counts = {s: list(got.values()).count(s) for s in set(got.values())}
    assert counts.get("train", 0) > 0.9 * len(got)


def test_assign_split_stable_under_repartition(docs):
    a = assign_split(docs, "doc_id").select("doc_id", "split").collect()
    b = assign_split(docs.repartition(7), "doc_id").select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_assign_split_rejects_bad_fractions(docs):
    with pytest.raises(ValueError):
        assign_split(docs, "doc_id", splits=(("a", 0.5), ("b", 0.4)))
    with pytest.raises(ValueError):
        assign_split(docs, "doc_id", splits=(("a", -0.1), ("b", 1.1)))


def test_deterministic_sample_nested(docs):
    small = {r[0] for r in deterministic_sample(docs, "doc_id", 0.05, "s").select("doc_id").collect()}
    big = {r[0] for r in deterministic_sample(docs, "doc_id", 0.30, "s").select("doc_id").collect()}
    assert small <= big
    assert len(big) < 500  # actually sampled
    # expected 150 ± binomial noise (sd ~10); generous 5-sigma bound
    assert 100 <= len(big) <= 200


def test_stratified_sample_matches_duckdb(docs, con):
    fr = {"src0": 0.5, "src1": 1.0}
    got = {
        r[0]
        for r in stratified_sample(docs, "source", fr, "doc_id", seed="z")
        .select("doc_id")
        .collect()
    }
    u = _U.format(seed="z")
    want = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM documents WHERE {u} < "
            "CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 1.0 ELSE 0.0 END"
        ).fetchall()
    }
    assert got == want
    assert want, "strata must select something for the parity to be meaningful"
    assert len(want) < 500


def test_stratified_default_keeps_unlisted(docs):
    kept = stratified_sample(docs, "source", {}, "doc_id", default=1.0)
    assert kept.count() == docs.count()
    dropped = stratified_sample(docs, "source", {}, "doc_id", default=0.0)
    assert dropped.count() == 0


def test_mix_fractions_math():
    fr = mix_fractions({"web": 1000, "code": 100}, {"web": 0.5, "code": 0.5})
    # code is the binding stratum: total = min(1000/.5, 100/.5) = 200
    assert fr == {"web": 100 / 1000, "code": 100 / 100}
    with pytest.raises(ValueError):
        mix_fractions({"web": 10}, {"web": 0.0})
    with pytest.raises(ValueError):
        mix_fractions({"web": 10}, {"web": 0.5, "code": 0.5})


def test_rebalance_to_mix_hits_target(docs):
    sources = [r[0] for r in docs.select("source").distinct().collect()]
    assert len(sources) >= 2
    target = {sources[0]: 0.5, sources[1]: 0.5}
    out = rebalance_to_mix(docs, "source", target, "doc_id")
    counts = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert set(counts) <= set(target)
    tot = sum(counts.values())
    assert tot > 0
    for s in counts:
        # expected-proportion sampling: allow binomial noise on small n
        assert abs(counts[s] / tot - 0.5) < 0.2


def test_repeat_factors_math():
    from open_data_pipelines_spark.operators.sampling import repeat_factors

    # web is data-rich (anchor, 1x); code must repeat 5x to reach parity
    fr = repeat_factors({"web": 1000, "code": 200}, {"web": 0.5, "code": 0.5})
    assert fr == {"web": 1.0, "code": 5.0}
    # the epochs cap binds instead of exploding tiny strata
    fr = repeat_factors({"web": 10000, "tiny": 10}, {"web": 0.5, "tiny": 0.5}, epochs_cap=10)
    assert fr["web"] == 1.0 and fr["tiny"] == 10.0
    import pytest as _pt

    with _pt.raises(ValueError):
        repeat_factors({"web": 10}, {"web": 0.5, "code": 0.5})


def test_upsample_to_mix_achieves_target(docs):
    from open_data_pipelines_spark.operators.sampling import upsample_to_mix

    # src0..src19 have 25 docs each; ask for src0 at 4x the share of src1
    out = upsample_to_mix(
        docs, "source", {"src0": 0.8, "src1": 0.2}, "doc_id", epochs_cap=10
    )
    counts = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert set(counts) == {"src0", "src1"}
    assert counts["src1"] == 25  # anchor stratum: kept whole, 1x
    assert counts["src0"] == 100  # exactly 4x (integral factor, no hash part)
    # copies are distinguishable and contiguous per key
    per_key = (
        out.filter(F.col("source") == "src0")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("copy_idx").alias("d"))
        .collect()
    )
    assert all(r["n"] == 4 and r["d"] == 4 for r in per_key)


def test_shuffle_deterministic_is_stable(docs):
    from open_data_pipelines_spark.operators.sampling import shuffle_deterministic

    a = [r["doc_id"] for r in shuffle_deterministic(docs, "doc_id", "s1", partitions=4).select("doc_id").toLocalIterator()]
    b = [r["doc_id"] for r in shuffle_deterministic(docs.repartition(9), "doc_id", "s1", partitions=4).select("doc_id").toLocalIterator()]
    c = [r["doc_id"] for r in shuffle_deterministic(docs, "doc_id", "s2", partitions=4).select("doc_id").toLocalIterator()]
    assert a == b  # same seed -> same global order, any input partitioning
    assert a != c  # different seed -> different order
    assert sorted(a) == sorted(c)  # ... of the same rows
    assert a != sorted(a)  # actually shuffled


def test_temperature_weights_limits_and_composition(spark):
    """T=1 -> natural proportions; large T -> near-uniform; T<1
    sharpens the head; weights feed rebalance_to_mix unchanged."""
    import math

    from open_data_pipelines_spark.operators.sampling import (
        rebalance_to_mix,
        temperature_weights,
    )

    rows = (
        [(i, "web") for i in range(800)]
        + [(i + 1000, "code") for i in range(150)]
        + [(i + 2000, "books") for i in range(50)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source"])

    w1 = temperature_weights(df, "source", 1.0)
    assert abs(w1["web"] - 0.8) < 1e-9 and abs(w1["books"] - 0.05) < 1e-9

    w_hi = temperature_weights(df, "source", 100.0)
    assert max(w_hi.values()) - min(w_hi.values()) < 0.02  # near-uniform

    w_lo = temperature_weights(df, "source", 0.5)
    assert w_lo["web"] > w1["web"]  # sharpened toward the head
    for w in (w1, w_hi, w_lo):
        assert abs(sum(w.values()) - 1.0) < 1e-9

    # composition: a T=2 mix through the existing downsampler moves the
    # realized proportions toward the flattened target
    w2 = temperature_weights(df, "source", 2.0)
    out = rebalance_to_mix(df, "source", w2, "doc_id", seed="t2")
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(got.values())
    # books' natural share is 5%; the T=2 target is ~sqrt-flattened
    # (~15%) — assert direction with binomial slack
    assert got["books"] / total > 0.10
    assert math.isclose(sum(w2.values()), 1.0, rel_tol=1e-9)

    import pytest

    with pytest.raises(ValueError):
        temperature_weights(df, "source", 0.0)


def test_null_keys_are_deterministic_not_dropped(spark):
    """Round-9 review find: unit_hash(NULL) propagated NULL, so
    upsample dropped NULL-key rows entirely (even guaranteed floor
    copies) and assign_split routed them to the LAST split (eval
    contamination by junk rows). NULL keys now hash as one sentinel:
    deterministic, and with a 100%-train split they must land in
    train."""
    from open_data_pipelines_spark.operators.sampling import upsample_to_mix

    df = spark.createDataFrame(
        [(1, "a"), (None, "a"), (2, "b"), (None, "b")],
        "doc_id long, source string",
    )
    up = upsample_to_mix(df, "source", {"a": 0.75, "b": 0.25}, "doc_id")
    # every input row keeps at least its floor copies — the NULL-key
    # rows included (factor >= 1 for both strata here)
    assert up.filter(F.col("doc_id").isNull()).count() >= 2

    labeled = assign_split(
        df, "doc_id", (("train", 0.9999999999), ("test", 1 - 0.9999999999))
    )
    null_splits = {
        r["split"] for r in labeled.filter(F.col("doc_id").isNull()).collect()
    }
    assert null_splits == {"train"}
    # and the label is stable across invocations (pure hash function)
    again = assign_split(
        df, "doc_id", (("train", 0.9999999999), ("test", 1 - 0.9999999999))
    )
    assert sorted(r["split"] for r in labeled.collect()) == sorted(
        r["split"] for r in again.collect()
    )


# the sf0.001 documents table is perfectly uniform (20 sources x 25
# rows), so a binding cap needs a skewed stratum: collapse the
# single-digit sources into one 250-row "head" domain
_HEAD = "CASE WHEN length(source) = 4 THEN 'head' ELSE source END"


def _skewed(docs):
    return docs.withColumn("domain", F.expr(_HEAD))


def test_cap_per_stratum_matches_duckdb(docs, con):
    """Expected-mode cap is a pure function of (seed, key, stratum
    count), so DuckDB reproduces the kept set exactly with a window
    count + the shared hash expression."""
    from open_data_pipelines_spark.operators.sampling import cap_per_stratum

    got = {
        r[0]
        for r in cap_per_stratum(_skewed(docs), "domain", 40, "doc_id", seed="c1")
        .select("doc_id")
        .collect()
    }
    u = _U.format(seed="c1")
    want = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM ("
            f"  SELECT doc_id, COUNT(*) OVER (PARTITION BY {_HEAD}) AS n,"
            f" {u} AS u FROM documents"
            ") WHERE n <= 40 OR u < 40.0 / n"
        ).fetchall()
    }
    assert got == want
    assert 0 < len(want) < docs.count(), "cap must actually bind on some stratum"


def test_cap_per_stratum_invariants(docs):
    """Under-cap strata untouched; kept sets nested in the cap for a
    fixed seed; schema/column order preserved; stable under
    repartitioning; exact mode trims to exactly min(n, cap)."""
    from open_data_pipelines_spark.operators.sampling import cap_per_stratum

    docs = _skewed(docs)
    sizes = {r[0]: r[1] for r in docs.groupBy("domain").count().collect()}
    small_cap, big_cap = 30, 120
    assert any(n > small_cap for n in sizes.values())  # cap binds
    assert any(n <= small_cap for n in sizes.values())  # and spares

    capped = cap_per_stratum(docs, "domain", small_cap, "doc_id", seed="s")
    assert capped.columns == docs.columns
    out_sizes = {r[0]: r[1] for r in capped.groupBy("domain").count().collect()}
    for s, n in sizes.items():
        if n <= small_cap:
            assert out_sizes.get(s, 0) == n  # untouched
        else:
            # expected cap: binomial around small_cap, never above n
            assert 0 < out_sizes.get(s, 0) <= n

    kept_small = {r[0] for r in capped.select("doc_id").collect()}
    kept_big = {
        r[0]
        for r in cap_per_stratum(docs, "domain", big_cap, "doc_id", seed="s")
        .select("doc_id")
        .collect()
    }
    assert kept_small <= kept_big  # monotone in cap (nested property)

    again = {
        r[0]
        for r in cap_per_stratum(docs.repartition(7), "domain", small_cap, "doc_id", seed="s")
        .select("doc_id")
        .collect()
    }
    assert again == kept_small

    exact = cap_per_stratum(docs, "domain", small_cap, "doc_id", seed="s", exact=True)
    exact_sizes = {r[0]: r[1] for r in exact.groupBy("domain").count().collect()}
    assert exact_sizes == {s: min(n, small_cap) for s, n in sizes.items()}
    assert exact.columns == docs.columns

    with pytest.raises(ValueError):
        cap_per_stratum(docs, "source", 0, "doc_id")


def test_cap_per_stratum_null_stratum_rows_travel(spark):
    """A plain equi-join would silently drop NULL-stratum rows; the
    null-safe key caps them like any other stratum (the unit_hash
    NULL-sentinel rule)."""
    from open_data_pipelines_spark.operators.sampling import cap_per_stratum

    df = spark.createDataFrame(
        [(i, None if i < 6 else "a") for i in range(10)],
        "doc_id long, domain string",
    )
    out = cap_per_stratum(df, "domain", 100, "doc_id")  # cap never binds
    assert out.count() == 10  # NULL-domain rows all present
    exact = cap_per_stratum(df, "domain", 2, "doc_id", exact=True)
    sizes = {
        r[0]: r[1] for r in exact.groupBy("domain").count().collect()
    }
    assert sizes == {None: 2, "a": 2}
