"""Composed multimodal corpus pipeline: signature reuse, exact +
per-kind near-dup dedup, quarantine policy, funnel counts, manifest."""

from __future__ import annotations

import json
import math
import struct

from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_data_pipelines_spark.operators.media_codecs import encode_bmp, encode_wav
from open_data_pipelines_spark.plans.media_prep import prepare_media_corpus

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _bmp(seed=0, w=16, h=12):
    rgb = bytes(
        (x * 16 + seed) % 256 for _ in range(h) for x in range(w) for _ in range(3)
    )
    return encode_bmp(w, h, rgb)


def _wav(freq=440):
    rate = 8000
    samples = [
        int(0.4 * 32767 * math.sin(2 * math.pi * freq * i / rate))
        for i in range(rate // 2)
    ]
    return encode_wav(rate, 1, 16, struct.pack(f"<{len(samples)}h", *samples))


def _corpus(spark):
    rows = [
        (1, _bmp(seed=0)),
        (2, _bmp(seed=0)),  # byte-identical image re-upload
        (3, _bmp(seed=160)),  # distinct image
        (4, _wav(440)),
        (5, _wav(440)),  # PCM-identical re-encode
        (6, _wav(1900)),  # distinct tone
        (9, b"junk"),  # undecodable
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_prepare_media_corpus_dedups_per_kind_and_quarantines(spark, tmp_path):
    out, stats = prepare_media_corpus(_corpus(spark), with_stats=True)
    rows = out.collect()
    kept = {r["media_id"] for r in rows}
    assert 1 in kept and 2 not in kept  # exact image dup collapsed to min id
    assert 4 in kept and 5 not in kept  # exact audio dup collapsed to min id
    assert {3, 6, 9} <= kept  # distinct media + quarantined junk kept
    assert stats["input"] == 7
    assert stats["quarantined"] == 1
    assert stats["exact_deduped"] == 4
    assert stats["output"] == len(kept)
    # signatures were computed once and carried through
    assert all(r["signature"] is not None for r in rows if r["media_id"] != 9)


def test_prepare_media_corpus_reuses_bronze_signatures(spark):
    """A frame that already carries kind/signature (the streaming
    bronze form) must NOT be re-decoded: feed impossible content bytes
    with precomputed signatures and assert the pipeline trusts them."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("kind", T.StringType()),
            T.StructField("signature", T.LongType()),
        ]
    )
    rows = [
        (1, b"not-decodable", "image", 1111),
        (2, b"not-decodable", "image", 1111),  # same signature -> dup
        (3, b"not-decodable", "audio", 1111),  # same value, other kind: NOT a dup
    ]
    out = prepare_media_corpus(spark.createDataFrame(rows, schema))
    kept = {r["media_id"] for r in out.collect()}
    assert kept == {1, 3}  # cross-kind signatures never collapse


def test_prepare_media_corpus_manifest_and_drop_policy(spark, tmp_path):
    path = str(tmp_path / "media_manifest.json")
    out = prepare_media_corpus(
        _corpus(spark), keep_undecodable=False, manifest_path=path
    )
    kept = {r["media_id"] for r in out.collect()}
    assert 9 not in kept  # drop policy honoured
    m = json.load(open(path))
    assert m["signature"]["rows"] == len(kept)
    assert m["config"]["keep_undecodable"] is False


def test_media_stats_observe_matches_count(spark):
    """Single-pass observe() funnel == per-stage count() funnel
    (VERDICT r7 task #4): one action yields all stage counts."""
    corpus = _corpus(spark)
    out, observed = prepare_media_corpus(corpus, with_stats=True, stats_via="observe")
    _, eager = prepare_media_corpus(corpus, with_stats=True, stats_via="count")
    assert observed == eager
    out.unpersist()


def test_media_stats_observe_matches_count_drop_policy(spark):
    """keep_undecodable=False: the quarantine branch never reaches the
    output plan, so its count must come from the input-side
    conditional observation — not a dangling (forever-blocking)
    observe node."""
    corpus = _corpus(spark)
    out, observed = prepare_media_corpus(
        corpus, with_stats=True, stats_via="observe", keep_undecodable=False
    )
    _, eager = prepare_media_corpus(
        corpus, with_stats=True, stats_via="count", keep_undecodable=False
    )
    assert observed == eager
    assert observed["quarantined"] == 1
    out.unpersist()


def test_media_partial_signature_columns_rejected(spark):
    """Exactly one of kind/signature present: re-signing would append
    a duplicate column (ambiguous downstream) — must fail loud."""
    import pytest

    df = _corpus(spark).withColumn("kind", F.lit("image"))
    with pytest.raises(ValueError, match="signature"):
        prepare_media_corpus(df)


def test_media_stats_via_validated(spark):
    import pytest

    with pytest.raises(ValueError, match="stats_via"):
        prepare_media_corpus(_corpus(spark), with_stats=True, stats_via="bogus")


def test_bronze_nondeterministic_input_checkpoint_optin(spark):
    """ADVICE r9: a bronze-signed frame with NONDETERMINISTIC lineage
    must be able to opt back into the input checkpoint — the
    decodable/quarantine split evaluates the input in two separate
    jobs, and without one frozen materialization a rand()-gated
    signature could land a row in both or neither branch. With
    checkpoint_input=True the split invariant output ∪ quarantine ==
    input holds exactly."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
        ]
    )
    rows = [(i, "image") for i in range(200)]
    # nondeterministic bronze lineage: ~half the signatures NULL per
    # rand() draw. Signatures are xxhash64-spread so Hamming banding
    # never collapses two distinct ids (expected pairwise distance ~32
    # >> max_hamming) — every dropped row would be a SPLIT bug, not a
    # legitimate near-dup.
    df = spark.createDataFrame(rows, schema).withColumn(
        "signature",
        F.when(F.rand() < 0.5, F.xxhash64("media_id")).otherwise(F.lit(None)),
    )
    out, stats = prepare_media_corpus(
        df, with_stats=True, checkpoint_input=True
    )
    kept = [r["media_id"] for r in out.collect()]
    # every input row lands in exactly one branch: unique ids, exact
    # input partition (all signatures here are unique, so dedup keeps
    # every decodable row and quarantine carries the rest)
    assert sorted(kept) == list(range(200))
    assert stats["input"] == 200
    assert stats["quarantined"] + stats["exact_deduped"] == 200
    assert stats["output"] == 200
    out.unpersist()


def test_media_observe_mode_checkpoints_eagerly(monkeypatch, spark):
    """ADVICE r9: in observe-stats mode the input/quarantined
    observations sit below the exact-dedup checkpoint and a LAZY one
    fulfills them only because top1_per_key happens to shuffle —
    media_prep must pass eager=True exactly like corpus_prep (the
    caching.lazy_checkpoint measured rule)."""
    from open_data_pipelines_spark.plans import media_prep as mp

    calls: list[bool] = []
    real = mp.lazy_checkpoint

    def spy(df, eager=False, **kwargs):
        calls.append(eager)
        return real(df, eager=eager, **kwargs)

    monkeypatch.setattr(mp, "lazy_checkpoint", spy)
    out, stats = prepare_media_corpus(
        _corpus(spark), with_stats=True, stats_via="observe"
    )
    out.unpersist()
    # raw-content path: [input decode checkpoint (lazy), exact (eager)]
    assert calls[-1] is True, "exact checkpoint must be eager in observe mode"
    assert stats["input"] == 7  # the observation the eager flag protects

    calls.clear()
    out2, stats2 = prepare_media_corpus(
        _corpus(spark), with_stats=True, stats_via="count"
    )
    out2.unpersist()
    assert calls[-1] is False, "count mode keeps the checkpoint lazy"
    assert stats2["input"] == 7


def test_media_takedown_reissues_manifest(spark, tmp_path):
    """Takedowns are modality-agnostic: retract_and_reissue over the
    media funnel's manifest projection removes the media_id and
    re-signs the stored release record — the same evidence chain the
    text corpus has (round 8)."""
    from open_data_pipelines_spark.operators.retraction import retract_and_reissue

    path = str(tmp_path / "media_manifest.json")
    out = prepare_media_corpus(_corpus(spark), manifest_path=path)
    signed = out.select("media_id", "kind", "signature")

    tomb = spark.createDataFrame([(1,), (424242,)], ["media_id"])  # 1 hit, 1 absent
    new_out, report = retract_and_reissue(signed, tomb, path, id_col="media_id")
    assert report["changed"] is True
    assert report["removed_ids"] == [1]
    assert report["rows_after"] == report["rows_before"] - 1
    kept = {r["media_id"] for r in new_out.collect()}
    assert 1 not in kept
    m = json.load(open(path))
    assert m["signature"]["rows"] == report["rows_after"]
    assert m["retractions"][-1]["removed_ids"] == [1]
    new_out.unpersist()
