"""Streaming media ingest: signature-on-arrival, exact-signature
watermark dedup across drops, undecodable passthrough, and the batch
near-dup compaction over bronze."""

from __future__ import annotations

import math
import struct
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_data_pipelines_spark.operators.media_codecs import encode_bmp, encode_wav
from open_data_pipelines_spark.streaming.media_stream import (
    stream_media_to_bronze,
    with_media_signature,
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _bmp(seed=0, w=16, h=12):
    rgb = bytes((x * 16 + seed) % 256 for _ in range(h) for x in range(w) for _ in range(3))
    return encode_bmp(w, h, rgb)


def _wav(freq=440):
    rate = 8000
    samples = [int(0.4 * 32767 * math.sin(2 * math.pi * freq * i / rate)) for i in range(rate // 2)]
    return encode_wav(rate, 1, 16, struct.pack(f"<{len(samples)}h", *samples))


def test_with_media_signature_dispatches_by_kind(spark):
    df = spark.createDataFrame(
        [(1, _bmp()), (2, _wav()), (3, b"garbage")], MEDIA_SCHEMA
    )
    got = {r["media_id"]: (r["kind"], r["signature"]) for r in with_media_signature(df).collect()}
    assert got[1][0] == "image" and got[1][1] is not None
    assert got[2][0] == "audio" and got[2][1] is not None
    assert got[3] == (None, None)


def test_stream_media_dedup_across_drops(spark):
    landing = tempfile.mkdtemp(prefix="media_landing_")
    bronze = tempfile.mkdtemp(prefix="media_bronze_") + "/media"
    ckpt = tempfile.mkdtemp(prefix="media_ckpt_")

    drop1 = [(1, _bmp(seed=0)), (2, _bmp(seed=80)), (3, _wav(440)), (9, b"junk")]
    spark.createDataFrame(drop1, MEDIA_SCHEMA).write.mode("overwrite").parquet(f"{landing}/d")
    # drop 2: byte-identical re-upload of image 1 (new id), a new
    # image, and a re-encode of the 440Hz tone at identical PCM
    drop2 = [(11, _bmp(seed=0)), (12, _bmp(seed=160)), (13, _wav(440))]
    spark.createDataFrame(drop2, MEDIA_SCHEMA).write.mode("append").parquet(f"{landing}/d")

    stream = spark.readStream.format("parquet").schema(MEDIA_SCHEMA).load(f"{landing}/d")
    q = stream_media_to_bronze(stream, bronze, ckpt)
    q.awaitTermination(120)

    out = spark.read.parquet(bronze)
    sigs = [r for r in out.collect()]
    # exact-signature dups collapsed: one row per distinct (kind, sig),
    # junk passed through with NULL signature
    decodable = [r for r in sigs if r["signature"] is not None]
    assert len(decodable) == len({(r["kind"], r["signature"]) for r in decodable})
    assert {r["media_id"] for r in sigs if r["signature"] is None} == {9}
    kept_ids = {r["media_id"] for r in decodable}
    assert 1 in kept_ids or 11 in kept_ids  # one of the identical pair
    assert not ({1, 11} <= kept_ids)  # ...but not both
    assert not ({3, 13} <= kept_ids)

    # batch compaction over bronze: near-dup banding on the SIGNATURE
    # column already present — no pixel recompute
    from open_data_pipelines_spark.operators.image_dedup import image_near_dup_pairs

    images = out.filter(F.col("kind") == "image")
    sig_by_id = {r["media_id"]: r["signature"] for r in images.collect()}
    assert len(sig_by_id) >= 2

    def _expected(max_hamming: int) -> set:
        ids = sorted(sig_by_id)
        return {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin((sig_by_id[a] ^ sig_by_id[b]) & ((1 << 64) - 1)).count("1")
            <= max_hamming
        }

    # banding+verify must return EXACTLY the pairs an independent
    # in-test Hamming computation predicts (the old assertion was
    # `count() >= 0`, which passes with the operator fully broken —
    # round-9 test-review find); band_bits=1 makes the pigeonhole
    # lossless up to hamming 63, so the second case's expectation
    # provably contains every image pair (non-vacuous)
    for mh, bb in ((6, 8), (63, 1)):
        pairs = image_near_dup_pairs(
            images, "media_id", hash_col="signature", max_hamming=mh, band_bits=bb
        )
        got = {
            tuple(sorted((r["id_a"], r["id_b"]))) for r in pairs.collect()
        }
        assert got == _expected(mh), (mh, bb)
    assert _expected(63)


def test_stream_media_dedup_survives_checkpoint_restart(spark):
    """Verdict r6 task: restart recovery. Run 1 drains drop 1 and
    terminates (the kill point — availableNow snapshots its input, so
    later files are exactly 'arrived after the crash'). Drop 2 then
    lands a byte-identical re-upload of an already-ingested image plus
    genuinely new media; run 2 restarts on the SAME checkpoint. The
    dedup operator's state store must come back from the checkpoint:
    the re-upload is swallowed across the restart boundary, the new
    media lands, and bronze holds one row per (kind, signature)."""
    landing = tempfile.mkdtemp(prefix="media_restart_landing_")
    bronze = tempfile.mkdtemp(prefix="media_restart_bronze_") + "/media"
    ckpt = tempfile.mkdtemp(prefix="media_restart_ckpt_")

    drop1 = [(1, _bmp(seed=0)), (2, _wav(440)), (9, b"junk")]
    spark.createDataFrame(drop1, MEDIA_SCHEMA).write.mode("overwrite").parquet(f"{landing}/d")

    def run():
        stream = spark.readStream.format("parquet").schema(MEDIA_SCHEMA).load(f"{landing}/d")
        q = stream_media_to_bronze(stream, bronze, ckpt)
        q.awaitTermination(120)

    run()
    first = spark.read.parquet(bronze)
    assert first.filter(F.col("signature").isNotNull()).count() == 2

    # post-"crash" arrivals: re-upload of image 1 (new id, same bytes),
    # a new image, and a PCM-identical re-encode of the 440Hz tone
    drop2 = [(11, _bmp(seed=0)), (12, _bmp(seed=160)), (13, _wav(440))]
    spark.createDataFrame(drop2, MEDIA_SCHEMA).write.mode("append").parquet(f"{landing}/d")

    run()  # restart on the same checkpoint
    out = spark.read.parquet(bronze).collect()
    decodable = [r for r in out if r["signature"] is not None]
    # one row per distinct (kind, signature) ACROSS the restart
    assert len(decodable) == len({(r["kind"], r["signature"]) for r in decodable})
    kept_ids = {r["media_id"] for r in decodable}
    assert 11 not in kept_ids and 13 not in kept_ids  # state restored
    assert 12 in kept_ids  # new media still lands
    assert {r["media_id"] for r in out if r["signature"] is None} == {9}


def test_stream_media_with_near_dedup_rejects_at_ingest(spark, tmp_path):
    """Round-11 online admission over REAL decoded media: a later
    drop's near-identical image (one pixel-block nudged — aHash within
    the Hamming threshold) is rejected against the persisted band
    index at ingest; distinct content and undecodable rows pass."""
    import time

    from open_data_pipelines_spark.streaming.dedup_stream import read_admitted
    from open_data_pipelines_spark.streaming.media_stream import (
        stream_media_with_near_dedup,
    )

    def bmp_variant(nudge):
        # flat gradient with a small local nudge: aHash flips few bits
        w, h = 16, 12
        rgb = bytearray(
            (x * 16) % 256 for _ in range(h) for x in range(w) for _ in range(3)
        )
        for i in range(nudge):
            rgb[i * 3] = 255
        return encode_bmp(w, h, bytes(rgb))

    rows1 = [(1, bmp_variant(0)), (2, _wav(440))]
    rows2 = [(3, bmp_variant(2)), (4, _bmp(seed=97)), (5, b"junk-bytes")]
    landing = str(tmp_path / "landing")
    spark.createDataFrame(rows1, MEDIA_SCHEMA).repartition(1).write.parquet(landing)
    time.sleep(1.1)
    spark.createDataFrame(rows2, MEDIA_SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(landing)

    stream = (
        spark.readStream.format("parquet")
        .schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(landing)
    )
    q = stream_media_with_near_dedup(
        stream,
        str(tmp_path / "idx"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    admitted = {
        r["media_id"] for r in read_admitted(spark, str(tmp_path / "out")).collect()
    }
    # sanity on the premise: 3 is within hamming 3 of 1; 4 is not
    from open_data_pipelines_spark.streaming.media_stream import with_media_signature

    sigs = {
        r["media_id"]: r["signature"]
        for r in with_media_signature(
            spark.createDataFrame(rows1 + rows2, MEDIA_SCHEMA)
        ).collect()
    }
    assert bin(sigs[1] ^ sigs[3]).count("1") <= 3
    assert bin(sigs[1] ^ sigs[4]).count("1") > 3
    assert admitted == {1, 2, 4, 5}
