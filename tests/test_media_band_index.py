"""Incremental media near-dup admission against the persisted Hamming
band index: admission semantics (exact-verified rejection, per-kind
isolation, quarantine pass-through), replay idempotence, a sequential
greedy oracle over randomized batched signature sets, compaction, and
the streaming wrapper's kill/resume equivalence."""

from __future__ import annotations

import itertools
import random
import time

from open_data_pipelines_spark.operators.incremental_dedup import committed_log_dirs
from open_data_pipelines_spark.operators.media_band_index import (
    compact_media_band_index,
    media_band_rows,
    near_dedup_media_against_index,
    read_media_band_index,
)
from open_data_pipelines_spark.streaming.dedup_stream import (
    read_admitted,
    stream_media_near_dedup_to_parquet,
)

SCHEMA = "media_id long, kind string, signature long"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


BASE = 0x0123456789ABCDEF


def test_first_batch_keeps_one_per_cluster_and_quarantine(spark, tmp_path):
    idx = str(tmp_path / "bands")
    b1 = _rows(
        spark,
        [
            (1, "image", BASE),
            (2, "image", BASE ^ 0b11),  # hamming 2 of #1 -> same cluster
            (3, "image", ~BASE & 0x7FFFFFFFFFFFFFFF),  # far away
            (4, "audio", BASE),  # same bits, different kind: isolated
            (5, "image", None),  # quarantine: no signature
        ],
    )
    fresh = near_dedup_media_against_index(
        spark, b1, idx, "signature", "media_id", "kind", batch_id=1
    )
    assert sorted(r["media_id"] for r in fresh.collect()) == [1, 3, 4, 5]
    assert len(committed_log_dirs(spark, idx)) == 1
    # 3 admitted signatures (1, 3, 4) x 8 bands — the NULL-signature
    # quarantine row is admitted but contributes no band rows
    assert read_media_band_index(spark, idx).count() == 24


def test_second_batch_rejects_verified_near_dups(spark, tmp_path):
    idx = str(tmp_path / "bands")
    near_dedup_media_against_index(
        spark,
        _rows(spark, [(1, "image", BASE), (2, "audio", BASE)]),
        idx, "signature", "media_id", "kind", batch_id=1,
    )
    b2 = _rows(
        spark,
        [
            (10, "image", BASE ^ 0b111),  # hamming 3 of admitted image -> reject
            # shares band 0 (low byte unchanged) with the admitted
            # image but hamming 8 overall -> band collision VERIFIED
            # away, admitted
            (11, "image", BASE ^ (0xFF << 16)),
            (12, "video", BASE),  # kind never admitted before
        ],
    )
    fresh = near_dedup_media_against_index(
        spark, b2, idx, "signature", "media_id", "kind", batch_id=2
    )
    assert sorted(r["media_id"] for r in fresh.collect()) == [11, 12]


def test_replay_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "bands")
    b = _rows(spark, [(1, "image", BASE), (2, "image", ~BASE & 0x7FFFFFFFFFFFFFFF)])
    near_dedup_media_against_index(
        spark, b, idx, "signature", "media_id", "kind", batch_id=7
    )
    fresh2 = near_dedup_media_against_index(
        spark, b, idx, "signature", "media_id", "kind", batch_id=7
    )
    assert sorted(r["media_id"] for r in fresh2.collect()) == [1, 2]
    assert len(committed_log_dirs(spark, idx)) == 1


def _bands(sig, band_bits=8):
    return [(b, (sig >> (b * band_bits)) & ((1 << band_bits) - 1)) for b in range(64 // band_bits)]


def _greedy_oracle(items, batches, max_hamming):
    """items: id -> (kind, signature|None). Mirrors the documented
    semantics: band-collision candidates verified by exact Hamming
    against ADMITTED items; within-batch per-kind union-find keeper."""
    def near(s1, s2):
        return bin(s1 ^ s2).count("1") <= max_hamming

    admitted: set[int] = set()
    seen: dict[tuple, list[tuple[int, int]]] = {}  # (kind,band_id,band_value) -> [(id, sig)]
    for batch in batches:
        rejected = set()
        for i in batch:
            kind, sig = items[i]
            if sig is None:
                continue
            for bid, bv in _bands(sig):
                if any(near(sig, s) for _, s in seen.get((kind, bid, bv), [])):
                    rejected.add(i)
                    break
        survivors = [i for i in batch if i not in rejected]
        parent = {i: i for i in survivors}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i1, i2 in itertools.combinations(sorted(survivors), 2):
            k1, s1 = items[i1]
            k2, s2 = items[i2]
            if s1 is None or s2 is None or k1 != k2:
                continue
            shared = {bv for bv in _bands(s1)} & {bv for bv in _bands(s2)}
            if shared and near(s1, s2):
                r1, r2 = find(i1), find(i2)
                if r1 != r2:
                    parent[max(r1, r2)] = min(r1, r2)
        keep = {i for i in survivors if find(i) == i}
        admitted |= keep
        for i in keep:
            kind, sig = items[i]
            if sig is None:
                continue
            for bid, bv in _bands(sig):
                seen.setdefault((kind, bid, bv), []).append((i, sig))
    return admitted


def test_incremental_matches_greedy_oracle(spark, tmp_path):
    rng = random.Random(7)
    bases = [rng.getrandbits(63) for _ in range(6)]
    items: dict[int, tuple] = {}
    for i in range(1, 41):
        kind = rng.choice(["image", "audio"])
        r = rng.random()
        if r < 0.5:  # near-dup of a base: flip <= 3 bits
            sig = bases[rng.randrange(len(bases))]
            for _ in range(rng.randint(0, 3)):
                sig ^= 1 << rng.randrange(64)
            items[i] = (kind, sig & 0x7FFFFFFFFFFFFFFF)
        elif r < 0.6:
            items[i] = (kind, None)  # quarantine
        else:
            items[i] = (kind, rng.getrandbits(63))
    ids = sorted(items)
    batches = [ids[i : i + 9] for i in range(0, len(ids), 9)]
    want = _greedy_oracle(items, batches, max_hamming=3)
    want |= {i for i in ids if items[i][1] is None}

    idx = str(tmp_path / "bands")
    got: set[int] = set()
    for bi, batch in enumerate(batches, start=1):
        fresh = near_dedup_media_against_index(
            spark,
            _rows(spark, [(i, items[i][0], items[i][1]) for i in batch]),
            idx, "signature", "media_id", "kind", batch_id=bi, max_hamming=3,
        )
        got |= {r["media_id"] for r in fresh.collect()}
    assert got == want


def test_compaction_preserves_membership(spark, tmp_path):
    idx = str(tmp_path / "bands")
    sigs = [BASE, ~BASE & 0x7FFFFFFFFFFFFFFF, BASE ^ (0xFFFF << 32)]
    for i, s in enumerate(sigs, start=1):
        near_dedup_media_against_index(
            spark, _rows(spark, [(i, "image", s)]), idx,
            "signature", "media_id", "kind", batch_id=i,
        )
    n = compact_media_band_index(spark, idx)
    assert n == 24  # 3 sigs x 8 bands
    dirs = committed_log_dirs(spark, idx)
    assert len(dirs) == 1 and dirs[0].endswith("/base-00000001")
    fresh = near_dedup_media_against_index(
        spark,
        _rows(spark, [(20, "image", BASE ^ 0b1), (21, "image", BASE ^ (0x3F << 40))]),
        idx, "signature", "media_id", "kind", batch_id=50, max_hamming=3,
    )
    assert sorted(r["media_id"] for r in fresh.collect()) == [21]


def test_streaming_media_near_dedup_kill_resume(spark, tmp_path):
    rows1 = [(1, "image", BASE), (2, "audio", BASE)]
    rows2 = [(3, "image", BASE ^ 0b1), (4, "image", ~BASE & 0x7FFFFFFFFFFFFFFF)]
    rows3 = [(5, "audio", BASE ^ 0b10), (6, "video", BASE), (7, "image", None)]

    def run(base, kill):
        landing = str(base / "landing")
        idx, out, ckpt = str(base / "idx"), str(base / "out"), str(base / "ckpt")
        schema = _rows(spark, rows1).schema
        _rows(spark, rows1).repartition(1).write.parquet(landing)
        time.sleep(1.1)
        _rows(spark, rows2).repartition(1).write.mode("append").parquet(landing)

        def drain():
            stream = (
                spark.readStream.format("parquet")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(landing)
            )
            q = stream_media_near_dedup_to_parquet(
                stream, idx, out, ckpt, "signature", "media_id", "kind"
            )
            q.awaitTermination(120)

        if kill:
            # drain the first two files, STOP (the "kill"), land more
            # data, resume from the same checkpoint
            drain()
            time.sleep(1.1)
            _rows(spark, rows3).repartition(1).write.mode("append").parquet(landing)
            drain()
        else:
            # uninterrupted reference run: all three files land before
            # the one and only drain
            time.sleep(1.1)
            _rows(spark, rows3).repartition(1).write.mode("append").parquet(landing)
            drain()
        return {r["media_id"] for r in read_admitted(spark, out).collect()}

    killed = run(tmp_path / "killed", kill=True)
    straight = run(tmp_path / "straight", kill=False)
    # 3 rejected (near admitted image 1), 5 rejected (near admitted
    # audio 2), 6 fresh kind, 7 quarantine passes
    assert killed == straight == {1, 2, 4, 6, 7}


def test_band_rows_shape(spark):
    df = _rows(spark, [(1, "image", BASE), (2, "image", None)])
    rows = media_band_rows(df, "signature", "media_id", "kind").collect()
    assert len(rows) == 8  # NULL-signature row excluded
    assert {r["band_id"] for r in rows} == set(range(8))
    for r in rows:
        assert r["band_value"] == (BASE >> (r["band_id"] * 8)) & 0xFF
