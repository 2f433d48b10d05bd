"""Incremental NEAR-dup admission against the persisted MinHash band
index (VERDICT r10 task #4): admission semantics, replay idempotence,
agreement-verified rejection, a sequential greedy oracle over random
batched corpora, compaction, and the streaming wrapper's kill/resume
equivalence with an uninterrupted run."""

from __future__ import annotations

import itertools
import time

from open_data_pipelines_spark.operators.minhash_index import (
    band_rows,
    compact_band_index,
    near_dedup_against_index,
    read_band_index,
)
from open_data_pipelines_spark.operators.incremental_dedup import committed_log_dirs
from open_data_pipelines_spark.streaming.dedup_stream import (
    read_admitted,
    stream_near_dedup_to_parquet,
)

# >= 3 tokens so the default word-3-shingle family produces shingles
ALPHA = "the quick brown fox jumps over the lazy dog tonight"
BRAVO = "colorless green ideas sleep furiously under heavy winter rain"
CHARLIE = "pack my box with five dozen fresh liquor jugs now"
DELTA = "sphinx of black quartz judge my vow said the king"
SHORT = "hi"  # zero shingles -> no bands -> always admitted


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_first_batch_keeps_one_per_duplicate_cluster(spark, tmp_path):
    idx = str(tmp_path / "bands")
    b1 = _docs(spark, [(1, ALPHA), (2, BRAVO), (3, ALPHA), (4, SHORT)])
    fresh = near_dedup_against_index(spark, b1, idx, "text", "doc_id", batch_id=1)
    assert sorted(r["doc_id"] for r in fresh.collect()) == [1, 2, 4]
    assert len(committed_log_dirs(spark, idx)) == 1
    # the short doc contributed no band rows
    assert read_band_index(spark, idx).select("band_id").distinct().count() == 4


def test_second_batch_rejects_near_dups_of_admitted(spark, tmp_path):
    idx = str(tmp_path / "bands")
    near_dedup_against_index(
        spark, _docs(spark, [(1, ALPHA), (2, BRAVO)]), idx, "text", "doc_id", batch_id=1
    )
    b2 = _docs(spark, [(10, ALPHA), (11, CHARLIE), (12, SHORT)])
    fresh = near_dedup_against_index(spark, b2, idx, "text", "doc_id", batch_id=2)
    assert sorted(r["doc_id"] for r in fresh.collect()) == [11, 12]


def test_replay_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "bands")
    b = _docs(spark, [(1, ALPHA), (2, BRAVO)])
    near_dedup_against_index(spark, b, idx, "text", "doc_id", batch_id=7)
    fresh2 = near_dedup_against_index(spark, b, idx, "text", "doc_id", batch_id=7)
    assert sorted(r["doc_id"] for r in fresh2.collect()) == [1, 2]
    assert len(committed_log_dirs(spark, idx)) == 1


def test_min_agreement_verifies_before_rejecting(spark, tmp_path):
    """With min_agreement=1.0 only FULL-signature matches reject; a
    doc that merely shares a band (partial overlap) is admitted where
    membership mode would reject it."""
    # two texts with partial shingle overlap: shared prefix, different
    # tail — the pair collides on band 1 while agreeing on only 4 of
    # the 8 minhash positions (verified by the sanity collect below,
    # and deterministic: the hash family is seedless)
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "alpha beta gamma delta epsilon zeta eta theta iota qq2"
    idx_m = str(tmp_path / "membership")
    idx_v = str(tmp_path / "verified")
    first = _docs(spark, [(1, a)])
    second = _docs(spark, [(2, b)])
    near_dedup_against_index(spark, first, idx_m, "text", "doc_id", batch_id=1)
    got_m = near_dedup_against_index(
        spark, second, idx_m, "text", "doc_id", batch_id=2
    ).count()
    near_dedup_against_index(
        spark, first, idx_v, "text", "doc_id", batch_id=1, min_agreement=1.0
    )
    got_v = near_dedup_against_index(
        spark, second, idx_v, "text", "doc_id", batch_id=2, min_agreement=1.0
    ).count()
    # sanity: the pair does collide on >= 1 band but not all positions
    per_doc: dict[int, dict[int, tuple]] = {1: {}, 2: {}}
    for r in band_rows(_docs(spark, [(1, a), (2, b)]), "text", "doc_id").collect():
        per_doc[r["doc_id"]][r["band_id"]] = (r["band_hash"], tuple(r["msig"]))
    shared = [
        bid for bid in per_doc[1] if per_doc[1][bid][0] == per_doc[2][bid][0]
    ]
    agree = sum(
        x == y for x, y in zip(per_doc[1][0][1], per_doc[2][0][1])
    )
    assert shared and agree < 8, (shared, agree)
    assert got_m == 0  # membership mode rejects on the shared band
    assert got_v == 1  # verified mode admits (signatures differ)


def _greedy_oracle(band_map, batches, min_agreement, k):
    """Pure-Python mirror of the documented admission semantics."""
    def agrees(s1, s2):
        if min_agreement is None:
            return True
        same = sum(1 for x, y in zip(s1, s2) if x == y)
        return same / k >= min_agreement

    admitted: set[int] = set()
    seen: dict[tuple[int, int], list[tuple]] = {}
    for batch in batches:
        rejected = set()
        for doc in batch:
            for bid, bh, msig in band_map.get(doc, []):
                if any(agrees(msig, s) for s in seen.get((bid, bh), [])):
                    rejected.add(doc)
                    break
        survivors = [d for d in batch if d not in rejected]
        # within-batch union-find over (agreeing) band collisions
        parent = {d: d for d in survivors}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for d1, d2 in itertools.combinations(sorted(survivors), 2):
            for bid1, bh1, s1 in band_map.get(d1, []):
                hit = False
                for bid2, bh2, s2 in band_map.get(d2, []):
                    if (bid1, bh1) == (bid2, bh2) and agrees(s1, s2):
                        r1, r2 = find(d1), find(d2)
                        if r1 != r2:
                            parent[max(r1, r2)] = min(r1, r2)
                        hit = True
                        break
                if hit:
                    break
        keep = {d for d in survivors if find(d) == d}
        admitted |= keep
        for d in keep:
            for bid, bh, msig in band_map.get(d, []):
                seen.setdefault((bid, bh), []).append(msig)
    return admitted


def _run_vs_oracle(spark, tmp_path, min_agreement, tag):
    """Randomized batched corpus: duplicates, near-dups, uniques and
    shingle-less shorts; incremental admission must equal the greedy
    oracle computed from the SAME band rows."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    doc_id = 0
    base_texts = [
        " ".join(rng.choices(vocab, k=rng.randint(6, 12))) for _ in range(8)
    ]
    for _ in range(30):
        doc_id += 1
        kind = rng.random()
        if kind < 0.4:
            texts[doc_id] = rng.choice(base_texts)  # exact dup family
        elif kind < 0.6:
            t = rng.choice(base_texts).split()
            t[rng.randrange(len(t))] = rng.choice(vocab)  # near-dup
            texts[doc_id] = " ".join(t)
        elif kind < 0.7:
            texts[doc_id] = "x"  # shingle-less
        else:
            texts[doc_id] = " ".join(rng.choices(vocab, k=rng.randint(6, 12)))
    ids = sorted(texts)
    batches = [ids[i : i + 7] for i in range(0, len(ids), 7)]

    all_docs = _docs(spark, [(i, texts[i]) for i in ids])
    band_map: dict[int, list] = {}
    for r in band_rows(all_docs, "text", "doc_id").collect():
        band_map.setdefault(r["doc_id"], []).append(
            (r["band_id"], r["band_hash"], tuple(r["msig"]))
        )
    want = _greedy_oracle(band_map, batches, min_agreement, k=8)
    # shingle-less docs are always admitted (absent from band_map)
    want |= {d for d in ids if d not in band_map}

    idx = str(tmp_path / f"bands-{tag}")
    got: set[int] = set()
    for bi, batch in enumerate(batches, start=1):
        fresh = near_dedup_against_index(
            spark,
            _docs(spark, [(i, texts[i]) for i in batch]),
            idx,
            "text",
            "doc_id",
            batch_id=bi,
            min_agreement=min_agreement,
        )
        got |= {r["doc_id"] for r in fresh.collect()}
    assert got == want


def test_incremental_matches_greedy_oracle_membership(spark, tmp_path):
    _run_vs_oracle(spark, tmp_path, None, "m")


def test_incremental_matches_greedy_oracle_verified(spark, tmp_path):
    _run_vs_oracle(spark, tmp_path, 0.75, "v")


def test_compaction_preserves_membership(spark, tmp_path):
    idx = str(tmp_path / "bands")
    for i, text in enumerate([ALPHA, BRAVO, CHARLIE], start=1):
        near_dedup_against_index(
            spark, _docs(spark, [(i, text)]), idx, "text", "doc_id", batch_id=i
        )
    n = compact_band_index(spark, idx)
    assert n == 12  # 3 docs x 4 bands
    dirs = committed_log_dirs(spark, idx)
    assert len(dirs) == 1 and dirs[0].endswith("/base-00000001")
    fresh = near_dedup_against_index(
        spark,
        _docs(spark, [(20, BRAVO), (21, DELTA)]),
        idx,
        "text",
        "doc_id",
        batch_id=50,
    )
    assert sorted(r["doc_id"] for r in fresh.collect()) == [21]


def test_streaming_near_dedup_with_kill_resume(spark, tmp_path):
    """The VERDICT done-bar: a drained-then-restarted stream admits
    exactly the set an UNINTERRUPTED run admits on the same landing
    files (and both match the sequential batch API)."""
    rows1 = [(1, ALPHA), (2, BRAVO)]
    rows2 = [(3, ALPHA), (4, CHARLIE)]  # 3 is a near-dup of admitted 1
    rows3 = [(5, CHARLIE), (6, DELTA), (7, SHORT)]

    def run(base, stop_after_two):
        landing = str(base / "landing")
        idx, out, ckpt = str(base / "idx"), str(base / "out"), str(base / "ckpt")
        schema = _docs(spark, rows1).schema
        _docs(spark, rows1).repartition(1).write.parquet(landing)
        time.sleep(1.1)
        _docs(spark, rows2).repartition(1).write.mode("append").parquet(landing)

        def drain():
            stream = (
                spark.readStream.format("parquet")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(landing)
            )
            q = stream_near_dedup_to_parquet(
                stream, idx, out, ckpt, "text", "doc_id"
            )
            q.awaitTermination(120)

        if stop_after_two:
            # the "kill": drain the first two files, stop, land more
            # data, resume from the same checkpoint
            drain()
            time.sleep(1.1)
            _docs(spark, rows3).repartition(1).write.mode("append").parquet(landing)
            drain()
        else:
            # uninterrupted reference run: all three files land before
            # the one and only drain
            time.sleep(1.1)
            _docs(spark, rows3).repartition(1).write.mode("append").parquet(landing)
            drain()
        return {r["doc_id"] for r in read_admitted(spark, out).collect()}

    killed = run(tmp_path / "killed", stop_after_two=True)
    straight = run(tmp_path / "straight", stop_after_two=False)
    assert killed == straight == {1, 2, 4, 6, 7}


def test_streaming_replay_of_committed_batch_skips_probe(spark, tmp_path):
    """At-least-once replay: delete the newest checkpoint commit (and
    its crc) so the last batch replays — the committed-output skip
    must hold the admitted set fixed and repair/keep the index."""
    import pathlib

    landing = str(tmp_path / "landing")
    idx, out, ckpt = (
        str(tmp_path / "idx"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    schema = _docs(spark, [(1, ALPHA)]).schema
    _docs(spark, [(1, ALPHA), (2, BRAVO)]).repartition(1).write.parquet(landing)
    time.sleep(1.1)
    _docs(spark, [(3, ALPHA), (4, CHARLIE)]).repartition(1).write.mode(
        "append"
    ).parquet(landing)

    def drain():
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(landing)
        )
        q = stream_near_dedup_to_parquet(stream, idx, out, ckpt, "text", "doc_id")
        q.awaitTermination(120)

    drain()
    assert {r["doc_id"] for r in read_admitted(spark, out).collect()} == {1, 2, 4}
    commits = sorted(
        (pathlib.Path(ckpt) / "commits").iterdir(),
        key=lambda p: int(p.name) if p.name.isdigit() else -1,
    )
    newest = commits[-1]
    crc = newest.parent / f".{newest.name}.crc"
    newest.unlink()
    if crc.exists():
        crc.unlink()
    drain()  # replays the last batch
    assert {r["doc_id"] for r in read_admitted(spark, out).collect()} == {1, 2, 4}


def test_streaming_all_duplicate_batch_commits_empty_output(spark, tmp_path):
    """A micro-batch that is ENTIRELY near-duplicates commits an empty
    (schema-carrying) output directory and an empty index segment —
    the stream keeps draining and later batches still admit."""
    landing = str(tmp_path / "landing")
    idx, out, ckpt = (
        str(tmp_path / "idx"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    schema = _docs(spark, [(1, ALPHA)]).schema
    _docs(spark, [(1, ALPHA)]).repartition(1).write.parquet(landing)
    time.sleep(1.1)
    _docs(spark, [(2, ALPHA)]).repartition(1).write.mode("append").parquet(landing)
    time.sleep(1.1)
    _docs(spark, [(3, BRAVO)]).repartition(1).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(landing)
    )
    q = stream_near_dedup_to_parquet(stream, idx, out, ckpt, "text", "doc_id")
    q.awaitTermination(120)
    assert {r["doc_id"] for r in read_admitted(spark, out).collect()} == {1, 3}
