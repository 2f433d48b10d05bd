"""Index commit protocols: manifest-pointer (object-store-safe) and
rename-mode crash adoption.

The load-bearing invariants, per the round-9 verdict's top task:

- a reader NEVER sees a partial index under ``commit="manifest"`` —
  an unpublished generation (crash before the pointer write) is
  invisible and the previous generation keeps resolving;
- probe-all == brute force holds across a manifest-committed retrain
  (the same anchor the rename-mode retrain test pins);
- a missing index path with a COMPLETE swap sibling on disk (a crash
  inside the rename window) is ADOPTED by the maintenance entry
  points, never silently replaced by a batch-only rebuild; incomplete
  siblings raise.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.operators.index_commit import (
    MANIFEST_DIR,
    adopt_sibling,
    commit_generation,
    latest_manifest,
    load_existing_index,
    read_index,
    resolve_index_path,
)
from open_data_pipelines_spark.operators.ivf import (
    append_to_ivf_index,
    build_ivf_index,
    compact_ivf_index,
    global_mean_dist2,
    ivf_topk,
    maintain_ivf_index,
    train_centroids,
)
from open_data_pipelines_spark.operators.similarity import brute_force_topk


def _vecs(spark, ids, offset=0.0):
    rows = [
        (i, [float(i % 7) + 1.0 + offset, float((i * 3) % 5) + 1.0 + offset])
        for i in ids
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _topk_sets(spark, corpus, index, cents, queries, k_cells):
    cols = ["query_id", "neighbor_id", "rank", "cosine_sim"]
    bf = {
        tuple(r)
        for r in brute_force_topk(corpus, queries, "embedding", "vec_id", k=5)
        .select(cols)
        .collect()
    }
    got = {
        tuple(r)
        for r in ivf_topk(
            index, queries, "embedding", "vec_id", cents, k=5, nprobe=k_cells
        )
        .select(cols)
        .collect()
    }
    return bf, got


def test_manifest_build_layout_and_read(spark, tmp_path):
    """Generation-1 layout: _manifests/manifest-00000001.json points at
    gen-00000001/; read_index resolves it; the raw path itself holds no
    parquet (nothing to mistake for a rename-mode index)."""
    base = _vecs(spark, range(60))
    cents = train_centroids(base, "embedding", "vec_id", k=4, iters=2)
    path = str(tmp_path / "ivf")
    idx = build_ivf_index(base, "embedding", "vec_id", cents, path=path, commit="manifest")
    assert idx.count() == 60

    m = latest_manifest(spark, path)
    assert m == {"generation": 1, "dir": "gen-00000001"}
    assert resolve_index_path(spark, path) == path + "/gen-00000001"
    assert sorted(os.listdir(path)) == [MANIFEST_DIR, "gen-00000001"]
    # partitioned layout inside the generation dir
    assert any(
        d.startswith("list_id=") for d in os.listdir(path + "/gen-00000001")
    )
    assert read_index(spark, path).count() == 60


def test_manifest_append_lands_in_current_generation(spark, tmp_path):
    base = _vecs(spark, range(60))
    cents = train_centroids(base, "embedding", "vec_id", k=4, iters=2)
    path = str(tmp_path / "ivf")
    build_ivf_index(base, "embedding", "vec_id", cents, path=path, commit="manifest")
    append_to_ivf_index(_vecs(spark, range(60, 80)), "embedding", "vec_id", cents, path)
    assert read_index(spark, path).count() == 80
    # still one generation — an append is not a commit
    assert latest_manifest(spark, path)["generation"] == 1


def test_manifest_retrain_probe_all_equals_brute_force(spark, tmp_path):
    """The verdict's done-criterion: probe-all == brute force across a
    manifest-committed retrain."""
    k_cells = 4
    base = _vecs(spark, range(100))
    cents = train_centroids(base, "embedding", "vec_id", k=k_cells, iters=5)
    path = str(tmp_path / "ivf")
    build_ivf_index(base, "embedding", "vec_id", cents, path=path, commit="manifest")
    baseline = global_mean_dist2(base, "embedding", cents)

    drifted = _vecs(spark, range(200, 240), offset=50.0)
    st = maintain_ivf_index(
        drifted, "embedding", "vec_id", cents, path, baseline,
        retrain_factor=2.0, commit="manifest",
    )
    assert st["retrained"] is True
    m = latest_manifest(spark, path)
    assert m["generation"] == 2

    index = read_index(spark, path)
    assert index.count() == 140
    full = base.unionByName(drifted)
    queries = _vecs(spark, [0, 55, 205])
    bf, got = _topk_sets(spark, full, index, st["centroids"], queries, k_cells)
    assert got == bf


def test_manifest_crash_before_pointer_is_invisible(spark, tmp_path):
    """Crash injection: a fully-written generation directory with NO
    pointer file must be invisible to readers (they keep resolving the
    committed generation), and the next real commit must GC the orphan
    and take a fresh generation number above it."""
    base = _vecs(spark, range(60))
    cents = train_centroids(base, "embedding", "vec_id", k=4, iters=2)
    path = str(tmp_path / "ivf")
    build_ivf_index(base, "embedding", "vec_id", cents, path=path, commit="manifest")

    # simulate the crash: gen-2 layout written, pointer never published
    orphan = _vecs(spark, range(1000, 1010))
    orphan.withColumn("list_id", F.lit(0)).write.partitionBy("list_id").parquet(
        path + "/gen-00000002"
    )
    assert latest_manifest(spark, path)["generation"] == 1
    assert read_index(spark, path).count() == 60  # reader never sees gen-2

    # the next commit publishes atop the committed generation and GCs
    # the orphan (same number is reused: delete-then-write)
    deduped = read_index(spark, path)
    commit_generation(
        spark,
        path,
        lambda d: deduped.write.mode("overwrite").partitionBy("list_id").parquet(d),
    )
    assert latest_manifest(spark, path)["generation"] == 2
    assert read_index(spark, path).count() == 60


def test_manifest_partial_pointer_tmp_is_ignored(spark, tmp_path):
    """A crashed pointer write leaves manifest-N.json.tmp — readers
    must ignore it (only renamed-final pointers are commits)."""
    base = _vecs(spark, range(40))
    cents = train_centroids(base, "embedding", "vec_id", k=2, iters=1)
    path = str(tmp_path / "ivf")
    build_ivf_index(base, "embedding", "vec_id", cents, path=path, commit="manifest")
    stray = path + f"/{MANIFEST_DIR}/manifest-00000009.json.tmp"
    with open(stray, "w") as fh:
        fh.write(json.dumps({"generation": 9, "dir": "gen-00000009"})[:10])
    assert latest_manifest(spark, path)["generation"] == 1
    assert read_index(spark, path).count() == 40


def test_manifest_missing_generation_dir_raises(spark, tmp_path):
    """A pointer at a missing generation is corruption — the reader
    must refuse, never fall back to a stale or partial layout."""
    base = _vecs(spark, range(40))
    cents = train_centroids(base, "embedding", "vec_id", k=2, iters=1)
    path = str(tmp_path / "ivf")
    build_ivf_index(base, "embedding", "vec_id", cents, path=path, commit="manifest")
    import shutil

    shutil.rmtree(path + "/gen-00000001")
    with pytest.raises(IOError, match="does not exist"):
        resolve_index_path(spark, path)


def test_manifest_gc_keeps_two_generations(spark, tmp_path):
    """After repeated commits only the newest `keep=2` generations and
    pointers remain — in-flight readers of the previous generation
    survive, older ones are GC'd."""
    base = _vecs(spark, range(40))
    cents = train_centroids(base, "embedding", "vec_id", k=2, iters=1)
    path = str(tmp_path / "ivf")
    build_ivf_index(base, "embedding", "vec_id", cents, path=path, commit="manifest")
    for _ in range(3):
        snap = read_index(spark, path).localCheckpoint(eager=True)
        commit_generation(
            spark,
            path,
            lambda d, s=snap: s.write.mode("overwrite").partitionBy("list_id").parquet(d),
        )
    assert latest_manifest(spark, path)["generation"] == 4
    gens = sorted(d for d in os.listdir(path) if d.startswith("gen-"))
    assert gens == ["gen-00000003", "gen-00000004"]
    manifests = sorted(
        f
        for f in os.listdir(path + "/" + MANIFEST_DIR)
        if f.startswith("manifest-")  # Hadoop local FS adds .crc sidecars
    )
    assert manifests == ["manifest-00000003.json", "manifest-00000004.json"]
    assert read_index(spark, path).count() == 40


def test_manifest_compact_publishes_new_generation(spark, tmp_path):
    base = _vecs(spark, range(50))
    cents = train_centroids(base, "embedding", "vec_id", k=4, iters=2)
    path = str(tmp_path / "ivf")
    build_ivf_index(base, "embedding", "vec_id", cents, path=path, commit="manifest")
    batch = _vecs(spark, range(50, 70))
    append_to_ivf_index(batch, "embedding", "vec_id", cents, path)
    append_to_ivf_index(batch, "embedding", "vec_id", cents, path)  # replay
    assert read_index(spark, path).count() == 90
    res = compact_ivf_index(spark, path, "vec_id", commit="manifest")
    assert res["rows_after"] == 70 and res["replay_rows"] == 20
    assert latest_manifest(spark, path)["generation"] == 2
    assert read_index(spark, path).count() == 70


def test_manifest_pq_retrain_probe_all(spark, tmp_path):
    """PQ layer: a manifest-committed retrain re-encodes everything
    with one model generation; probe-all ADC over the rebuilt index
    covers the whole corpus (count + per-query candidate sanity)."""
    from open_data_pipelines_spark.operators.pq import (
        build_ivf_pq_index,
        ivf_pq_topk,
        maintain_ivf_pq_index,
        train_pq,
    )

    k_cells = 4
    base = _vecs(spark, range(80))
    cents = train_centroids(base, "embedding", "vec_id", k=k_cells, iters=3)
    books = train_pq(base, "embedding", "vec_id", m=2, nbits=2, iters=2)
    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(
        base, "embedding", "vec_id", cents, books, path=path, commit="manifest"
    )
    baseline = global_mean_dist2(base, "embedding", cents)

    drifted = _vecs(spark, range(200, 230), offset=40.0)
    st = maintain_ivf_pq_index(
        drifted, "embedding", "vec_id", cents, books, path, baseline,
        retrain_factor=2.0, nbits=2, commit="manifest",
    )
    assert st["retrained"] is True
    assert latest_manifest(spark, path)["generation"] == 2
    index = read_index(spark, path)
    assert index.count() == 110
    got = ivf_pq_topk(
        index, _vecs(spark, [0, 205]), "embedding", "vec_id",
        st["centroids"], st["codebooks"], k=5, nprobe=k_cells,
    )
    by_q = {r["query_id"] for r in got.collect()}
    assert by_q == {0, 205}


# ---------------------------------------------------------------- rename-mode
# crash adoption (ADVICE r9 #2: the swap window must not trigger a
# silent batch-only rebuild)


def _crash_in_swap_window(path: str) -> None:
    """Reproduce _swap_directory's state after rename(base->old) and
    before rename(tmp->base): base missing, tmp = complete NEW copy,
    old = complete previous copy."""
    os.rename(path, path + ".retrain.old")


def test_rename_swap_window_crash_adopts_new_copy(spark, tmp_path):
    """base missing + complete .retrain.tmp → maintain adopts the tmp
    copy (the fully-written NEW index) and the retrain sees all prior
    rows — never a batch-only rebuild."""
    base_rows = _vecs(spark, range(100))
    cents = train_centroids(base_rows, "embedding", "vec_id", k=4, iters=3)
    path = str(tmp_path / "ivf")
    build_ivf_index(base_rows, "embedding", "vec_id", cents, path=path)
    baseline = global_mean_dist2(base_rows, "embedding", cents)

    # the crashed retrain had fully written its new layout to tmp
    os.rename(path, path + ".retrain.tmp")
    # and had already renamed the previous live copy aside
    build_ivf_index(
        _vecs(spark, range(100)), "embedding", "vec_id", cents,
        path=path + ".retrain.old",
    )
    assert not os.path.exists(path)

    drifted = _vecs(spark, range(200, 240), offset=50.0)
    st = maintain_ivf_index(
        drifted, "embedding", "vec_id", cents, path, baseline, retrain_factor=2.0
    )
    assert st["retrained"] is True
    index = spark.read.parquet(path)
    # 100 adopted + 40 batch — a batch-only rebuild would hold 40
    assert index.count() == 140
    assert not os.path.exists(path + ".retrain.tmp")
    assert not os.path.exists(path + ".retrain.old")


def test_rename_swap_window_crash_adopts_old_when_tmp_incomplete(spark, tmp_path):
    """tmp incomplete (no _SUCCESS) but old complete → adopt old."""
    base_rows = _vecs(spark, range(60))
    cents = train_centroids(base_rows, "embedding", "vec_id", k=4, iters=2)
    path = str(tmp_path / "ivf")
    build_ivf_index(base_rows, "embedding", "vec_id", cents, path=path)
    _crash_in_swap_window(path)
    os.makedirs(path + ".retrain.tmp")  # partial write, no _SUCCESS

    adopted = adopt_sibling(spark, path)
    assert adopted == ".retrain.old"
    assert spark.read.parquet(path).count() == 60
    assert not os.path.exists(path + ".retrain.tmp")


def test_rename_all_siblings_incomplete_raises(spark, tmp_path):
    """Siblings exist but none is complete: refuse loudly rather than
    rebuild from one batch over a possibly-recoverable index."""
    path = str(tmp_path / "ivf")
    os.makedirs(path + ".retrain.tmp")
    with pytest.raises(IOError, match="refusing to rebuild"):
        load_existing_index(spark, path, "rename")


def test_rename_fresh_index_is_still_fresh(spark, tmp_path):
    """No path, no siblings → genuinely fresh (batch-only retrain is
    the correct behavior and must keep working)."""
    path = str(tmp_path / "ivf")
    assert load_existing_index(spark, path, "rename") is None
    assert adopt_sibling(spark, path) is None


def test_unknown_commit_mode_raises(spark, tmp_path):
    base = _vecs(spark, range(10))
    cents = train_centroids(base, "embedding", "vec_id", k=2, iters=1)
    with pytest.raises(ValueError, match="unknown commit mode"):
        build_ivf_index(
            base, "embedding", "vec_id", cents,
            path=str(tmp_path / "x"), commit="s3-two-phase",
        )
    with pytest.raises(ValueError, match="unknown commit mode"):
        load_existing_index(spark, str(tmp_path / "x"), "nope")


def test_manifest_fit_batches_on_virgin_path_initialize_generation(spark, tmp_path):
    """Round-10 review find (the silent-discard hazard, end to end):
    in the streaming maintenance order, FIT batches can arrive before
    any index exists. With commit="manifest" they must initialize
    generation 1 — a bare-path append would strand rows outside the
    manifest layout, and the eventual drift retrain would either
    refuse or (pre-fix) silently rebuild from the drifting batch
    alone, discarding every appended vector."""
    base = _vecs(spark, range(100))
    cents = train_centroids(base, "embedding", "vec_id", k=4, iters=3)
    baseline = global_mean_dist2(base, "embedding", cents)
    path = str(tmp_path / "ivf")

    # fit batch on a VIRGIN path: initializes gen-1, never a bare append
    st = maintain_ivf_index(
        base, "embedding", "vec_id", cents, path, baseline,
        retrain_factor=2.0, commit="manifest",
    )
    assert st["retrained"] is False
    assert latest_manifest(spark, path)["generation"] == 1
    assert read_index(spark, path).count() == 100

    # second fit batch appends INSIDE the committed generation
    calm = _vecs(spark, range(100, 120))
    maintain_ivf_index(
        calm, "embedding", "vec_id", cents, path, baseline,
        retrain_factor=2.0, commit="manifest",
    )
    assert latest_manifest(spark, path)["generation"] == 1
    assert read_index(spark, path).count() == 120

    # the drift retrain sees ALL prior rows — the original bug dropped
    # them and rebuilt from the 40-row batch
    drifted = _vecs(spark, range(200, 240), offset=50.0)
    st2 = maintain_ivf_index(
        drifted, "embedding", "vec_id", cents, path, baseline,
        retrain_factor=2.0, commit="manifest",
    )
    assert st2["retrained"] is True
    assert read_index(spark, path).count() == 160


def test_manifest_mode_refuses_unmanifested_data(spark, tmp_path):
    """A rename-mode layout (or stranded bare appends) at the path
    must make manifest-mode maintenance raise, never treat the index
    as fresh and abandon it."""
    base = _vecs(spark, range(60))
    cents = train_centroids(base, "embedding", "vec_id", k=4, iters=2)
    path = str(tmp_path / "ivf")
    build_ivf_index(base, "embedding", "vec_id", cents, path=path)  # rename layout

    with pytest.raises(IOError, match="committed manifest"):
        load_existing_index(spark, path, "manifest")

    drifted = _vecs(spark, range(200, 240), offset=50.0)
    with pytest.raises(IOError, match="committed manifest"):
        maintain_ivf_index(
            drifted, "embedding", "vec_id", cents, path,
            global_mean_dist2(base, "embedding", cents),
            retrain_factor=2.0, commit="manifest",
        )
    # the fit path refuses too (it would strand MORE rows)
    with pytest.raises(IOError, match="committed manifest"):
        maintain_ivf_index(
            base, "embedding", "vec_id", cents, path,
            global_mean_dist2(base, "embedding", cents),
            retrain_factor=2.0, commit="manifest",
        )
    # the rename-mode index is untouched by the refusals
    assert spark.read.parquet(path).count() == 60


def test_invalid_commit_mode_fails_without_path_too(spark):
    """Round-10 review find: build_ivf_index validated the commit mode
    only on the path-writing branch, so a typo'd mode passed silently
    through in-memory tests and first failed in production."""
    base = _vecs(spark, range(10))
    cents = train_centroids(base, "embedding", "vec_id", k=2, iters=1)
    with pytest.raises(ValueError, match="unknown commit mode"):
        build_ivf_index(base, "embedding", "vec_id", cents, commit="manifets")
    with pytest.raises(ValueError, match="unknown commit mode"):
        maintain_ivf_index(
            base, "embedding", "vec_id", cents, "/tmp/nowhere", 1.0, commit="x"
        )


def test_rename_mode_refuses_manifest_index(spark, tmp_path):
    """Cross-mode guard, the mirror of the un-manifested-data refusal:
    rename-mode maintenance/compaction on a manifest-committed index
    would misread the root (pointer JSONs + generation dirs as one
    parquet layout) and its rewrite would swap-delete the generation
    history — both entry points must refuse with the fix named."""
    base = _vecs(spark, range(50))
    cents = train_centroids(base, "embedding", "vec_id", k=4, iters=2)
    path = str(tmp_path / "ivf")
    build_ivf_index(base, "embedding", "vec_id", cents, path=path, commit="manifest")

    with pytest.raises(IOError, match="manifest-committed"):
        load_existing_index(spark, path, "rename")
    with pytest.raises(IOError, match="manifest-committed"):
        compact_ivf_index(spark, path, "vec_id")  # commit defaults to rename
    with pytest.raises(IOError, match="manifest-committed"):
        maintain_ivf_index(
            _vecs(spark, range(200, 220), offset=50.0),
            "embedding", "vec_id", cents, path,
            global_mean_dist2(base, "embedding", cents),
            retrain_factor=2.0,  # commit defaults to rename
        )
    # ... and on a CALM batch too — the guard sits at maintain ENTRY,
    # so a misconfigured streaming job fails its first batch, not at
    # an arbitrary later drift point (second-review find)
    with pytest.raises(IOError, match="manifest-committed"):
        maintain_ivf_index(
            _vecs(spark, range(50, 60)),
            "embedding", "vec_id", cents, path,
            global_mean_dist2(base, "embedding", cents),
            retrain_factor=1e9,  # guaranteed fit -> append path
        )
    # build's rename overwrite refuses as well (it would wipe the
    # generation history with no error)
    with pytest.raises(IOError, match="manifest-committed"):
        build_ivf_index(base, "embedding", "vec_id", cents, path=path)
    # manifest-mode initialization onto a DIRTY (rename-layout) root
    # refuses at the commit chokepoint instead of silently converting
    rename_path = str(tmp_path / "plain")
    build_ivf_index(base, "embedding", "vec_id", cents, path=rename_path)
    with pytest.raises(IOError, match="non-manifest content"):
        build_ivf_index(
            base, "embedding", "vec_id", cents, path=rename_path, commit="manifest"
        )
    with pytest.raises(IOError, match="non-manifest content"):
        compact_ivf_index(spark, rename_path, "vec_id", commit="manifest")
    # the manifest index is untouched by the refusals
    assert latest_manifest(spark, path)["generation"] == 1
    assert read_index(spark, path).count() == 50


def test_manifest_protocol_model_based(spark, tmp_path):
    """Randomized interleaving of the protocol's four events — commit,
    crash-before-pointer (orphan generation), crash-during-pointer
    (stray .tmp), append — against a driver-side model of what a
    reader must see. The invariant after EVERY step: read_index
    returns exactly the last committed content plus in-generation
    appends, and the committed generation number never goes backward.
    Deterministic seed; ~12 Spark writes."""
    import random

    from pyspark.sql import functions as F

    rnd = random.Random(20260815)
    path = str(tmp_path / "ivf")
    next_id = [0]

    def batch(n):
        ids = list(range(next_id[0], next_id[0] + n))
        next_id[0] += n
        return ids

    def frame(ids):
        return spark.createDataFrame(
            [(i, i % 3) for i in ids], ["vec_id", "list_id"]
        )

    visible: set[int] | None = None  # None = no commit yet
    last_gen = 0
    ops_done = {"commit": 0, "crash_gen": 0, "crash_tmp": 0, "append": 0}
    for _ in range(12):
        choices = ["commit", "crash_gen", "crash_tmp"]
        if visible is not None:
            choices += ["append", "append"]
        op = rnd.choice(choices)
        ops_done[op] += 1
        if op == "commit":
            ids = set(batch(rnd.randint(3, 8)))
            snap = frame(sorted(ids))
            commit_generation(
                spark,
                path,
                lambda d, s=snap: s.write.mode("overwrite")
                .partitionBy("list_id")
                .parquet(d),
            )
            visible = ids
        elif op == "crash_gen":
            # fully-written generation dir, pointer never published
            gen = last_gen + 1
            frame(batch(4)).write.mode("overwrite").partitionBy("list_id").parquet(
                f"{path}/gen-{gen:08d}"
            )
        elif op == "crash_tmp":
            os.makedirs(f"{path}/{MANIFEST_DIR}", exist_ok=True)
            with open(
                f"{path}/{MANIFEST_DIR}/manifest-{last_gen + 7:08d}.json.tmp", "w"
            ) as fh:
                fh.write('{"generation":')  # torn write
        else:  # append
            ids = set(batch(rnd.randint(1, 4)))
            frame(sorted(ids)).write.mode("append").partitionBy("list_id").parquet(
                resolve_index_path(spark, path)
            )
            visible = visible | ids

        m = latest_manifest(spark, path)
        if visible is None:
            assert m is None
            continue
        assert m is not None and m["generation"] >= last_gen
        last_gen = m["generation"]
        got = {r["vec_id"] for r in read_index(spark, path).collect()}
        assert got == visible, (op, sorted(got ^ visible))
    # the run must have exercised every event kind at least once
    assert all(ops_done.values()), ops_done
