"""WebDataset tar-shard sink: read-back fidelity, byte determinism,
manifest publish discipline, duplicate/NULL-key fail-loud."""

from __future__ import annotations

import hashlib
import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from open_data_pipelines_spark.session import load_tables
from open_data_pipelines_spark.sinks.webdataset import write_webdataset
from tests.conftest import SF_SMOKE


def _frame(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"].limit(120)
    return docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("sample_key"),
        "text",
        F.to_json(F.struct("lang", "source")).alias("meta"),
        # a binary member: deterministic fake image bytes
        F.encode(F.concat(F.lit("IMG"), F.col("text").substr(1, 16)), "UTF-8").alias("img"),
    )


def _read_all(out_dir):
    samples: dict[str, dict[str, bytes]] = {}
    manifest = json.load(open(os.path.join(out_dir, "manifest.json")))
    for shard in manifest["shards"]:
        with tarfile.open(os.path.join(out_dir, shard["path"])) as tf:
            for m in tf.getmembers():
                key, ext = m.name.rsplit(".", 1)
                samples.setdefault(key, {})[ext] = tf.extractfile(m).read()
    return manifest, samples


def test_round_trip_and_manifest(spark, tmp_path):
    frame = _frame(spark)
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        frame, out, "sample_key", {"text": "txt", "meta": "json", "img": "jpg"},
        n_shards=7,
    )
    got_manifest, samples = _read_all(out)
    assert got_manifest == manifest
    rows = frame.collect()
    assert manifest["n_samples"] == len(rows) == len(samples)
    for r in rows:
        s = samples[r.sample_key]
        assert s["txt"].decode("utf-8") == r.text
        assert json.loads(s["json"]) == json.loads(r.meta)
        assert s["jpg"] == bytes(r.img)
    # every shard accounted, sizes/sha match the files on disk
    assert len(manifest["shards"]) <= 7
    for sh in manifest["shards"]:
        p = os.path.join(out, sh["path"])
        assert os.path.getsize(p) == sh["bytes"]
        assert hashlib.sha256(open(p, "rb").read()).hexdigest() == sh["sha256"]
    # no tmp residue
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]


def test_byte_determinism_across_runs_and_partitionings(spark, tmp_path):
    frame = _frame(spark)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ma = write_webdataset(frame, a, "sample_key", {"text": "txt"}, n_shards=5)
    mb = write_webdataset(
        frame.repartition(13), b, "sample_key", {"text": "txt"}, n_shards=5
    )
    assert {s["shard"]: s["sha256"] for s in ma["shards"]} == {
        s["shard"]: s["sha256"] for s in mb["shards"]
    }
    for s in ma["shards"]:
        assert open(os.path.join(a, s["path"]), "rb").read() == open(
            os.path.join(b, s["path"]), "rb"
        ).read()


def test_null_member_skipped_null_and_dup_keys_raise(spark, tmp_path):
    df = spark.createDataFrame(
        [("k1", "text one", None), ("k2", None, b"\x00\x01")],
        "sample_key string, text string, img binary",
    )
    out = str(tmp_path / "ok")
    write_webdataset(df, out, "sample_key", {"text": "txt", "img": "bin"}, n_shards=2)
    _, samples = _read_all(out)
    assert set(samples["k1"]) == {"txt"} and set(samples["k2"]) == {"bin"}

    dup = spark.createDataFrame(
        [("k", "a"), ("k", "b")], "sample_key string, text string"
    )
    with pytest.raises(Exception, match="duplicate key"):
        write_webdataset(dup, str(tmp_path / "dup"), "sample_key", {"text": "txt"})

    nul = spark.createDataFrame([(None, "a")], "sample_key string, text string")
    with pytest.raises(Exception, match="NULL key"):
        write_webdataset(nul, str(tmp_path / "nul"), "sample_key", {"text": "txt"})

    with pytest.raises(ValueError, match="columns not in frame"):
        write_webdataset(df, str(tmp_path / "x"), "sample_key", {"nope": "txt"})
    with pytest.raises(ValueError, match="at least one column"):
        write_webdataset(df, str(tmp_path / "y"), "sample_key", {})


def test_read_back_as_dataframe(spark, tmp_path):
    frame = _frame(spark)
    out = str(tmp_path / "rt")
    write_webdataset(
        frame, out, "sample_key", {"text": "txt", "meta": "json", "img": "jpg"},
        n_shards=4,
    )
    from open_data_pipelines_spark.sinks.webdataset import read_webdataset

    back = read_webdataset(spark, out)
    got = {
        r.sample_key: (bytes(r.text).decode("utf-8"), bytes(r.meta), bytes(r.img))
        for r in back.collect()
    }
    want = {
        r.sample_key: (r.text, r.meta.encode("utf-8"), bytes(r.img))
        for r in frame.collect()
    }
    assert got == want
    # no shuffle in the read plan: binaryFile scan -> mapInPandas
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dynamic_members_multimodal(spark, tmp_path):
    """Per-row extensions from a kind column (image rows write .jpg,
    audio rows .wav from one payload column); read back in raw long
    form."""
    rows = [
        ("m1", "jpg", b"\xff\xd8fakejpeg", "caption one"),
        ("m2", "wav", b"RIFFfakewav", "caption two"),
        ("m3", "mp4", b"\x00\x00ftypfake", None),
        ("m4", None, b"ignored", "caption only"),  # null ext: payload skipped
    ]
    df = spark.createDataFrame(rows, "media_id string, kind string, payload binary, caption string")
    out = str(tmp_path / "mm")
    manifest = write_webdataset(
        df, out, "media_id", {"caption": "txt"},
        dynamic_members={"payload": "kind"}, n_shards=3,
    )
    assert manifest["dynamic_members"] == {"payload": "kind"}
    from open_data_pipelines_spark.sinks.webdataset import read_webdataset

    back = read_webdataset(spark, out, raw=True)
    got = {(r.sample_key, r.ext): bytes(r.content) for r in back.collect()}
    assert got == {
        ("m1", "jpg"): b"\xff\xd8fakejpeg",
        ("m1", "txt"): b"caption one",
        ("m2", "wav"): b"RIFFfakewav",
        ("m2", "txt"): b"caption two",
        ("m3", "mp4"): b"\x00\x00ftypfake",
        ("m4", "txt"): b"caption only",
    }


def test_export_media_funnel_output(spark, tmp_path):
    """Composition: prepare_media_corpus survivors -> WebDataset
    shards with per-row extensions derived from the media kind."""
    from open_data_pipelines_spark.plans.media_prep import prepare_media_corpus
    from open_data_pipelines_spark.queries.media import media_bronze_frame
    from open_data_pipelines_spark.sinks.webdataset import read_webdataset

    survivors = prepare_media_corpus(
        media_bronze_frame(spark, SF_SMOKE), max_hamming=2
    ).filter(F.col("signature").isNotNull())
    ext = F.when(F.col("kind") == "image", "jpg").when(
        F.col("kind") == "audio", "wav"
    ).otherwise("mp4")
    frame = survivors.select(
        F.col("media_id").cast("string").alias("media_id"),
        ext.alias("ext"),
        # bronze-signed frame carries no payload; export the
        # signature bytes as a stand-in binary member
        F.encode(F.col("signature").cast("string"), "UTF-8").alias("payload"),
        F.to_json(F.struct("kind", "signature")).alias("meta"),
    )
    out = str(tmp_path / "media_wds")
    manifest = write_webdataset(
        frame, out, "media_id", {"meta": "json"},
        dynamic_members={"payload": "ext"}, n_shards=4,
    )
    n = frame.count()
    assert manifest["n_samples"] == n
    back = read_webdataset(spark, out, raw=True)
    per_key = back.groupBy("sample_key").count().collect()
    assert len(per_key) == n
    assert all(r["count"] == 2 for r in per_key)  # payload + meta each


def test_export_packed_corpus(spark, tmp_path):
    """Composition: prepare_corpus packed chunks -> text shards keyed
    by (split, pack) — the end-to-end 'curate then package' path."""
    from open_data_pipelines_spark.plans.corpus_prep import prepare_corpus

    packed = prepare_corpus(
        spark, SF_SMOKE, chunk_size=32, overlap=0, near_dup="none",
        splits=(("train", 0.9), ("val", 0.1)), pack_budget=128,
    )
    samples = packed.groupBy("split", "pack_id").agg(
        F.concat_ws("\n\n", F.collect_list("chunk")).alias("text"),
        F.sum("pack_tokens").alias("n_tokens"),
    ).select(
        F.concat_ws("/", "split", F.col("pack_id").cast("string")).alias("sample_key"),
        "text",
        F.to_json(F.struct("split", "n_tokens")).alias("meta"),
    )
    out = str(tmp_path / "packed_wds")
    manifest = write_webdataset(
        samples, out, "sample_key", {"text": "txt", "meta": "json"}, n_shards=3
    )
    assert manifest["n_samples"] == samples.count() > 0
    _, got = _read_all(out)
    some_key = next(iter(got))
    assert got[some_key]["txt"].decode("utf-8")


def test_publish_refusal_stale_shards_and_empty_read(spark, tmp_path):
    """round-12 review: no in-place rewrite of a published dir; the
    reader trusts the manifest, never a directory glob; an empty
    published dataset reads as an empty frame."""
    from open_data_pipelines_spark.sinks.webdataset import read_webdataset

    df = spark.createDataFrame([("k1", "one"), ("k2", "two")], "sample_key string, text string")
    out = str(tmp_path / "pub")
    write_webdataset(df, out, "sample_key", {"text": "txt"}, n_shards=2)
    with pytest.raises(ValueError, match="already a published"):
        write_webdataset(df, out, "sample_key", {"text": "txt"})

    # stale tar planted next to the live shards: manifest-driven read
    # must ignore it
    with open(os.path.join(out, "shard-99999.tar"), "wb") as fh:
        import io as _io
        import tarfile as _tarfile

        with _tarfile.open(fileobj=fh, mode="w") as tf:
            data = b"stale"
            info = _tarfile.TarInfo("zz.txt")
            info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))
    got = {r.sample_key for r in read_webdataset(spark, out).collect()}
    assert got == {"k1", "k2"}

    empty = spark.createDataFrame([], "sample_key string, text string")
    eout = str(tmp_path / "empty")
    m = write_webdataset(empty, eout, "sample_key", {"text": "txt"}, n_shards=4)
    assert m["n_samples"] == 0 and m["shards"] == []
    assert read_webdataset(spark, eout).count() == 0
    assert read_webdataset(spark, eout, raw=True).count() == 0


def test_ext_validation_and_all_null_rows(spark, tmp_path):
    df = spark.createDataFrame(
        [("k1", "a", "b")], "sample_key string, caption string, summary string"
    )
    with pytest.raises(ValueError, match="duplicate member extensions"):
        write_webdataset(df, str(tmp_path / "d"), "sample_key",
                         {"caption": "txt", "summary": "txt"})

    # dynamic ext colliding with a fixed ext raises in the worker
    dyn = spark.createDataFrame(
        [("k1", "txt", b"x", "cap")], "sample_key string, kind string, payload binary, caption string"
    )
    with pytest.raises(Exception, match="extension collision"):
        write_webdataset(dyn, str(tmp_path / "e"), "sample_key",
                         {"caption": "txt"}, dynamic_members={"payload": "kind"})

    # a row whose every member is NULL is not a sample
    nulls = spark.createDataFrame(
        [("k1", "text"), ("k2", None)], "sample_key string, text string"
    )
    m = write_webdataset(nulls, str(tmp_path / "f"), "sample_key", {"text": "txt"})
    assert m["n_samples"] == 1


def test_file_scheme_uri_round_trip_and_determinism(spark, tmp_path):
    """Round-12 verdict: every byte must move through the filesystem
    of the path's SCHEME, not driver/executor-local ``os`` calls. The
    file:// form exercises the scheme-resolved path end to end:
    write, publish-refusal, byte determinism vs the plain-path write,
    manifest-driven read-back ignoring a stale tar."""
    import pytest as _pytest

    frame = _frame(spark)
    plain = str(tmp_path / "plain")
    uri = "file://" + str(tmp_path / "viauri")
    mp = write_webdataset(frame, plain, "sample_key", {"text": "txt"}, n_shards=5)
    mu = write_webdataset(frame, uri, "sample_key", {"text": "txt"}, n_shards=5)
    # identical shards whichever way the filesystem was reached
    assert {s["shard"]: s["sha256"] for s in mp["shards"]} == {
        s["shard"]: s["sha256"] for s in mu["shards"]
    }
    # manifest bytes/sha describe the real files
    for s in mu["shards"]:
        p = os.path.join(str(tmp_path / "viauri"), s["path"])
        assert os.path.getsize(p) == s["bytes"]
        assert hashlib.sha256(open(p, "rb").read()).hexdigest() == s["sha256"]
    assert not [
        f for f in os.listdir(str(tmp_path / "viauri")) if f.endswith(".tmp")
    ]
    # publish refusal sees the manifest through the scheme too
    with _pytest.raises(ValueError, match="already a published"):
        write_webdataset(frame, uri, "sample_key", {"text": "txt"})
    # torn-directory discipline: stale tar next to live shards is
    # invisible to a manifest-driven scheme-path read
    with open(os.path.join(str(tmp_path / "viauri"), "shard-99999.tar"), "wb") as fh:
        import io as _io
        import tarfile as _tarfile

        with _tarfile.open(fileobj=fh, mode="w") as tf:
            data = b"stale"
            info = _tarfile.TarInfo("zz.txt")
            info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))
    from open_data_pipelines_spark.sinks.webdataset import read_webdataset

    back = read_webdataset(spark, uri)
    got = {r.sample_key: bytes(r.text).decode("utf-8") for r in back.collect()}
    want = {r.sample_key: r.text for r in frame.collect()}
    assert got == want


def test_dotted_key_refused(spark, tmp_path):
    """WebDataset member names split key/extension at the FIRST dot
    (round-12 advice) — a dotted key could not round-trip, so the
    writer fails loud instead of writing a shard loaders would
    mis-group."""
    import pytest as _pytest

    df = spark.createDataFrame([("v1.5", "text")], "sample_key string, text string")
    with _pytest.raises(Exception, match="must not contain"):
        write_webdataset(df, str(tmp_path / "dot"), "sample_key", {"text": "txt"})


def test_dynamic_only_dataset_requires_raw(spark, tmp_path):
    """Round-12 advice: a dynamic-members-only dataset read with
    default args used to die on a malformed empty-pivot schema; it
    must instead say 'use raw=True'."""
    import pytest as _pytest

    from open_data_pipelines_spark.sinks.webdataset import read_webdataset

    df = spark.createDataFrame(
        [("m1", "jpg", b"\xff\xd8x"), ("m2", "wav", b"RIFFx")],
        "media_id string, kind string, payload binary",
    )
    out = str(tmp_path / "dynonly")
    write_webdataset(df, out, "media_id", {}, dynamic_members={"payload": "kind"})
    with _pytest.raises(ValueError, match="raw=True"):
        read_webdataset(spark, out)
    got = {(r.sample_key, r.ext) for r in read_webdataset(spark, out, raw=True).collect()}
    assert got == {("m1", "jpg"), ("m2", "wav")}


def test_foreign_multipart_extension_groups_by_first_dot(spark, tmp_path):
    """Round-12 advice: foreign shards with multi-part extensions
    ('x.seg.png') must group with their 'x.txt' sibling — the
    webdataset loader convention splits at the FIRST dot."""
    import io as _io
    import tarfile as _tarfile

    from open_data_pipelines_spark.sinks.webdataset import read_webdataset

    d = tmp_path / "foreign"
    d.mkdir()
    with open(d / "part-0.tar", "wb") as fh:
        with _tarfile.open(fileobj=fh, mode="w") as tf:
            for name, data in [
                ("x.seg.png", b"segpng"),
                ("x.txt", b"caption x"),
                ("y.txt", b"caption y"),
            ]:
                info = _tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, _io.BytesIO(data))
    long = read_webdataset(spark, str(d), raw=True)
    got = {(r.sample_key, r.ext): bytes(r.content) for r in long.collect()}
    assert got == {
        ("x", "seg.png"): b"segpng",
        ("x", "txt"): b"caption x",
        ("y", "txt"): b"caption y",
    }
    # wide form: the multi-part extension is addressable as a column
    wide = read_webdataset(
        spark, str(d), members={"seg": "seg.png", "caption": "txt"}
    )
    rows = {r.sample_key: (r.seg, bytes(r.caption)) for r in wide.collect()}
    assert rows["x"] == (b"segpng", b"caption x")
    assert rows["y"] == (None, b"caption y")


def test_mock_object_store_takes_remote_branch(spark, tmp_path):
    """Round-14 (VERDICT r13 #7): the remote code route, proven on a
    mock object store (tests/wds_mock_fs.py — a PyFileSystem handler
    with a non-'local' type_name that REFUSES rename). The write must
    succeed (a silent fallback to the local tmp+rename publish would
    raise inside the mock's move()), never open a dotted tmp name,
    produce shards byte-identical to the plain-path write, and carry
    stream-folded digests that match the bytes on 'the store'."""
    import hashlib

    frame = _frame(spark)
    root = tmp_path / "mockstore"
    root.mkdir()
    uri = f"mockremote://{root}!ds"
    os.environ["SPARK_GRAFT_WDS_FS_FACTORY"] = "tests.wds_mock_fs:factory"
    try:
        m_remote = write_webdataset(
            frame, uri, "sample_key", {"text": "txt"}, n_shards=5
        )
    finally:
        os.environ.pop("SPARK_GRAFT_WDS_FS_FACTORY", None)

    # every output open is journaled by the mock: final names only —
    # the rename-publish branch would have opened '.shard-…tmp' names
    ops = (root / "__ops.log").read_text().strip().splitlines()
    opened = [l.split(" ", 1)[1] for l in ops if l.startswith("open_output_stream")]
    assert opened, "mock filesystem never reached — factory not engaged"
    assert all(not os.path.basename(p).startswith(".") for p in opened), opened
    assert "ds/manifest.json" in opened

    # byte determinism across filesystems + digest-on-stream honesty
    m_plain = write_webdataset(
        frame, str(tmp_path / "plain"), "sample_key", {"text": "txt"}, n_shards=5
    )
    assert {s["shard"]: s["sha256"] for s in m_remote["shards"]} == {
        s["shard"]: s["sha256"] for s in m_plain["shards"]
    }
    for s in m_remote["shards"]:
        data = (root / "ds" / s["path"]).read_bytes()
        assert hashlib.sha256(data).hexdigest() == s["sha256"]
        assert len(data) == s["bytes"]

    # publish-refusal holds on the mock store too (manifest present)
    with pytest.raises(Exception, match="already a published webdataset"):
        os.environ["SPARK_GRAFT_WDS_FS_FACTORY"] = "tests.wds_mock_fs:factory"
        try:
            write_webdataset(frame, uri, "sample_key", {"text": "txt"})
        finally:
            os.environ.pop("SPARK_GRAFT_WDS_FS_FACTORY", None)


def test_reader_refuses_factory_claimed_scheme(spark, tmp_path):
    """The factory seam is write/manifest-side only — shard loading
    goes through the JVM binaryFile source, which a Python factory
    can never serve. The reader must refuse UP FRONT (round-14
    review: it used to pass the manifest check then die inside the
    scan with a bare 'No FileSystem for scheme')."""
    from open_data_pipelines_spark.sinks.webdataset import read_webdataset

    frame = _frame(spark)
    root = tmp_path / "store"
    root.mkdir()
    uri = f"mockremote://{root}!ds"
    os.environ["SPARK_GRAFT_WDS_FS_FACTORY"] = "tests.wds_mock_fs:factory"
    try:
        write_webdataset(frame, uri, "sample_key", {"text": "txt"}, n_shards=3)
        with pytest.raises(ValueError, match="JVM binaryFile"):
            read_webdataset(spark, uri)
    finally:
        os.environ.pop("SPARK_GRAFT_WDS_FS_FACTORY", None)
    # the same bytes ARE readable through a JVM-resolvable path
    got = read_webdataset(spark, str(root / "ds"))
    assert got.count() == frame.count()


def test_reader_probe_skips_local_paths_and_wraps_errors(spark, tmp_path):
    """Round-15 review: the reader's factory probe runs on every read,
    so a stale/unimportable SPARK_GRAFT_WDS_FS_FACTORY must not break
    reads it could never serve. Schemeless local paths skip the probe
    entirely; schemed paths that DO hit the broken factory fail with
    the env var named, not a bare ImportError."""
    from open_data_pipelines_spark.sinks.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    frame = _frame(spark)
    out = str(tmp_path / "ds")
    write_webdataset(frame, out, "sample_key", {"text": "txt"}, n_shards=2)
    os.environ["SPARK_GRAFT_WDS_FS_FACTORY"] = "no_such_module_xyz:factory"
    try:
        # local path: probe skipped, read succeeds despite the broken factory
        assert read_webdataset(spark, out).count() == frame.count()
        # schemed path: the probe fires, fails, and names the env var
        with pytest.raises(RuntimeError, match="SPARK_GRAFT_WDS_FS_FACTORY"):
            read_webdataset(spark, "mockremote://nowhere!ds")
    finally:
        os.environ.pop("SPARK_GRAFT_WDS_FS_FACTORY", None)
