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

Atomicity: each shard writes to a ``.tmp`` name and renames into
place; the manifest (with per-shard sample counts, byte sizes and
sha256) is written LAST and is the publish marker — a reader that
requires the manifest never sees a torn directory (the same
marker-last discipline as ``operators/index_commit.py``).

Sizing note: shard byte size is ``~ total_bytes / n_shards`` —
n_shards is the CALLER's lever and nothing here splits an oversized
shard; size it so shards land in the loader-friendly 100 MB-1 GB
band (and strictly under 2 GB: the reader materializes one shard per
task via ``binaryFile``, which is hard-capped by the JVM byte-array
limit).

Deployment note: executors open ``out_dir`` with plain ``os`` calls,
so it must be a filesystem EVERY executor sees (shared FS / fuse
mount — the usual arrangement for tar-shard corpora); an
object-store variant would stream each tar through the store's
multipart API instead of rename-publish. ``read_webdataset`` reads
the manifest on the driver but scans the shards via Spark's
``binaryFile`` source, which speaks any configured Hadoop
filesystem.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["read_webdataset", "write_webdataset"]


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    members: dict[str, str],
    n_shards: int = 16,
    prefix: str = "shard",
    dynamic_members: dict[str, str] | None = None,
) -> dict:
    """Write ``df`` as ``n_shards`` WebDataset tar shards under
    ``out_dir``; returns the manifest dict (also written as
    ``manifest.json``, last).

    ``members`` maps column name -> member extension, e.g.
    ``{"text": "txt", "image": "jpg", "meta": "json"}``. String
    columns encode UTF-8; binary columns write raw; NULL member
    values are skipped (sample keeps its other members). Keys must
    be unique strings (or castable) — duplicate keys raise, since
    loaders group adjacent same-key members into one sample.

    ``dynamic_members`` maps column name -> EXTENSION COLUMN for the
    multimodal case where the member type varies per row (an image
    row writes ``<key>.jpg``, an audio row ``<key>.wav`` from the
    same payload column, with the extension read from e.g. a ``kind``
    column). Read such datasets back with ``read_webdataset(...,
    raw=True)`` (long form) — a fixed ext->column pivot cannot name
    per-row extensions."""
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
    if os.path.exists(os.path.join(out_dir, "manifest.json")):
        # in-place rewrite would replace shards one-by-one under the
        # OLD manifest — a torn directory behind a valid-looking
        # marker (round-12 review). Fresh generation dirs only, the
        # index_commit discipline this module cites.
        raise ValueError(
            f"{out_dir} is already a published webdataset; "
            "write each run to a fresh directory"
        )

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
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(batches) -> Iterator:
        import hashlib
        import io
        import tarfile
        import uuid

        import pandas as pd

        # one partition may carry several shard ids (hash partitioning
        # is not identity) — group and write one tar per shard id
        open_tars: dict[int, tuple] = {}  # sid -> (tmp_path, tarfile, counter)
        seen_keys: set = set()

        def tar_for(sid: int):
            ent = open_tars.get(sid)
            if ent is None:
                tmp = os.path.join(out_dir, f".{prefix}-{sid:05d}.{uuid.uuid4().hex}.tmp")
                ent = (tmp, tarfile.open(tmp, "w"), [0])
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
                if key in seen_keys:
                    raise ValueError(f"duplicate key in webdataset write: {key!r}")
                seen_keys.add(key)
                _, tf, counter = tar_for(row[s_i])
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

        out_rows = []
        for sid, (tmp, tf, counter) in open_tars.items():
            tf.close()
            final = os.path.join(out_dir, f"{prefix}-{sid:05d}.tar")
            h = hashlib.sha256()
            with open(tmp, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            os.replace(tmp, final)  # atomic publish of the shard
            out_rows.append(
                (sid, os.path.basename(final), counter[0],
                 os.path.getsize(final), h.hexdigest())
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
    # marker-last: the manifest IS the publish
    tmp = os.path.join(out_dir, ".manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
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
    a fixed ext->column pivot cannot name.

    Scale shape: the shard LIST comes from the manifest when one
    exists (a stale tar from an older run in the same directory is
    never read — the glob fallback only applies to foreign,
    manifest-less directories in ``raw`` mode); each task untars ONE
    shard, whose size the WRITER'S caller bounds via n_shards (must
    stay under the 2 GB binaryFile row limit); members pivot to
    columns inside the same pass; no shuffle at all unless a
    sample's members straddle shards, which the writer never
    produces (keys are hash-assigned whole). An empty published
    dataset (manifest with zero shards) reads as an empty frame."""
    import pandas as pd

    manifest = None
    mpath = os.path.join(in_dir, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as fh:
            manifest = json.load(fh)
    if members is None and not raw:
        if manifest is None:
            raise ValueError(
                f"no manifest.json in {in_dir}; pass members= (or raw=True) "
                "to read a foreign webdataset directory"
            )
        members = manifest["members"]

    if manifest is not None:
        paths = [os.path.join(in_dir, sh["path"]) for sh in manifest["shards"]]
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
        loader = spark.read.format("binaryFile").load(os.path.join(in_dir, "*.tar"))
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
                            key, ext = m.name.rsplit(".", 1)
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
                        key, ext = m.name.rsplit(".", 1)
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
