"""End-to-end multimodal corpus preparation (engine extension): the
media-side composition of the dedup/quarantine/manifest machinery —
what :mod:`.corpus_prep` is to the documents table, this is to a
media frame (``media_id``, ``content`` binary + optional metadata), or
to the streaming bronze :mod:`..streaming.media_stream` lands.

Stage order mirrors the text funnel's discipline, adapted to media:

1. **signature** — skipped when ``kind``/``signature`` columns already
   exist (the streaming bronze computed them ON ARRIVAL; this pipeline
   never re-decodes pixels it already paid for). Otherwise one
   Arrow-batched :func:`..streaming.media_stream.with_media_signature`
   pass.
2. **quarantine split** — undecodable rows (NULL signature) carry no
   duplication evidence; they are set aside and (by default) re-joined
   to the output, mirroring the per-kind dedup operators' keep policy.
3. **exact dedup FIRST** — one representative (min id) per
   (kind, signature): collapses byte-identical re-uploads and
   PCM-identical re-encodes in one hash shuffle before any banding.
4. **near-dup within kind** — Hamming-banded candidate pairs over the
   already-computed signatures, PER KIND (an image aHash and an audio
   fingerprint must never band together), then the shared
   cluster-minimum endgame. Only 8-byte signatures shuffle.
5. **manifest** (opt-in) — the same content-signature release record
   as the text funnel (:mod:`.manifest`).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import top1_per_key
from ..operators.graph import keep_cluster_representatives
from ..operators.image_dedup import image_near_dup_pairs
from ..streaming.media_stream import with_media_signature


def prepare_media_corpus(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    max_hamming: int = 6,
    decoder: Callable[[bytes], dict] | None = None,
    keep_undecodable: bool = True,
    manifest_path: str | None = None,
    with_stats: bool = False,
) -> DataFrame | tuple[DataFrame, dict[str, int]]:
    """media frame -> perceptually deduplicated corpus (one
    representative per near-dup cluster per kind), with the funnel
    counts and release manifest the text pipeline offers.

    ``with_stats=True`` returns ``(out, stats)`` with per-stage counts
    (count-mode only — media frames are decode-bound, so the audit's
    extra scans re-read signatures, never pixels, once the signature
    column exists).
    """
    stats: dict[str, int] = {}

    def note(name: str, frame: DataFrame) -> DataFrame:
        if with_stats:
            stats[name] = frame.count()
        return frame

    if "signature" not in df.columns or "kind" not in df.columns:
        df = with_media_signature(df, content_col, decoder=decoder)
    df = note("input", df)

    decodable = df.filter(F.col("signature").isNotNull())
    quarantine = note("quarantined", df.filter(F.col("signature").isNull()))

    exact = note(
        "exact_deduped",
        top1_per_key(decodable, ["kind", "signature"], [F.col(id_col).asc()]),
    )

    # bounded collect: the distinct media kinds (a handful by nature)
    kinds = sorted(
        r["kind"] for r in exact.select("kind").distinct().collect() if r["kind"]
    )
    pairs = None
    for kind in kinds:
        sub = exact.filter(F.col("kind") == kind).select(
            id_col, F.col("signature").alias("__h")
        )
        p = image_near_dup_pairs(sub, id_col, hash_col="__h", max_hamming=max_hamming)
        pairs = p.select("id_a", "id_b") if pairs is None else pairs.unionByName(
            p.select("id_a", "id_b")
        )
    out = exact if pairs is None else keep_cluster_representatives(exact, pairs, id_col)
    out = note("near_deduped", out)

    if keep_undecodable:
        out = out.unionByName(quarantine)
    out = note("output", out)

    if manifest_path is not None:
        from .manifest import write_corpus_manifest

        # sign metadata + signatures, NOT the raw bytes: re-hashing
        # every blob would re-shuffle content; (id, kind, signature)
        # is already a content-derived identity per row
        write_corpus_manifest(
            manifest_path,
            out.select(id_col, "kind", "signature"),
            config={
                "max_hamming": max_hamming,
                "keep_undecodable": keep_undecodable,
            },
            stats=stats or None,
        )

    return (out, stats) if with_stats else out
