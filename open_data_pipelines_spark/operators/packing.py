"""Sequence packing: group token chunks into fixed-budget context
windows (engine extension for training-data pipelines; BASELINE.json
north-star).

Training consumes fixed-length contexts; documents are variable-
length. Concatenating chunks until the next one would overflow the
budget ("greedy sequential packing") recovers most of the padding
waste — the industry default because it preserves within-document
chunk adjacency, unlike bin-packing by size.

This is the one corpus operator that is genuinely stateful-sequential
(each pack decision depends on the running total), so it cannot be a
Column expression. The distributed form: rows are grouped into
independent packing domains (``group_col``, default a hash shard of
the id), each domain packs greedily in key order inside ONE
``applyInPandas`` call — Arrow-batched, parallel across domains, no
driver involvement. Waste is bounded per domain, not globally, which
at corpus scale is identical in expectation and is what keeps the
operator shuffle-minimal (one hash shuffle on the domain key).

Determinism: pack ids are a pure function of (domain, key order), so
re-runs and different partitionings produce identical packs —
verified by test, the same posture as :mod:`.sampling`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import stable_long_hash


def pack_chunks(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    max_tokens: int,
    group_col: str | None = None,
    n_shards: int = 256,
) -> DataFrame:
    """Assign each row a pack: output adds ``pack_id`` (string,
    ``"<domain>/<seq>"``) and ``pack_tokens`` (total of the pack the
    row landed in).

    Rows with ``tokens > max_tokens`` get a singleton pack (training
    pipelines truncate downstream by policy — the packer never drops
    or splits rows). Rows pack in ascending ``key_col`` order within
    their domain.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be > 0, got {max_tokens}")
    domain = (
        F.col(group_col).cast("string")
        if group_col
        else F.pmod(stable_long_hash(key_col, salt="pack"), F.lit(n_shards)).cast(
            "string"
        )
    )
    src = df.withColumn("__domain", domain)
    out_schema = T.StructType(
        src.schema.fields
        + [
            T.StructField("pack_id", T.StringType(), False),
            T.StructField("pack_tokens", T.LongType(), False),
        ]
    )
    key, tok = key_col, tokens_col
    budget = int(max_tokens)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key, kind="mergesort").reset_index(drop=True)
        dom = pdf["__domain"].iloc[0]
        seq, run = 0, 0
        ids, totals = [], []
        for t in pdf[tok].astype("int64"):
            t = int(t)
            if run > 0 and run + t > budget:
                totals.extend([run] * (len(ids) - len(totals)))
                seq += 1
                run = 0
            ids.append(f"{dom}/{seq}")
            run += t
        totals.extend([run] * (len(ids) - len(totals)))
        pdf["pack_id"] = ids
        pdf["pack_tokens"] = pd.Series(totals, dtype="int64")
        return pdf

    return (
        src.groupBy("__domain")
        .applyInPandas(pack, schema=out_schema)
        .drop("__domain")
    )


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """One-row audit: packs, rows, token utilization (packed tokens /
    pack-slot capacity), oversize singleton count. Run on a sample —
    it is a global aggregate."""
    per_pack = packed.groupBy("pack_id").agg(
        F.first("pack_tokens").alias("pt"), F.count(F.lit(1)).alias("rows")
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("rows").alias("n_rows"),
        F.round(F.sum("pt") / (F.count(F.lit(1)) * F.lit(max_tokens)), 4).alias(
            "utilization"
        ),
        F.sum(F.when(F.col("pt") > F.lit(max_tokens), 1).otherwise(0)).alias(
            "n_oversize"
        ),
    )
