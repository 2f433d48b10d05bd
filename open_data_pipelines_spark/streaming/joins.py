"""Stream-stream joins: watermarked interval equi-joins.

The remaining Structured Streaming operator family (windows, sessions,
dedup, arbitrary state live in :mod:`.windows` / :mod:`.stateful`):
correlating two live streams — e.g. purchases with the error events
the same user raised minutes earlier. Batch/stream parity holds by
construction: the join predicate is the same
``key-equal AND time-within-interval`` expression a batch interval
join uses, so an ``availableNow`` drain converges to the batch answer
(asserted in tests).

Scale design: both sides shuffle-partition on the join key (one
exchange each — unavoidable: a stream-stream join IS stateful
co-location), and the watermarks + interval bound state retention:
a row can only match partners within ``[ts - lower, ts + upper]``, so
the state store evicts rows older than ``watermark + interval``.
Spark only HARD-requires the time bound for outer variants (it must
know when an unmatched row is final — asserted in tests); an inner
equi-join without one is accepted but its state grows without bound,
which is why this API makes the interval mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "10 minutes",
    upper: str = "10 minutes",
    watermark: str = "30 minutes",
    right_suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``on`` whose right timestamp lies in
    ``[left_ts - lower, left_ts + upper]``.

    Right-side columns are suffixed (Spark resolves stream-stream
    joins by name, so both sides must be disjoint). Works unchanged on
    batch frames — ``withWatermark`` is a no-op there — which is what
    the parity tests exploit.

    ``how``: ``inner`` (append-mode capable) or the watermark-aware
    outer variants (``leftOuter``/``rightOuter``/``fullOuter`` emit
    unmatched rows once the watermark passes their interval).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    renamed = rw.select(
        F.col(on).alias(f"{on}{right_suffix}"),
        *[
            F.col(c).alias(f"{c}{right_suffix}")
            for c in rw.columns
            if c != on
        ],
    )
    rk, rt = f"{on}{right_suffix}", f"{right_ts}{right_suffix}"
    cond = (
        (F.col(on) == F.col(rk))
        & (F.col(rt) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(rt) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(renamed, cond, how)
