"""The repo's ONE internal-reuse caching primitive.

Operators and plans that consume an expensive subtree more than once
cache it with a LAZY ``localCheckpoint`` — materialized on first use,
blocks reclaimed by the ContextCleaner when the result frame is
garbage-collected — never a bare internal ``.persist()`` whose handle
the caller can't release (the unreclaimable-cache pattern review
rounds flag). Trade-off, documented once here: checkpoint blocks are
unreplicated, so losing an executor fails the job fast instead of
silently recomputing — acceptable for derived reuse caches, and the
REQUIRED failure mode for key generation (see
``operators/scd2.with_surrogate_keys_scaled``, which stays on a raw
eager checkpoint precisely because its checkpoint is load-bearing for
correctness, not a reuse cache).

Two sanctioned ``persist()`` shapes remain, neither an internal reuse
cache: (a) a persist that is released in the SAME function (``try/
finally unpersist`` — e.g. the training-pair scratch frames in
``operators/lm_score.train_ngram_lm`` and ``operators/pq.train_pq``),
and (b) a persist ON THE RETURNED FRAME under a documented caller-owned
unpersist contract (``plans/media_prep.prepare_media_corpus`` — the
handle is the caller's to release, which is exactly what an internal
persist denies them).

``SPARK_GRAFT_NO_INTERNAL_CHECKPOINT=1`` turns :func:`lazy_checkpoint`
into a no-op. Two uses:

- **plan auditing**: a checkpoint truncates lineage to a
  ``Scan ExistingRDD`` node, hiding the subtree's exchanges, pushed
  filters, and scan widths from ``.explain`` — ``tools/
  explain_audit.py`` sets the flag so EXPLAIN_AUDIT.md reports the
  FULL logical plan (what executes once per subtree, not what the
  truncated top plan shows);
- **debugging**: recompute-everything semantics reproduce issues that
  block reuse can mask.

The flag changes reuse strategy only, never results.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def lazy_checkpoint(df: DataFrame, eager: bool = False) -> DataFrame:
    """Local checkpoint per the repo convention (no-op under
    ``SPARK_GRAFT_NO_INTERNAL_CHECKPOINT=1``), lazy by default.

    ``eager=True`` exists for ONE reason: ``df.observe`` metrics in
    the checkpointed subtree. Measured rule (probed on this Spark
    version, regression-pinned by
    ``tests/test_corpus_prep.py::test_observe_audit_with_perplexity_stage``):
    an observation UNDER a lazy checkpoint is fulfilled with 0 unless
    a shuffle sits between the observed node and the checkpoint; an
    EAGER checkpoint's own materialization action always fulfills it
    with the true counts. Plans that attach observations below a reuse
    checkpoint (the corpus funnel's observe-stats mode) must pass
    ``eager=True`` — relying on an intervening shuffle is correct
    today but silently breaks if the operator between them stops
    shuffling. Everything else stays lazy: materialized on first use,
    no extra job when the caller never executes the plan."""
    if os.environ.get("SPARK_GRAFT_NO_INTERNAL_CHECKPOINT"):
        return df
    return df.localCheckpoint(eager=eager)
