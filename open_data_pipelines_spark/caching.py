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
import warnings

from pyspark.sql import DataFrame

# Checkpoint-free grind guard (round 14; VERDICT r13 #5). With the
# kill switch set, every skipped checkpoint leaves its subtree to be
# RE-EMBEDDED once per downstream consumer — on a deep composite plan
# (the corpus funnel) the duplicated expression forest grows
# multiplicatively and Catalyst's constant-heavy rules (PruneFilters)
# ground for 25+ minutes (EXPLAIN_AUDIT.md footnote, measured round
# 13). The tree itself cannot be probed cheaply — analysis of the
# expanded plan is exactly the cost being avoided (a collectLeaves
# probe on the funnel shape ran past 400 s) — so the guard is the
# verdict's construction-time arithmetic: each skipped checkpoint
# multiplies a session-cumulative estimate by its declared consumer
# count (callers pass ``consumers``; the default 2 is the minimum a
# reuse cache implies), and crossing the limit warns ONCE, loudly.
# Session-cumulative is deliberate and conservative: any no-op'd
# frame MAY later be composed with any other; resetting between
# "constructions" would need a boundary the library cannot see.
_nockpt_state = {"blowup": 1, "points": 0, "warned": False}


def _nockpt_limit() -> int:
    # read per call, like the sibling kill switch — a limit set after
    # import must take effect (round-14 review)
    return int(os.environ.get("SPARK_GRAFT_NO_CKPT_WARN_LIMIT", "32"))


class CheckpointFreeDepthWarning(UserWarning):
    """SPARK_GRAFT_NO_INTERNAL_CHECKPOINT is set on a plan deep enough
    to risk a multi-minute Catalyst optimization grind."""


def _reset_checkpoint_free_estimate() -> None:
    """Test hook: zero the session-cumulative blowup estimate."""
    _nockpt_state.update(blowup=1, points=0, warned=False)


def _note_checkpoint_free(consumers: int) -> None:
    _nockpt_state["blowup"] *= max(consumers, 1)
    _nockpt_state["points"] += 1
    if _nockpt_state["blowup"] >= _nockpt_limit() and not _nockpt_state["warned"]:
        _nockpt_state["warned"] = True
        warnings.warn(
            "SPARK_GRAFT_NO_INTERNAL_CHECKPOINT is set and this session has "
            f"now skipped {_nockpt_state['points']} reuse checkpoints with a "
            f"combined consumer fan-out of ~{_nockpt_state['blowup']}x. If "
            "these frames compose into one plan, every skipped subtree is "
            "re-embedded per consumer and Catalyst optimization can grind "
            "for MINUTES (the corpus-funnel shape measured 25+ min; see "
            "EXPLAIN_AUDIT.md). Unset the flag for production runs, or "
            "budget the compile like tools/explain_audit.py does "
            "(SPARK_GRAFT_AUDIT_EXPANDED_BUDGET).",
            CheckpointFreeDepthWarning,
            stacklevel=3,
        )


# Segment-audit collector (round 15; VERDICT r14 #5). The expanded
# (checkpoint-free) compile of the deepest composition — the corpus
# funnel — is intractable by construction (the grind the guard above
# warns about), so its EXPLAIN_AUDIT row had no expanded upper bound.
# The per-SEGMENT bracket replaces it: while a collector is active,
# every lazy_checkpoint records its input's compiled physical plan
# text BEFORE truncation. Checkpoint boundaries partition the full
# plan — each segment's own inputs are already truncated — so
# sum(segment exchanges) + the final top-plan exchanges is an upper
# bound on the exchanges the production run can plan, computed in
# seconds instead of the 25+ minutes the monolithic expanded compile
# costs. (A subtree reused WITHOUT a checkpoint still re-embeds into
# multiple segments and counts once per appearance — the same
# once-per-consumer upper-bound semantics the expanded compile had.)
_segment_collector: list | None = None


class collect_checkpoint_segments:
    """Context manager audit hook (tools/explain_audit.py): yields a
    list that accumulates one compiled-plan string per
    ``lazy_checkpoint`` reached while active."""

    def __enter__(self) -> list:
        global _segment_collector
        self._prev = _segment_collector
        _segment_collector = []
        return _segment_collector

    def __exit__(self, *exc) -> None:
        global _segment_collector
        _segment_collector = self._prev


# Checkpoint prefetch (round 16; guide §2.6 — overlap independent
# jobs). A lazy localCheckpoint compiles its segment's physical plan
# at CONSTRUCTION (Dataset.localCheckpoint calls queryExecution.toRdd
# eagerly) but EXECUTES it at first use — so a chain of checkpointed
# segments serializes strictly: [compile 1..N on the driver] then
# [execute 1..N on the executors], with the driver idle during
# execution and the executors idle during compilation. Prefetch
# submits each segment's materialization to a background thread the
# moment the segment is constructed: segment N executes WHILE the
# main thread builds (analyzes, optimizes, plans) segment N+1 — the
# compile-segment-N+1-while-N-executes overlap of VERDICT r15 #3.
#
# Properties that keep this an execution-order change only:
# - the materializing action is a noop-sink write of the checkpointed
#   frame itself — exactly the job its first use would have run;
# - results are byte-identical (the checkpoint blocks are the same
#   blocks, computed once; Spark's DAGScheduler shares shuffle-map
#   stages between the prefetch job and the consumer job because both
#   reference the same RDD objects);
# - a single worker thread serializes prefetches in construction
#   order, so each segment finds its upstream blocks already cached;
# - NOTHING outlives the query: the work queue holds the only extra
#   reference, the worker is a daemon thread (interpreter exit never
#   blocks on an in-flight prefetch), and a prefetch failure is
#   swallowed — the consumer job recomputes exactly as before.
# Worst case (slow executors) the consumer action arrives while the
# prefetch is mid-flight and the post-shuffle narrow tail of ONE
# segment is computed twice — bounded duplicate work, never wrong
# results (cache puts are idempotent).
#
# Opt-in per call site: a lazy checkpoint's "no job unless the caller
# executes" contract must hold for explain/audit paths, so only
# operators on ALWAYS-EXECUTED query paths pass prefetch=True.
# ``SPARK_GRAFT_NO_CKPT_PREFETCH=1`` kills it globally (debugging /
# single-threaded-driver comparisons).
_prefetch_queue = None


def _prefetch_worker(q) -> None:
    while True:
        out = q.get()
        try:
            sc = out.sparkSession.sparkContext
            # job descriptions are thread-local (guide §1.5) — label
            # the background jobs so event logs attribute them
            sc.setJobDescription("ckpt-prefetch")
            out.write.format("noop").mode("overwrite").save()
        except Exception:
            # best-effort: the consumer's first use materializes the
            # checkpoint exactly as it would have without prefetch
            pass
        finally:
            q.task_done()


def _prefetch(out: DataFrame) -> None:
    global _prefetch_queue
    if _prefetch_queue is None:
        import queue
        import threading

        _prefetch_queue = queue.Queue()
        threading.Thread(
            target=_prefetch_worker,
            args=(_prefetch_queue,),
            name="ckpt-prefetch",
            daemon=True,
        ).start()
    _prefetch_queue.put(out)


def drain_prefetch() -> None:
    """Block until every submitted prefetch has finished — test/bench
    hygiene so a background materialization can never bleed CPU into
    a subsequent timed region."""
    if _prefetch_queue is not None:
        _prefetch_queue.join()


def lazy_checkpoint(
    df: DataFrame,
    eager: bool = False,
    consumers: int = 2,
    prefetch: bool = False,
) -> DataFrame:
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
    no extra job when the caller never executes the plan.

    ``consumers`` declares how many downstream consumers the cached
    frame feeds (the default 2 is the minimum that justifies a reuse
    cache). It changes nothing when the checkpoint runs; under the
    kill switch it feeds the grind-guard estimate above.

    ``prefetch=True`` (round 16) starts the segment's materialization
    on a background thread immediately — see the prefetch note above.
    Only pass it on paths whose plan is ALWAYS executed (query
    functions, bench paths); it is ignored in audit mode and under
    ``SPARK_GRAFT_NO_CKPT_PREFETCH=1``."""
    if os.environ.get("SPARK_GRAFT_NO_INTERNAL_CHECKPOINT"):
        _note_checkpoint_free(consumers)
        return df
    if _segment_collector is not None:
        _segment_collector.append(
            df._jdf.queryExecution().executedPlan().toString()
        )
    out = df.localCheckpoint(eager=eager)
    if (
        prefetch
        and not eager
        and not os.environ.get("SPARK_GRAFT_NO_CKPT_PREFETCH")
    ):
        _prefetch(out)
    return out
