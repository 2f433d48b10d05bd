"""Physical-plan audit across the query registry.

For every registered query, summarize the executed plan: join
strategies, exchange count, parquet pushdown, and read-schema width —
the checklist from the scale brief (does the filter reach the scan, is
the dim join broadcast, is there an avoidable shuffle). Writes
EXPLAIN_AUDIT.md.

    python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")

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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as e
    from open_data_pipelines_spark.session import get_spark

    spark = get_spark("explain_audit")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# EXPLAIN audit",
        "",
        f"Physical-plan summary per registered query at `{sf_dir}`",
        "(local sizes — join strategy picks differ at cluster scale; the",
        "point is that dims broadcast, filters push, scans prune).",
        "",
        "Every query is compiled TWICE: expanded (internal",
        "lazy-checkpoint reuse caches disabled via",
        "`SPARK_GRAFT_NO_INTERNAL_CHECKPOINT=1` — all subtree",
        "scans/filters/exchanges visible, but a subtree shared by N",
        "consumers is counted N times) and checkpointed (production",
        "shape — shared subtrees truncate to `Scan ExistingRDD`, so",
        "their internal shuffles are hidden). The shuffles column",
        "shows `expanded/ckpt`: the pair BRACKETS the executed count",
        "(expanded is the upper bound, ckpt the lower; they coincide",
        "for queries without internal reuse). The other columns read",
        "from the expanded plan, where nothing is hidden.",
        "",
        "| query | broadcast | sort-merge | shuffle-hash | shuffles | global sorts | pushed filters | scan widths |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, fn in e.queries().items():
        try:
            s = summarize(
                fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            )
            # second compile with the reuse checkpoints ENABLED — the
            # production plan shape; its shuffle count is the lower
            # bound of the bracket (the env var is read per
            # lazy_checkpoint call, so toggling it here is enough)
            del os.environ["SPARK_GRAFT_NO_INTERNAL_CHECKPOINT"]
            try:
                ckpt_shuffles = summarize(
                    fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
                )["shuffles"]
            finally:
                os.environ["SPARK_GRAFT_NO_INTERNAL_CHECKPOINT"] = "1"
            lines.append(
                f"| {name} | {s['broadcast_joins']} | {s['sortmerge_joins']} | "
                f"{s['shuffle_hash_joins']} | {s['shuffles']}/{ckpt_shuffles} | "
                f"{s['global_sorts']} | "
                f"{s['pushed_filters']} | {s['scan_widths']} |"
            )
        except Exception as ex:  # noqa: BLE001
            lines.append(f"| {name} | ERROR: {str(ex)[:60]} | | | | | | |")

    out = "EXPLAIN_AUDIT.md"
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(e.queries())} queries)")


if __name__ == "__main__":
    main()
