from __future__ import annotations

from open_data_pipelines_spark.plans.dag import Dag


def test_incremental_model_merges_on_unique_key(spark):
    batches = [
        [(1, "a1"), (2, "b1")],
        [(2, "b2"), (3, "c1")],  # updates key 2, adds key 3
    ]
    state = {"i": 0}

    def run_batch(i):
        dag = Dag()

        @dag.model("inc_model", materialize="incremental", unique_key="k")
        def inc_model(s):
            return s.createDataFrame(batches[i], ["k", "v"])

        return dag.run(spark)["inc_model"]

    try:
        out1 = {r["k"]: r["v"] for r in run_batch(0).collect()}
        assert out1 == {1: "a1", 2: "b1"}
        out2 = {r["k"]: r["v"] for r in run_batch(1).collect()}
        assert out2 == {1: "a1", 2: "b2", 3: "c1"}  # 2 replaced, 1 kept, 3 added
        # idempotent re-run of the same batch
        out3 = {r["k"]: r["v"] for r in run_batch(1).collect()}
        assert out3 == out2
    finally:
        spark.sql("DROP TABLE IF EXISTS inc_model")
