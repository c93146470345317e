"""Checkpoint/resume tests (SURVEY.md §5.2.4): resume mid-iteration must
produce a final state identical to the uninterrupted run."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from graphlite_spark.algos.pagerank import PageRank
from graphlite_spark.checkpoint import ParquetCheckpointer
from graphlite_spark.metrics import edges_per_second, metrics_df
from graphlite_spark.operators.pregel import PregelEngine
from tests.reference_sim import random_digraph, simulate_pagerank


@pytest.fixture()
def graph(spark):
    edges = random_digraph(80, 300, seed=3)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(80).select(F.col("id"))
    return v, e, edges


def test_resume_mid_iteration_bitwise_equal(spark, tmp_path, graph):
    v, e, edges = graph
    ck_dir = str(tmp_path / "ck")

    # uninterrupted run
    full = PregelEngine(run_id="full").run(v, e, PageRank())
    expected = {r["id"]: r["value"] for r in full.state.collect()}

    # interrupted run: kill after ~6 supersteps (checkpoint every 4)
    ck = ParquetCheckpointer(ck_dir, every=4)
    algo_short = PageRank(max_supersteps=6)
    PregelEngine(checkpointer=ck, run_id="r1").run(v, e, algo_short)

    latest = ck.latest(spark, "r1")
    assert latest is not None
    _, last_step, aggr, aggr_in = latest
    assert last_step == 4  # checkpoints at 0 and 4
    assert "sum_delta" in aggr and "sum_delta" in aggr_in

    # resume and finish — simulates a fresh driver process
    resumed = PregelEngine(checkpointer=ParquetCheckpointer(ck_dir, every=4),
                           run_id="r1").run(v, e, PageRank(), resume_from=latest)
    got = {r["id"]: r["value"] for r in resumed.state.collect()}
    # doubles: float-sum order varies with partition layout after the
    # parquet round-trip, so equality is to 1e-9 (integer-valued algorithms
    # resume bit-exact — see test_resume_cc_exact)
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-9)
    assert resumed.supersteps == full.supersteps


def test_resume_cc_exact(spark, tmp_path, graph):
    from graphlite_spark.algos.components import ConnectedComponents, symmetrize

    v, e, edges = graph
    und = symmetrize(e)
    full = PregelEngine(run_id="ccf").run(v, und, ConnectedComponents())
    expected = {r["id"]: r["value"] for r in full.state.collect()}

    ck = ParquetCheckpointer(str(tmp_path / "ckcc"), every=2)
    algo_short = ConnectedComponents(max_supersteps=3)
    PregelEngine(checkpointer=ck, run_id="cc1").run(v, und, algo_short)
    latest = ck.latest(spark, "cc1")
    assert latest is not None and latest[1] == 2
    resumed = PregelEngine(run_id="cc1b").run(
        v, und, ConnectedComponents(), resume_from=latest
    )
    got = {r["id"]: r["value"] for r in resumed.state.collect()}
    assert got == expected  # exact (long labels)


def test_manifest_shape_and_lineage(spark, tmp_path, graph):
    v, e, edges = graph
    ck = ParquetCheckpointer(str(tmp_path / "ck2"), every=2)
    res = PregelEngine(checkpointer=ck, run_id="m1").run(
        v, e, PageRank(max_supersteps=5)
    )
    ms = ck.manifests("m1")
    assert [m["superstep"] for m in ms] == [0, 2, 4]
    for m in ms:
        assert m["complete"] is True
        assert sum(p["rows"] for p in m["partition_lineage"]) == 80
        assert set(m["aggregates"]) == {"sum_delta"}
    # aggregates in the manifest are the values PRODUCED by that superstep
    sim_vals, _ = simulate_pagerank(edges, 80, fixed=2)
    # superstep-1 deltas: |1.0 - val_after_ss1| summed — check ss2's global
    # is consistent with the engine's own metrics log instead of recomputing
    by_step = {mm.superstep: mm for mm in res.metrics}
    for m in ms:
        assert m["aggregates"]["sum_delta"] == pytest.approx(
            by_step[m["superstep"]].aggregates["sum_delta"]
        )


def test_metrics_df_and_throughput(spark, graph):
    v, e, edges = graph
    res = PregelEngine(run_id="t1").run(v, e, PageRank(max_supersteps=4))
    df = metrics_df(spark, res.metrics, "t1")
    rows = df.orderBy("superstep").collect()
    assert [r["superstep"] for r in rows] == [0, 1, 2, 3]
    assert all(r["wall_ms"] > 0 for r in rows)
    # every vertex with out-edges sends every superstep pre-convergence
    assert rows[0]["sent"] == 300
    assert json.loads(rows[1]["aggregates"])["sum_delta"] > 0
    assert edges_per_second(res.metrics) > 0


def test_restart_retracts_manifest_before_overwrite(spark, tmp_path):
    """A restarted run that re-saves an already-published superstep must
    retract the old manifest BEFORE touching the data: a crash mid-rewrite
    can then never leave a complete manifest pointing at torn files."""
    import pyspark.sql.functions as F

    ck = ParquetCheckpointer(str(tmp_path), every=1)
    df = spark.range(10).select(
        F.col("id"), F.lit(1).alias("out_degree"), F.lit(0.0).alias("value"),
        F.lit(True).alias("active"), F.lit(True).alias("send"),
    )
    ck.save(df, 0, {}, "r")
    ck.commit(0, {"a": 1.0}, "r")
    step_dir = tmp_path / "r" / "superstep=000000"
    assert (step_dir / "manifest.json").exists()

    # restart: save the same superstep again — manifest must vanish the
    # moment phase-1 starts, and only reappear at phase-2 commit
    ck2 = ParquetCheckpointer(str(tmp_path), every=1)
    ck2.save(df, 0, {}, "r")
    assert not (step_dir / "manifest.json").exists()
    assert ck2.latest(spark, "r") is None  # torn window: resume ignores it
    ck2.commit(0, {"a": 2.0}, "r")
    got = ck2.latest(spark, "r")
    assert got is not None and got[2] == {"a": 2.0}


def test_resume_struct_state(spark, tmp_path, graph):
    """Checkpoint/resume round-trips STRUCT-valued vertex state: the
    parquet state file carries struct<dist,parent> and the resumed run
    equals the uninterrupted one exactly (longs inside the struct)."""
    from graphlite_spark.algos.sssp import SSSPWithParents

    v, e, _ = graph
    we = e.withColumn(
        "weight", (F.lit(1) + (F.col("src") + F.col("dst")) % 4).cast("double")
    )
    algo = SSSPWithParents(source=0, fixed_supersteps=6)

    full = PregelEngine(num_partitions=2).run(v, we, algo)
    want = {r["id"]: (r["value"]["dist"], r["value"]["parent"])
            for r in full.state.collect()}

    ck_dir = str(tmp_path / "ck_struct")
    ck = ParquetCheckpointer(ck_dir, every=1)
    eng = PregelEngine(num_partitions=2, checkpointer=ck, run_id="ss")
    interrupted = PregelEngine(num_partitions=2, checkpointer=ck, run_id="ss")
    # run to completion once to produce manifests, then resume from ss=3
    interrupted.run(v, we, algo)
    ms = ck.manifests("ss")
    mid = [m for m in ms if m["superstep"] == 3][0]
    df = spark.read.parquet(mid["state_path"])
    res = eng.run(v, we, algo,
                  resume_from=(df, 3, dict(mid["aggregates"]),
                               dict(mid["aggregates_in"])))
    got = {r["id"]: (r["value"]["dist"], r["value"]["parent"])
           for r in res.state.collect()}
    assert got == want
