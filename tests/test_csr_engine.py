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
