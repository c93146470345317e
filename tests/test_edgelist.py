"""Generic text edge-list source: format + reference-demo parity.

The reference's one real-world shipped workload is PageRank on
Input/facebookcombined (4,039 v / 88,234 e, README.txt:56-63); these tests
prove that exact file loads and produces reference-semantics PageRank
(via the independent per-vertex simulator), and that the format round-trips.
"""

from __future__ import annotations

import os

import pytest

from graphlite_spark.algos import pagerank
from graphlite_spark.sources.edgelist import read_edge_list, write_edge_list
from graphlite_spark.sources.transcripts import TINYGRAPH_EDGES

from tests.reference_sim import simulate_pagerank

REF_INPUT = "/root/reference/GraphLite-0.20/Input"


def test_read_tinygraph_file(spark, tmp_path):
    # write the reference's tinygraph format from its embedded edges, read
    # it back through the generic source
    p = tmp_path / "tinygraph.txt"
    lines = ["5", "12"] + [f"{s} {d}" for s, d in TINYGRAPH_EDGES]
    p.write_text("\n".join(lines) + "\n")
    v, e = read_edge_list(spark, str(p))
    assert v.count() == 5
    got = sorted((r["src"], r["dst"]) for r in e.collect())
    assert got == sorted(TINYGRAPH_EDGES)


@pytest.mark.skipif(
    not os.path.exists(f"{REF_INPUT}/tinygraph"), reason="reference Input/ absent"
)
def test_read_reference_tinygraph(spark):
    v, e = read_edge_list(spark, f"{REF_INPUT}/tinygraph")
    assert v.count() == 5 and e.count() == 12
    got = sorted((r["src"], r["dst"]) for r in e.collect())
    assert got == sorted(TINYGRAPH_EDGES)


@pytest.mark.skipif(
    not os.path.exists(f"{REF_INPUT}/facebookcombined"),
    reason="reference Input/ absent",
)
def test_facebookcombined_pagerank_parity(spark):
    """The reference's demo workload end-to-end: ego-Facebook PageRank
    matches the independent reference-semantics simulator."""
    v, e = read_edge_list(spark, f"{REF_INPUT}/facebookcombined")
    n = v.count()
    edge_pairs = [(r["src"], r["dst"]) for r in e.collect()]
    assert (n, len(edge_pairs)) == (4039, 88234)

    res = pagerank(v, e, fixed_supersteps=5)
    got = {r["id"]: r["value"] for r in res.state.collect()}
    want, _ = simulate_pagerank(edge_pairs, n, fixed=5)
    assert len(got) == n
    worst = max(abs(got[i] - want[i]) for i in range(n))
    assert worst < 1e-9, worst


def test_write_read_roundtrip(spark, tmp_path):
    v, e = read_edge_list(
        spark,
        os.path.join(os.path.dirname(__file__), "data", "edgelist_small.txt"),
    )
    out = str(tmp_path / "roundtrip.txt")
    write_edge_list(e, out, n_vertices=100)
    v2, e2 = read_edge_list(spark, out)
    assert v2.count() == v.count()
    assert sorted((r["src"], r["dst"]) for r in e2.collect()) == sorted(
        (r["src"], r["dst"]) for r in e.collect()
    )


@pytest.mark.skipif(
    not os.path.exists(f"{REF_INPUT}/facebookcombined"),
    reason="reference Input/ absent",
)
def test_facebookcombined_triangle_count(spark):
    """External ground truth: SNAP publishes 1,612,010 triangles for the
    ego-Facebook graph the reference ships — the strongest possible
    correctness anchor for the triangle operator (no simulator, no oracle
    SQL: the published number)."""
    from graphlite_spark.algos import triangle_count

    _, e = read_edge_list(spark, f"{REF_INPUT}/facebookcombined")
    total = triangle_count(e, orient="degree").collect()[0]["triangles"]
    assert total == 1_612_010
