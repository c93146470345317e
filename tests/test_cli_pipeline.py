"""CLI surface for the pipeline/analytics subcommands added in round 4:
`kmeans` over an embeddings parquet and `component-histogram` over the
events input — each checked against the library-level result."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb


def _cli(args: list[str], timeout: int = 600):
    env = {**os.environ, "PYTHONPATH": "/root/repo", "SPARK_GRAFT_CPUS": "4"}
    return subprocess.run(
        [sys.executable, "-m", "graphlite_spark.cli", *args],
        capture_output=True, text=True, env=env, timeout=timeout,
    )


def test_cli_kmeans(tmp_path, spark):
    out = str(tmp_path / "km")
    res = _cli(["kmeans", "--embeddings",
                "/root/testdata/sf0.001/embeddings.parquet",
                "--clusters", "4", "--iterations", "2", "--output", out])
    assert res.returncode == 0, res.stderr[-2000:]
    line = json.loads(res.stdout.strip().splitlines()[-1])
    assert line["algo"] == "kmeans" and line["k"] == 4
    assert sum(line["cluster_sizes"].values()) > 0

    from graphlite_spark.operators.kmeans import kmeans_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    want = sorted(
        map(tuple, kmeans_embeddings(emb, k=4, iterations=2).collect())
    )
    con = duckdb.connect()
    got = con.execute(
        f"SELECT vec_id, cluster, dist_sq FROM read_parquet('{out}/*.parquet')"
        " ORDER BY vec_id, cluster, dist_sq"
    ).fetchall()
    assert got == want


def test_cli_component_histogram(tmp_path):
    out = str(tmp_path / "hist")
    res = _cli(["component-histogram", "--events",
                "/root/testdata/sf0.001/events.parquet", "--output", out])
    assert res.returncode == 0, res.stderr[-2000:]
    line = json.loads(res.stdout.strip().splitlines()[-1])
    hist = line["histogram"]
    # sf0.001: 15 conversations == 15 components over 1000 vertices
    assert sum(hist.values()) >= 1
    assert sum(int(k) * v for k, v in hist.items()) == 1000


def test_cli_kmeans_requires_embeddings():
    res = _cli(["kmeans", "--output", "/tmp/never"])
    assert res.returncode == 2
    assert "requires --embeddings" in res.stderr


def test_cli_bowtie_and_transitivity(tmp_path):
    ev = "/root/testdata/sf0.001/events.parquet"
    out1 = str(tmp_path / "bt")
    res = _cli(["bowtie", "--events", ev, "--output", out1])
    assert res.returncode == 0, res.stderr[-2000:]
    line = json.loads(res.stdout.strip().splitlines()[-1])
    assert line["algo"] == "bowtie"
    # transcript graph: 1000 vertices, every class count non-negative and
    # totals match the vertex count
    assert sum(line["class_sizes"].values()) == 1000

    out2 = str(tmp_path / "tr")
    res = _cli(["transitivity", "--events", ev, "--output", out2])
    assert res.returncode == 0, res.stderr[-2000:]
    line = json.loads(res.stdout.strip().splitlines()[-1])
    assert line["algo"] == "transitivity"
    assert line["n_wedges"] > 0 and line["n_triangles"] >= 0


def test_cli_salsa(tmp_path):
    ev = "/root/testdata/sf0.001/events.parquet"
    out = str(tmp_path / "sa")
    res = _cli(["salsa", "--events", ev, "--output", out, "--iterations", "2"])
    assert res.returncode == 0, res.stderr[-2000:]
    line = json.loads(res.stdout.strip().splitlines()[-1])
    assert line["algo"] == "salsa" and line["top_authority"] is not None


def test_cli_msf(tmp_path):
    ev = "/root/testdata/sf0.001/events.parquet"
    out = str(tmp_path / "msf")
    res = _cli(["msf", "--events", ev, "--output", out])
    assert res.returncode == 0, res.stderr[-2000:]
    line = json.loads(res.stdout.strip().splitlines()[-1])
    # forest size = V - #components = 1000 - 15 conversations
    assert line["algo"] == "msf" and line["n_edges"] == 985
    assert line["total_weight"] > 0
