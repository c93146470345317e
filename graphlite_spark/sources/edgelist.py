"""Generic text edge-list source — the reference's primary input format.

GraphLite reads any ``src dst``-per-line text file, local or HDFS
(engine/InputFormatter.cc:34-140): the first line is the vertex count, the
second the edge count, then one whitespace-separated ``src dst`` pair per
line (GraphLite-0.20/Input/tinygraph, Input/facebookcombined;
README.txt:56-63 runs the shipped PageRank on the 4,039-vertex /
88,234-edge ego-Facebook graph).

Spark-first realization: ``spark.read.text`` scans the file distributed
(HDFS/S3/local alike — path scheme decides, exactly the reference's
``m_hdfs_flag`` split); parsing is pure JVM expressions.  Only the 2-line
header is read driver-side (``limit(2)`` — constant work at any scale).
Vertex ids are assumed dense 0..V-1, the same contract the reference's
dense node arrays impose (engine/Worker.cc:30-31, 342-355).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edge_list(
    spark: SparkSession, path: str, weight: float = 1.0
) -> tuple[DataFrame, DataFrame]:
    """(vertices, edges) from a reference-format edge-list text file.

    vertices: (id) — all of 0..V-1 per the header line (vertices with no
    out-edges still hold state, engine/Worker.cc:342-355).
    edges: (src, dst, weight) — weight is constant (the reference stores
    a per-edge value slot its PageRank never reads).
    """
    lines = spark.read.text(path)
    header = [r["value"].strip() for r in lines.limit(2).collect()]
    n_vertices = int(header[0].split()[0])

    toks = F.split(F.trim(F.col("value")), r"\s+")
    edges = (
        lines
        # edge rows have >= 2 whitespace-separated numeric tokens; the two
        # single-number header lines (and any blank line) fail this filter,
        # so no order-dependent "skip first 2 rows" is needed — the parse
        # stays embarrassingly parallel over file splits
        .where(F.size(toks) >= 2)
        .where(F.element_at(toks, 1).rlike("^[0-9]+$") & F.element_at(toks, 2).rlike("^[0-9]+$"))
        .select(
            F.element_at(toks, 1).cast("long").alias("src"),
            F.element_at(toks, 2).cast("long").alias("dst"),
            F.lit(weight).alias("weight"),
        )
    )
    vertices = spark.range(n_vertices).select(F.col("id"))
    return vertices, edges


def write_edge_list(edges: DataFrame, path: str, n_vertices: int) -> None:
    """Serialize (src, dst) back to the reference's text format (header =
    vertex count then edge count, then one ``src dst`` line each).

    Single text file via ``coalesce(1)`` — intended for exporting parity
    fixtures / interop with the reference binary, not for 100 TB sinks
    (use the parquet sink in :mod:`graphlite_spark.sources.sinks` there).
    """
    import os

    rows = edges.select(
        F.concat_ws(" ", F.col("src").cast("string"), F.col("dst").cast("string")).alias(
            "value"
        )
    )
    n_edges = rows.count()
    tmp = path + ".spark-tmp"
    rows.coalesce(1).write.mode("overwrite").text(tmp)
    part = next(p for p in os.listdir(tmp) if p.startswith("part-"))
    with open(os.path.join(tmp, part)) as f:
        body = f.read()
    with open(path, "w") as f:
        f.write(f"{n_vertices}\n{n_edges}\n")
        f.write(body)
    import shutil

    shutil.rmtree(tmp)
