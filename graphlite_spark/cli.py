"""spark-submit entrypoint.

The reference launches via ssh fan-out (bin/start-graphlite:30-31,
engine/Master.cc:94-130); the Spark-native equivalent is::

    zip -r engine.zip graphlite_spark
    spark-submit --py-files engine.zip -- \
        python -m graphlite_spark.cli pagerank \
        --events /data/events.parquet --output /out/pagerank \
        --partitions 4096 --checkpoint-dir /ckpt --checkpoint-every 5

On a cluster, pass ``--num-executors N`` / ``4N`` to spark-submit for the
two-size scaling protocol; in the sandbox the session falls back to
``local[$SPARK_GRAFT_CPUS]``.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from graphlite_spark.algos import triangle_count, triangle_count_per_vertex
from graphlite_spark.checkpoint import ParquetCheckpointer
from graphlite_spark.metrics import edges_per_second, write_metrics
from graphlite_spark.plans.derive import derive_edges, derive_vertices
from graphlite_spark.sources.transcripts import transcripts_from_events

ALGOS = {"pagerank", "ppr", "components", "components-fast", "lpa",
         "triangles", "bfs", "sssp", "kcore", "ktruss", "mis", "coloring",
         "katz", "stress", "scc", "eccentricity", "component-histogram",
         "kmeans", "salsa", "bowtie", "transitivity", "msf"}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="graphlite_spark")
    p.add_argument("algo", choices=sorted(ALGOS))
    p.add_argument("--events", default=None,
                   help="parquet path (or Iceberg table with --format iceberg) "
                        "of the transcripts-shaped events input (required for "
                        "every graph algo)")
    p.add_argument("--embeddings", default=None,
                   help="parquet path of an (vec_id, embedding) table "
                        "(kmeans only)")
    p.add_argument("--clusters", type=int, default=8, help="kmeans k")
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--output", required=True)
    p.add_argument("--partitions", type=int, default=None,
                   help="hash partitions for state/edges (~E / 5M at scale)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=5)
    p.add_argument("--metrics-path", default=None)
    p.add_argument("--run-id", default="cli")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest complete checkpoint manifest")
    p.add_argument("--iterations", type=int, default=None,
                   help="iteration count (default: 5 for lpa, 6 for katz)")
    p.add_argument("--eps", type=float, default=1e-6)
    p.add_argument("--source", type=int, default=0, help="bfs/sssp/ppr source")
    p.add_argument("--k", type=int, default=2, help="kcore k")
    return p


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.algo == "kmeans":
        if not args.embeddings:
            parser.error("kmeans requires --embeddings")
    elif not args.events:
        parser.error(f"{args.algo} requires --events")
    spark = _session()

    if args.algo == "kmeans":
        from graphlite_spark.operators.kmeans import kmeans_embeddings

        emb = spark.read.parquet(args.embeddings)
        out = kmeans_embeddings(emb, k=args.clusters,
                                iterations=args.iterations or 3)
        out.write.mode("overwrite").parquet(args.output)
        sizes = {int(r["cluster"]): int(r["n"])
                 for r in out.groupBy("cluster")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
        print(json.dumps({"algo": "kmeans", "k": args.clusters,
                          "cluster_sizes": sizes}))
        return 0

    if args.format == "iceberg":
        # needs the iceberg-spark-runtime jar on the classpath; absent in
        # the sandbox image, so this path is exercised only on clusters
        events = spark.read.format("iceberg").load(args.events)
    else:
        events = spark.read.parquet(args.events)

    t = transcripts_from_events(events) if "event_id" in events.columns else events
    v = derive_vertices(t).persist()
    e = derive_edges(t, v).persist()

    ck = None
    resume_from = None
    if args.checkpoint_dir:
        ck = ParquetCheckpointer(args.checkpoint_dir, every=args.checkpoint_every)
        if args.resume:
            resume_from = ck.latest(spark, args.run_id)

    if args.algo == "triangles":
        triangle_count_per_vertex(v, e).write.mode("overwrite").parquet(args.output)
        total = triangle_count(e).collect()[0]["triangles"]
        print(json.dumps({"algo": "triangles", "total": int(total)}))
        return 0
    if args.algo == "components-fast":
        from graphlite_spark.algos.components import connected_components_fast

        out = connected_components_fast(v, e, num_partitions=args.partitions)
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"algo": "components-fast", "rows": out.count()}))
        return 0
    if args.algo == "component-histogram":
        from graphlite_spark.algos.components import connected_components_fast

        sizes = (
            connected_components_fast(v, e, num_partitions=args.partitions)
            .groupBy("component").agg(F.count(F.lit(1)).alias("n_vertices"))
        )
        out = sizes.groupBy("n_vertices").agg(
            F.count(F.lit(1)).cast("long").alias("n_components")
        )
        out.write.mode("overwrite").parquet(args.output)
        hist = {int(r["n_vertices"]): int(r["n_components"])
                for r in out.collect()}
        print(json.dumps({"algo": "component-histogram", "histogram": hist}))
        return 0
    if args.algo == "msf":
        from graphlite_spark.algos.msf import boruvka_msf
        from graphlite_spark.functions.hashes import hash48

        lo, hi = F.least("src", "dst"), F.greatest("src", "dst")
        we = e.select(
            "src", "dst",
            (1 + hash48(F.concat_ws(":", F.lit("msf"), lo.cast("string"),
                                    hi.cast("string"))) % 1_000_000
             ).alias("w"),
        )
        out = boruvka_msf(v, we, weight_col="w")
        out.write.mode("overwrite").parquet(args.output)
        stats = out.agg(F.count(F.lit(1)).alias("n"),
                        F.sum("w").alias("tw")).collect()[0]
        print(json.dumps({"algo": "msf", "n_edges": int(stats["n"]),
                          "total_weight": int(stats["tw"] or 0)}))
        return 0
    if args.algo == "salsa":
        from graphlite_spark.algos.hits import salsa

        out = salsa(v, e, iterations=args.iterations or 3)
        out.write.mode("overwrite").parquet(args.output)
        top = out.orderBy(F.desc("auth_m"), F.asc("id")).limit(1).collect()
        print(json.dumps({"algo": "salsa",
                          "top_authority": int(top[0]["id"]) if top else None}))
        return 0
    if args.algo == "bowtie":
        from graphlite_spark.algos.bowtie import bowtie_decomposition

        out = bowtie_decomposition(
            v.select("id"), e, num_partitions=args.partitions
        )
        out.write.mode("overwrite").parquet(args.output)
        sizes = {r["cls"]: int(r["n"]) for r in out.groupBy("cls")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
        print(json.dumps({"algo": "bowtie", "class_sizes": sizes}))
        return 0
    if args.algo == "transitivity":
        from graphlite_spark.algos.stats import transitivity

        out = transitivity(e)
        out.write.mode("overwrite").parquet(args.output)
        row = out.collect()[0]
        print(json.dumps({"algo": "transitivity",
                          "n_triangles": int(row["n_triangles"]),
                          "n_wedges": int(row["n_wedges"]),
                          "transitivity": row["transitivity"]}))
        return 0
    if args.algo == "kcore":
        from graphlite_spark.algos.components import k_core

        out = k_core(v, e, k=args.k)
        out.write.mode("overwrite").parquet(args.output)
        n_core = out.where("in_core").count()
        print(json.dumps({"algo": "kcore", "k": args.k, "in_core": n_core}))
        return 0
    if args.algo == "ktruss":
        from graphlite_spark.algos.triangles import k_truss

        if args.k < 3:
            print("ktruss requires --k >= 3 (k=2 is the whole graph)",
                  file=sys.stderr)
            return 2
        out = k_truss(e, k=args.k)
        out.write.mode("overwrite").parquet(args.output)
        n_in = out.where("in_truss").count()
        print(json.dumps({"algo": "ktruss", "k": args.k, "in_truss": n_in}))
        return 0
    if args.algo == "mis":
        from graphlite_spark.algos.mis import maximal_independent_set

        out = maximal_independent_set(v, e)
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"algo": "mis",
                          "in_mis": out.where("status = 1").count()}))
        return 0
    if args.algo == "coloring":
        from graphlite_spark.algos.mis import greedy_coloring

        out = greedy_coloring(v, e)
        out.write.mode("overwrite").parquet(args.output)
        mx = out.agg({"color": "max"}).collect()[0][0]
        ncol = (mx + 1) if mx is not None else 0
        print(json.dumps({"algo": "coloring", "colors": int(ncol)}))
        return 0
    if args.algo == "katz":
        from graphlite_spark.algos.centrality import katz_centrality

        out = katz_centrality(v, e, iterations=args.iterations or 6)
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"algo": "katz", "rows": out.count()}))
        return 0
    if args.algo == "stress":
        from graphlite_spark.algos.bfs import stress_from_source

        out = stress_from_source(v, e, source=args.source)
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"algo": "stress", "rows": out.count()}))
        return 0
    if args.algo == "scc":
        from graphlite_spark.algos.scc import strongly_connected_components

        out = strongly_connected_components(v, e,
                                            num_partitions=args.partitions)
        out.write.mode("overwrite").parquet(args.output)
        n_scc = out.select("scc").distinct().count()
        print(json.dumps({"algo": "scc", "components": n_scc}))
        return 0
    if args.algo == "eccentricity":
        from graphlite_spark.algos.centrality import eccentricity

        out = eccentricity(v, e, sources=[args.source],
                           fixed_supersteps=args.iterations,
                           num_partitions=args.partitions)
        out.write.mode("overwrite").parquet(args.output)
        row = out.collect()[0]
        print(json.dumps({"algo": "eccentricity", "source": args.source,
                          "eccentricity": int(row["eccentricity"]),
                          "reached": int(row["reached"])}))
        return 0

    from graphlite_spark.algos.bfs import BFS
    from graphlite_spark.algos.components import ConnectedComponents, symmetrize
    from graphlite_spark.algos.lpa import LabelPropagation
    from graphlite_spark.algos.pagerank import PageRank, PersonalizedPageRank
    from graphlite_spark.algos.sssp import SSSP
    from graphlite_spark.operators.pregel import PregelEngine

    algo_obj = {"pagerank": PageRank(eps=args.eps),
                "ppr": PersonalizedPageRank(source=args.source, eps=args.eps),
                "components": ConnectedComponents(),
                "lpa": LabelPropagation(args.iterations or 5),
                "bfs": BFS(source=args.source),
                "sssp": SSSP(source=args.source)}[args.algo]
    graph_e = e if args.algo in ("pagerank", "ppr", "bfs", "sssp") else symmetrize(e)
    res = PregelEngine(num_partitions=args.partitions, checkpointer=ck,
                       run_id=args.run_id).run(v, graph_e, algo_obj,
                                               resume_from=resume_from)

    res.state.write.mode("overwrite").parquet(args.output)
    if args.metrics_path:
        write_metrics(spark, res.metrics, args.metrics_path, args.run_id)
    print(json.dumps({
        "algo": args.algo,
        "supersteps": res.supersteps,
        "converged": res.converged,
        "edges_per_sec": round(edges_per_second(res.metrics), 1),
    }))
    return 0


def _session() -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:  # under spark-submit the session is provided
        return active
    from graphlite_spark.session import get_spark

    return get_spark(app_name="graphlite_spark_cli")


if __name__ == "__main__":
    sys.exit(main())
