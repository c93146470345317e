"""End-to-end /verify drive: flagship graph pipeline anchors on real
parquet + driver-contract cross-check of named queries() entries
against their oracle_sql() in DuckDB at sf0.01.

Usage: python tools/verify_drive.py [query ...]
"""
import sys

sys.path.insert(0, "/root/repo")
from graphlite_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(app_name="verify", cores=4, shuffle_partitions=8)
    import pyspark.sql.functions as F

    from graphlite_spark.algos.components import connected_components_fast
    from graphlite_spark.algos.pagerank import pagerank
    from graphlite_spark.plans.derive import derive_edges, derive_vertices
    from graphlite_spark.sources.transcripts import transcripts_from_events

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    tr = transcripts_from_events(ev)
    V, E = derive_vertices(tr), derive_edges(tr)
    nv, ne = V.count(), E.count()
    assert (nv, ne) == (1000, 1261), (nv, ne)
    res = pagerank(V, E, eps=1e-6)
    assert res.converged
    ncc = (
        connected_components_fast(V, E)
        .select("component").distinct().count()
    )
    assert ncc == 15, ncc
    print(f"pipeline anchors OK: V={nv} E={ne} cc={ncc} pr converged")

    import __spark_entry__ as m

    edf = m.entry(spark)
    assert edf.count() > 0 and len(edf.schema) == 3
    print("entry contract OK")

    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" '/root/testdata/sf0.01/{t}.parquet'"
        )
    qs, osql = m.queries(), m.oracle_sql()
    for name in names:
        a = qs[name](spark, "/root/testdata/sf0.01").toPandas()
        b = con.sql(osql[name]).df()
        cols = sorted(a.columns)
        assert sorted(b.columns) == cols, (name, list(a.columns), list(b.columns))
        ra = sorted(map(tuple, a[cols].astype(str).itertuples(index=False)))
        rb = sorted(map(tuple, b[cols].astype(str).itertuples(index=False)))
        assert len(ra) == len(rb) and ra == rb, f"{name}: value mismatch"
        print(f"{name}: rows={len(ra)} oracle-match")
    spark.stop()
    print("VERIFY OK")


if __name__ == "__main__":
    main()
