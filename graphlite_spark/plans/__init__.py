from graphlite_spark.plans.derive import derive_edges, derive_vertices  # noqa: F401
