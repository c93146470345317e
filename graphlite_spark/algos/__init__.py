from graphlite_spark.algos.pagerank import PageRank, pagerank  # noqa: F401
from graphlite_spark.algos.components import ConnectedComponents, connected_components  # noqa: F401
from graphlite_spark.algos.lpa import LabelPropagation, label_propagation  # noqa: F401
from graphlite_spark.algos.triangles import triangle_count, triangle_count_per_vertex  # noqa: F401
from graphlite_spark.algos.bfs import BFS, bfs  # noqa: F401
from graphlite_spark.algos.sssp import SSSP, sssp  # noqa: F401
