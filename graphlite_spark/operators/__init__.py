from graphlite_spark.operators.pregel import (  # noqa: F401
    PregelAlgorithm,
    PregelEngine,
    PregelResult,
    SuperstepMetrics,
)
