from graphlite_spark.streaming.ingest import (  # noqa: F401
    streaming_click_attribution,
    streaming_edge_counts,
    streaming_reply_edges,
    streaming_session_stats,
    streaming_sessionize,
)
