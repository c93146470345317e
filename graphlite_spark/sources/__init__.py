from graphlite_spark.sources.transcripts import (  # noqa: F401
    TOOL_VOCAB,
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
    load_tinygraph,
    transcripts_from_events,
)
