from fever_spark.streaming.sketch_stream import (
    StreamingSketchAccumulator, windowed_counts_stream, session_collector_stream,
)

__all__ = ["StreamingSketchAccumulator", "windowed_counts_stream",
           "session_collector_stream"]
