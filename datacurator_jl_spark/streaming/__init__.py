from datacurator_jl_spark.streaming.stream import (
    hourly_rollup_stream,
    quality_filter_stream,
    read_events_stream,
)

__all__ = ["read_events_stream", "hourly_rollup_stream", "quality_filter_stream"]
