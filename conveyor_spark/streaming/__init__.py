"""Structured Streaming surface.

Reference streaming model (SURVEY §2.7): record-at-a-time streams,
COUNT-based windows (`ready_chunks`), per-window aggregation with no
cross-batch state, no watermarks, unused checkpoint knob. Spark's
Structured Streaming is strictly stronger: micro-batch pipelining,
event-time windows + watermarks for late data, fault-tolerant state.

This package maps the reference surface onto readStream/writeStream:
- file_watch  -> file-source streams (Spark tails directories natively)
- stdin_stream-> socket/rate sources
- window.apply + aggregate.stream -> groupBy(window(...)).agg(...)
- stdout_stream.write -> writeStream.format("console")
- kafka       -> spark.readStream/writeStream.format("kafka")
"""

from conveyor_spark.streaming.ops import (  # noqa: F401
    read_file_stream,
    windowed_aggregate,
    run_available_now,
)
