"""Source operators (scans). Reference inventory: SURVEY.md §2.1."""

from conveyor_spark.sources import (  # noqa: F401
    csv,
    files,
    json,
    parquet,
    stdin,
    http,
    excel,
    mongodb,
    kafka,
    stream,
    table,
)
