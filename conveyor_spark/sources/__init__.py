"""Source operators (scans). Reference inventory: SURVEY.md §2.1."""

from conveyor_spark.sources import (  # noqa: F401
    avro,
    csv,
    excel,
    files,
    http,
    json,
    kafka,
    mongodb,
    parquet,
    stdin,
    stream,
    table,
    xml,
)
