"""Source operators (scans). Reference inventory: SURVEY.md §2.1."""

from conveyor_spark.sources import csv, json, parquet, stdin, http  # noqa: F401
