"""Sink operators. Reference inventory: SURVEY.md §2.2."""

from conveyor_spark.sinks import csv, json, stdout, stdout_stream, http  # noqa: F401
