"""Transform operators. Reference inventory: SURVEY.md §2.3-2.5."""

from conveyor_spark.transforms import (  # noqa: F401
    select,
    filter as filter_,
    map as map_,
    distinct,
    sort,
    group_by,
    reduce as reduce_,
    json_extract,
    validate,
    chunk,
    relational,
    window_fn,
    crypto,
    http_fetch,
    ai,
    window,
    aggregate_stream,
    pipeline_stage,
    py_eval,
    layout,
    approx,
    observe,
    profile,
    snapshot,
    sql_query,
    temporal_join,
    zorder,
)
from conveyor_spark.streaming import count_window, funnel as stream_funnel_mod, session_window  # noqa: F401
from conveyor_spark.datapipe import emb_lsh  # noqa: F401
