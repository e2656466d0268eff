"""Pin tools/recipe_probe.py's full-recipe DuckDB replays to the
recipe pipelines' own pinned outputs at sf0.001.

test_recipe_pipelines.py pins what the PIPELINES produce; these pin
what the REPLAYS compute. If either side drifts (an op's semantics,
a recipe stage, or the replay SQL), the two suites disagree and the
probe's row-count oracle at sf0.1 stops being meaningful — this
catches that at gate scale where it is cheap.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from recipe_probe import c4_count_sql, duck, rw_count_sql  # noqa: E402

_DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_c4_replay_matches_pipeline_pin():
    # 491 is also asserted against the pipeline's parquet output in
    # test_recipe_pipelines.py::test_c4_recipe_properties
    assert duck(c4_count_sql(_DOCS)) == 491


def test_refinedweb_replay_matches_pipeline_pin():
    # 193 mirrors test_refinedweb_recipe_properties' pin
    assert duck(rw_count_sql(_DOCS)) == 193
