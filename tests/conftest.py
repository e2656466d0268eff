from __future__ import annotations

import pytest

from conveyor_spark.registry import OpContext
from conveyor_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="conveyor-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def ctx(spark):
    return OpContext(spark=spark)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


def run_op(__ctx, __op, __inputs, **config):
    from conveyor_spark.registry import get_function, validate_config

    op = get_function(__op)
    # Keep the declared parameter metadata honest: any config key the
    # suite exercises must be declared (test hooks start with "_").
    unknown = [w for w in validate_config(op, config) if w.startswith("unknown parameter")]
    assert not unknown, f"{__op}: metadata out of date: {unknown}"
    return op.fn(__ctx, __inputs, config)
