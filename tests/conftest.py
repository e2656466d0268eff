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
    from conveyor_spark.registry import get_function

    return get_function(__op).fn(__ctx, __inputs, config)
