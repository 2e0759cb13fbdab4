import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from crawlspark.config import SparkTuning
    from crawlspark.session import get_spark

    s = get_spark(SparkTuning(master="local[4]", shuffle_partitions=4,
                              driver_memory="8g", app_name="crawlspark-tests"))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf001() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01() -> str:
    return "/root/testdata/sf0.01"
