import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from logai_spark.session import get_spark

    s = get_spark("logai_spark_tests", cpus=4)
    yield s
    s.stop()
