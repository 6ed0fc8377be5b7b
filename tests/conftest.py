import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from geomesa_spark.session import build_session

    s = build_session(cores=int(os.environ.get("SPARK_TEST_CPUS", "8")), app="geomesa_spark-tests")
    yield s
    s.stop()
