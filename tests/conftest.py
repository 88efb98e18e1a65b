import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from urlmap_spark.session import get_spark

    s = get_spark(master="local[8]", app_name="urlmap_spark_tests")
    yield s
    s.stop()
