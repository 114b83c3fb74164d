import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from gg2rdf_spark.session import build_session

    s = build_session(
        app_name="gg2rdf-tests",
        master=os.environ.get("SPARK_TEST_MASTER", "local[8]"),
        shuffle_partitions=8,
    )
    yield s
    s.stop()
