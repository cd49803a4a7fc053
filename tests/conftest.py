import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(scope="session")
def spark():
    from raster2dggs_spark.session import get_spark

    s = get_spark("r2dggs-tests", master="local[4]", shuffle_partitions=8)
    yield s


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
