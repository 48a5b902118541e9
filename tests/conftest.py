from __future__ import annotations

import pytest

from tera_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tera_spark_tests", shuffle_partitions=8)
    yield s


SF_DIR = "/root/testdata/sf0.001"
