from __future__ import annotations

import pytest

from hdp2_5_hive2_spark.session import get_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="hdp2_5_hive2_spark-tests", shuffle_partitions=8)
    yield s
