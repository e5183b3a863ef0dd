from __future__ import annotations

import pytest

from pysemantic_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pysemantic_spark_tests", shuffle_partitions=8)
    yield s
