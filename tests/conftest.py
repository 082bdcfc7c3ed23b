from __future__ import annotations

import pytest

from barks_ocr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("barks-ocr-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
