from __future__ import annotations

import pytest

from indonesian_id_ocr_service_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="pytest-ocr-spark", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()
