from __future__ import annotations

import pytest

from faang_pydantics_validation_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fpvs-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
