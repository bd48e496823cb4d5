from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from embulk_output_s3_parquet_spark.session import get_spark

    s = get_spark(app="engine-tests", cores=8, chunk_rows=4096)
    yield s
    s.stop()
