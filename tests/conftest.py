from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from access_log_parser_spark.session import get_spark

    s = get_spark(
        app_name="alp-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    yield s
    s.stop()
