from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_to_text_extraction_service_spark.plans.session import (
        build_session,
    )

    s = build_session(app_name="tests", master="local[4]",
                      shuffle_partitions=4)
    yield s
    s.stop()
