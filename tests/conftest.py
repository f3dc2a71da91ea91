from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from etl_demo_spark.session import get_spark

    # Small shuffle-partition count keeps tiny-fixture tests fast; prod
    # posture is exercised via config assertions, not test wall-clock.
    s = get_spark(app_name="etl_demo_spark-tests", shuffle_partitions=8)
    yield s
