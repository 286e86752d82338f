from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from quantms_utils_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="quantms-utils-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
            # keep bucketed-table test artifacts out of the repo tree
            "spark.sql.warehouse.dir": "/tmp/quantms-spark-test-warehouse",
        },
    )
    yield spark
    spark.stop()
