from __future__ import annotations

import pytest

from big_data_analysis_project_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bdap-tests", shuffle_partitions=8)
    yield s
    # release the JVM gateway and warehouse/derby locks — a lingering
    # metastore lock from an unkilled JVM fails the NEXT run's
    # getOrCreate with "Another instance of Derby may have booted"
    s.stop()
