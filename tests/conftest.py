import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_log_forwarder_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        app_name="glfs-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="glfs_warehouse_")
        },
    )
    yield s
