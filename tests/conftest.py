import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from synspark.session import get_spark
    s = get_spark(app="synspark-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()
