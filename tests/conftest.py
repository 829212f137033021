import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Spark python workers must also see the package (verify SKILL.md gotcha)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import pytest


@pytest.fixture(scope="session")
def spark():
    from sketchlib.spark.session import get_spark
    s = get_spark("sketchlib-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_tiny(spark):
    from sketchlib.io.fixtures import pages_path
    return spark.read.parquet(pages_path("tiny"))
