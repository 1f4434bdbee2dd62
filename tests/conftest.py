import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Protobuf bootstrap for transformWithStateInPandas (tools/pbshim): wire the
# vendored runtime into THIS process and export the shim on PYTHONPATH so the
# Spark-spawned Python workers (which also need protobuf for the state-server
# protocol) pick it up via sitecustomize.  Must happen before the JVM starts.
_PBSHIM = os.path.join(_REPO, "tools", "pbshim")
sys.path.insert(0, _PBSHIM)
from sitecustomize import ensure_protobuf  # noqa: E402

HAVE_PROTOBUF = ensure_protobuf()
if HAVE_PROTOBUF:
    os.environ["PYTHONPATH"] = os.pathsep.join(
        [_PBSHIM] + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
    )

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("rss-feed-etl-spark-tests")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
