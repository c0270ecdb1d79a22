import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_SRC = "/root/reference/src"

sys.path.insert(0, REPO)

# Parity tests compare against the reference checkout when it is present.
# The engine itself has NO runtime dependency on it (scoring-matrix data is
# vendored under globalign_spark/data/), so when the checkout is absent the
# parity tests skip rather than fail.
HAVE_REFERENCE = os.path.isdir(REFERENCE_SRC)
requires_reference = pytest.mark.skipif(
    not HAVE_REFERENCE, reason="reference checkout not available (parity-only test)"
)


@pytest.fixture(scope="session")
def reference_align():
    """Import the reference implementation as the parity oracle."""
    if not HAVE_REFERENCE:
        pytest.skip("reference checkout not available (parity-only test)")
    sys.path.insert(0, REFERENCE_SRC)
    from globalign.globaligner import find_global_alignment  # noqa: E501

    yield find_global_alignment
    sys.path.remove(REFERENCE_SRC)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("globalign-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield spark
    spark.stop()


SF_DIR = "/root/testdata/sf0.001"
