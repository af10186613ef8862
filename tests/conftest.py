import os
import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("sparkbm25-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        # UDS worker IPC — same robustness rationale as bench.py/cli.py
        .config("spark.python.unix.domain.socket.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_index(tmp_path):
    d = str(tmp_path / "index")
    yield d
    shutil.rmtree(d, ignore_errors=True)
