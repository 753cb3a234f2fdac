import os

# Pin the driver JVM heap BEFORE any SparkSession exists: the first
# test file to run (alphabetically the CLI tests) launches the JVM
# through its own builder, and `spark.driver.memory` on the fixture
# below is silently ignored for an already-running JVM — the whole
# suite was actually running on the 1 GiB default heap (verified with
# jcmd GC.heap_info), which the round-5 suite can OOM (the
# SparkUncaughtExceptionHandler then System.exits the JVM and every
# later test cascades into ConnectionRefused). PYSPARK_SUBMIT_ARGS is
# read at JVM launch no matter which builder triggers it.
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell"
)

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("shacl-rust-spark-tests")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        # 8g: the suite includes genuinely sized fixtures (the 10⁵-node
        # bow-tie SCC good-case test, the past-cap digraph) on top of
        # hundreds of tests' accumulated localCheckpoint blocks — at 4g
        # the shared JVM could die mid-suite and cascade every later
        # test into ConnectionRefused
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
