import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


def make_spark(cores: int = 8, shuffle_partitions: int = 8):
    from pyspark.sql import SparkSession
    return (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(f"larbin-spark-tests-{cores}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


@pytest.fixture(scope="session")
def spark():
    s = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_web():
    from larbin_spark.fixtures.webgen import gen_web
    return gen_web(n_hosts=24, base_pages=14)


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory, fixture_web):
    from larbin_spark.fixtures.webgen import write_parquet
    d = tmp_path_factory.mktemp("web")
    write_parquet(fixture_web, str(d))
    return str(d)


@pytest.fixture(scope="session")
def seeds(fixture_web):
    base = [s["url"] for s in sorted(fixture_web["seeds"],
                                     key=lambda s: s["order"])]
    return base + [f"http://site{h}.example.com/" for h in (5, 6, 7, 8)]
