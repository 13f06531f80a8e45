import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from dompa_spark.pipeline import session_confs

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("dompa-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        # bucketed-table tests write catalog tables; keep the warehouse
        # out of the repo working tree
        .config("spark.sql.warehouse.dir", "/tmp/dompa_spark_warehouse")
    )
    s = session_confs(builder).getOrCreate()
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """300 deterministic docs of the interleaved spans shape."""
    from dompa_spark import corpus

    path = str(tmp_path_factory.mktemp("corpus") / "docs")
    corpus.write_corpus(path, 300)
    return path
