import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_etl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # small local parallelism: unit-test data is tiny, JVM task-dispatch
    # overhead dominates at local[32]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="csv-etl-spark-tests", shuffle_partitions=4)
    yield spark


def rows_as_dicts(df):
    return [r.asDict(recursive=True) for r in df.collect()]
