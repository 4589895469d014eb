import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from ocr_vector_db_spark.session import get_spark

    spark = get_spark("ocr_vector_db_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    from ocr_vector_db_spark.session import load_tables

    return load_tables(spark, SF_DIR)
