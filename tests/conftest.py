import tempfile

import pytest

from wms_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("wms-tests", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "4",
        "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wms-wh-"),
    })
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
