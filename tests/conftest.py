import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


@pytest.fixture(scope='session')
def spark():
    from yargy_spark.plans.session import build_session
    session = build_session(app='yargy-spark-tests', master='local[4]',
                            shuffle_partitions=8)
    session.sparkContext.setLogLevel('ERROR')
    yield session
    session.stop()
