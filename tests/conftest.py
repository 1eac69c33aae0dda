import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from entity_extractor_linker_api_v2_spark.session import get_spark
    s = get_spark(app_name="eel-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
