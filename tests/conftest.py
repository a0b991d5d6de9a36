from __future__ import annotations

import pandas as pd
import pytest

from mimir_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mimir-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def t_small() -> pd.DataFrame:
    from mimir_spark.fixtures import transcripts_pandas

    return transcripts_pandas(200)


@pytest.fixture(scope="session")
def t_small_df(spark, t_small):
    from mimir_spark.fixtures import TRANSCRIPT_SCHEMA

    return spark.createDataFrame(t_small, schema=TRANSCRIPT_SCHEMA)
