from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from military_entity_extraction_based_on_large_models_spark.session import get_spark
from military_entity_extraction_based_on_large_models_spark.sources import fixtures

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mee-kg-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus():
    return fixtures.synth_documents(seed=42, n_docs=400)


@pytest.fixture(scope="session")
def docs_df(spark, corpus):
    from military_entity_extraction_based_on_large_models_spark.sources.documents import (
        with_doc_sha,
    )

    return with_doc_sha(spark.createDataFrame(corpus)).cache()
