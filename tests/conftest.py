from __future__ import annotations

import pytest

from data_text_search_spark.fixtures.corpus import corpus_pandas
from data_text_search_spark.session import get_spark

N_DOCS = 300  # fixture corpus size for unit/golden tests


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    return corpus_pandas(N_DOCS)


@pytest.fixture(scope="session")
def corpus(spark, corpus_pdf):
    df = spark.createDataFrame(corpus_pdf.reset_index().rename(columns={"index": "doc_id"}))
    return df.cache()
