from __future__ import annotations

import pytest

from dedupe_archived_files_spark.session import get_spark
from dedupe_archived_files_spark.synth import corpus_to_spark, generate_corpus


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def corpus():
    return generate_corpus(seed=42)


@pytest.fixture(scope="session")
def pages_dfs(spark, corpus):
    """(pages, labeled_pairs, expected_clusters) DataFrames, cached."""
    pages, labeled, expected = corpus_to_spark(spark, corpus)
    pages = pages.cache()
    labeled = labeled.cache()
    expected = expected.cache()
    pages.count(), labeled.count(), expected.count()
    return pages, labeled, expected
