from __future__ import annotations

import pytest

from crocodile_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="croco-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus():
    from crocodile_spark.datagen import make_corpus

    return make_corpus(n_entities=40, pages_per_entity=6, seed=42)


@pytest.fixture(scope="session")
def corpus_dfs(spark, corpus):
    from crocodile_spark.datagen import corpus_to_spark

    wp, kb, gold = corpus_to_spark(spark, corpus)
    return wp.cache(), kb.cache(), gold.cache()
