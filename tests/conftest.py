from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datacurator_jl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dc-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def docs_pdf():
    from datacurator_jl_spark.testing.synth import synth_documents_pandas

    return synth_documents_pandas(400, seed=42)


@pytest.fixture(scope="session")
def docs_df(spark, docs_pdf):
    return spark.createDataFrame(docs_pdf).cache()


@pytest.fixture(scope="session")
def flagship_spec():
    from datacurator_jl_spark.recipe import load_recipe

    return load_recipe(os.path.join(REPO, "recipes", "webtext_quality.toml"))
