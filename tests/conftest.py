import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from node_feedparser_spark.datagen import generate_transcripts, write_transcripts  # noqa: E402
from node_feedparser_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf():
    return generate_transcripts(seed=42, scale=1.0)


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("corpus") / "transcripts.parquet"
    write_transcripts(str(p), seed=42, scale=1.0)
    return str(p)
