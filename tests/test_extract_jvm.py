"""JVM fast-path extraction must equal the mapInPandas spec path exactly —
on the full fixture corpus (every hostile-input class) and on adversarial
hand-built rows that sit right on the clean/dirty screen boundary."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from node_feedparser_spark.operators.extract import dedupe_first_wins, extract_triples
from node_feedparser_spark.operators.extract_jvm import (
    _is_dirty,
    extract_triples_hybrid,
)
from node_feedparser_spark.schemas import TRANSCRIPTS
from node_feedparser_spark.sources.transcripts import read_transcripts


def _triple_set(df):
    return {
        (r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"], r["score"])
        for r in df.collect()
    }


def test_hybrid_equals_spec_on_corpus(spark, corpus_path):
    turns = dedupe_first_wins(read_transcripts(spark, corpus_path))
    want = _triple_set(extract_triples(turns))
    got = _triple_set(extract_triples_hybrid(turns))
    assert got == want
    assert len(got) > 1000


ADVERSARIAL = [
    # (text, tool) — rows near the screen boundary
    ("Spark uses Arrow", None),                       # plain clean
    ("  Spark uses Arrow \t\n", "bash"),              # strip boundary
    ("Kafka is a Broker and Redis is a Cache", None), # two pattern hits
    ("The is a Thing", None),                          # stopword subject
    ("A B C uses D E", None),                          # multi-word entities
    ("1 < 2 but Spark uses Arrow", None),              # '<' -> dirty path
    ("<p>Spark uses Arrow</p>", None),                 # html -> dirty path
    ("café Ã© Spark uses Arrow", None), # mojibake marker
    ("Spark uses Arrow", None),                   # exotic space
    ("tab\tseparated Spark uses Arrow", None),         # interior tab (clean)
    ("", "  sql  "),                                   # tool-only, padded
    (None, "search"),                                  # null text
    ("Spark uses Arrow Spark uses Arrow", None),       # within-turn dupes
    ("X.Y uses C++ and C# runs on .NET", None),        # symbol-heavy entities
    ("line\nbreak Spark uses Arrow", None),            # interior newline
    ("ends with Tool", "\x0bweird"),                   # dirty tool routes row
    ("plain text here", "bash\t"),                     # tab-padded tool (clean)
    ("plain text here", " \t "),                       # whitespace-only tool
    ("plain text here", "\nkubectl\r"),                # newline/CR-padded tool
    ("plain text here", "two words "),                 # interior space kept
]


def test_hybrid_equals_spec_adversarial(spark):
    rows = [
        ("adv", i, "user", text, tool, None)
        for i, (text, tool) in enumerate(ADVERSARIAL)
    ]
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df = spark.createDataFrame(pdf, schema=TRANSCRIPTS)
    want = _triple_set(extract_triples(df))
    got = _triple_set(extract_triples_hybrid(df))
    assert got == want


def test_screen_routes_expected_rows(spark):
    rows = [
        (0, "plain Spark uses Arrow", None),
        (1, "has <b>markup</b>", None),
        (2, "moji Ã©", None),
        (3, "ctrl \x01 char", None),
        (4, None, "tool"),
    ]
    df = spark.createDataFrame(rows, "turn_idx int, text string, tool string")
    got = {
        r["turn_idx"]: bool(r["d"])
        for r in df.select(
            "turn_idx", F.coalesce(_is_dirty(F.col("text"), F.col("tool")), F.lit(False)).alias("d")
        ).collect()
    }
    assert got == {0: False, 1: True, 2: True, 3: True, 4: False}


def test_jvm_path_has_no_python_and_no_shuffle(spark, corpus_path):
    """The clean-path plan must contain no Python evaluation nodes and no
    Exchange — one codegen projection."""
    import contextlib
    import io

    from node_feedparser_spark.operators.extract_jvm import extract_triples_jvm

    df = extract_triples_jvm(read_transcripts(spark, corpus_path))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert "Python" not in p and "MapInPandas" not in p
