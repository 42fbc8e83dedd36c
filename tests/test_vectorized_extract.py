"""The vectorized clean-row fast path must emit exactly the spec path's
triple set — (conv_id, turn_idx, subj, pred, obj, score) — on the fixture
corpus and on adversarial rows at the clean/dirty screen boundary.

The comparison is pure pandas (no Spark session) so it pins the batch
functions themselves; the Spark-level parity (extract_triples vs the
pure-Python extract_corpus) is already pinned by test_spark_extract.py,
which now exercises the fast path implicitly.
"""

import numpy as np
import pandas as pd
import pytest

from node_feedparser_spark.datagen import generate_transcripts
from node_feedparser_spark.operators.extract import (
    _DIRTY_RE,
    _extract_batches,
    _extract_clean,
    _extract_rows_spec,
)


def _tset(df: pd.DataFrame) -> set:
    return {
        (r.conv_id, r.turn_idx, r.subj, r.pred, r.obj, r.score)
        for r in df.itertuples(index=False)
    }


def _clean_mask(pdf: pd.DataFrame) -> pd.Series:
    text = pdf["text"]
    dirty = (
        text.notna() & text.str.contains(_DIRTY_RE, regex=True, na=False)
    ) | pdf["turn_idx"].isna()
    return ~dirty


def test_clean_path_equals_spec_on_corpus():
    pdf = generate_transcripts(seed=42, scale=1.0)[
        ["conv_id", "turn_idx", "role", "text", "tool"]
    ]
    clean = pdf[_clean_mask(pdf)].reset_index(drop=True)
    assert len(clean) > 0.5 * len(pdf), "fixture corpus should be mostly clean"
    got = _tset(_extract_clean(clean))
    want = _tset(_extract_rows_spec(clean))
    assert got == want
    assert len(got) > 1000


ADVERSARIAL_CLEAN = [
    # rows the screen must classify CLEAN, exercising fast-path edges
    ("Spark uses Arrow", None),
    ("  padded \t\n Spark uses Arrow \r ", "bash\t"),
    ("", "  sql  "),
    ("", " \t "),                       # whitespace-only tool -> no triple
    (None, "search"),                    # null text, tool only
    ("A B C uses D E and The is a Thing", None),
    ("Spark uses Arrow Spark uses Arrow", None),   # within-turn dupes
    ("X.Y uses C++ and C# runs on .NET", None),
    ("tab\tseparated Kafka is a Broker", None),
    ("line\nbreak Redis is a Cache", None),
    ("Boundary", None),                  # entity at exact row boundary
    ("Edge", None),                      # single-word rows back to back
    ("The", None),                       # lone stopword -> nothing
    ("", None),                          # empty
    ("lowercase only, no entities", None),
]


def test_clean_path_equals_spec_adversarial():
    rows = [
        ("adv", i, "user", text, tool)
        for i, (text, tool) in enumerate(ADVERSARIAL_CLEAN)
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    assert _clean_mask(pdf).all(), "all adversarial rows must screen clean"
    assert _tset(_extract_clean(pdf)) == _tset(_extract_rows_spec(pdf))


def test_batch_router_matches_spec_on_mixed_batch():
    """Route a batch mixing clean and dirty rows; the union must equal the
    spec path run over everything (dirty rows include an error row)."""
    rows = [
        ("mix", 0, "user", "Spark uses Arrow", None),
        ("mix", 1, "user", "<p>Spark uses Arrow</p>", None),   # html -> dirty
        ("mix", 2, "user", "moji Ã© Kafka is a Broker", None),  # mojibake
        ("mix", 3, "user", "ctrl \x01 Redis is a Cache", None),
        ("mix", None, "user", "null idx", None),                # error row
        ("mix", 5, "user", "plain Flink runs on JVM", "spark-submit"),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    got = pd.concat(list(_extract_batches(iter([pdf]))), ignore_index=True)
    want = _extract_rows_spec(pdf)
    assert _tset(got) == _tset(want)
    assert (got["pred"] == "__error__").sum() == 1


def test_mega_string_boundary_isolation():
    """Entities/patterns at exact row boundaries must not merge across rows:
    adjacent single-entity rows stay separate mentions, and a pattern split
    across two rows must NOT match."""
    rows = [
        ("b", 0, "user", "Spark", None),
        ("b", 1, "user", "uses Arrow", None),   # 'Spark\x00uses Arrow' no match
        ("b", 2, "user", "Kafka uses", None),
        ("b", 3, "user", "Zookeeper", None),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    got = _extract_clean(pdf)
    assert not (got["pred"] == "uses").any()
    mentions = {(r.turn_idx, r.obj) for r in got.itertuples(index=False)}
    assert (0, "Spark") in mentions and (3, "Zookeeper") in mentions
    assert _tset(got) == _tset(_extract_rows_spec(pdf))


@pytest.mark.parametrize("n", [1, 2, 7])
def test_tiny_batches(n):
    pdf = pd.DataFrame(
        [("t", i, "user", f"Tool{i} uses Lib{i}", None) for i in range(n)],
        columns=["conv_id", "turn_idx", "role", "text", "tool"],
    )
    assert _tset(_extract_clean(pdf)) == _tset(_extract_rows_spec(pdf))


def test_hypothesis_like_random_clean_rows():
    """Randomized (seeded) clean rows: mixtures of entities, stopwords,
    relation phrases, varied whitespace padding and tools."""
    rng = np.random.default_rng(7)
    ents = ["Spark", "Arrow Flight", "The", "Kafka", "B2", "C++", "It"]
    phrases = ["uses", "is a", "runs on", "depends on", "connects to"]
    rows = []
    for i in range(500):
        k = rng.integers(0, 4)
        words = []
        for _ in range(k):
            words.append(str(rng.choice(ents)))
            words.append(str(rng.choice(phrases)))
        words.append(str(rng.choice(ents + ["plain", "lower case tail"])))
        pad_l = " " * int(rng.integers(0, 3))
        pad_r = "\t" * int(rng.integers(0, 2))
        tool = str(rng.choice(["bash", " kubectl ", "", None], p=[0.3, 0.2, 0.2, 0.3]))
        rows.append(
            ("r", i, "user", pad_l + " ".join(words) + pad_r,
             None if tool == "None" else tool)
        )
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    assert _clean_mask(pdf).all()
    assert _tset(_extract_clean(pdf)) == _tset(_extract_rows_spec(pdf))
