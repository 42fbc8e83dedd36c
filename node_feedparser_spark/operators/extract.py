"""Distributed triple extraction — the Spark face of reference_extract.

Design (SURVEY.md §3.1 'Spark lifecycle equivalent'):
- extraction is per-turn, so it needs NO per-conversation grouping and NO
  shuffle: `mapInPandas` over whatever partitioning the scan produced.
  Mega-thread skew (FIXTURES.md `mega-`) therefore cannot create an
  extraction straggler — rows of one conversation spread across splits.
- the only required shuffle before extraction is first-wins dedupe of
  duplicate (conv_id, turn_idx) keys, a window over a deterministic total
  order (reference 'first guid wins', lib/feedparser.js:538; SURVEY.md A2).
- error containment: a turn whose extraction raises yields a single
  pred='__error__' row instead of failing the task (reference error-resume,
  lib/feedparser.js:140-154); the pipeline routes those rows to the metrics
  table (the analog of parser.errors).

No per-row Python UDFs anywhere — Arrow-batched `mapInPandas` /
`pandas_udf` only (BASELINE.json input_hint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..reference_extract import extract_turn
from ..functions.normalize import normalize_text
from ..schemas import TRIPLES_RAW

ERROR_PRED = "__error__"


def dedupe_first_wins(transcripts: DataFrame) -> DataFrame:
    """Keep the first row per (conv_id, turn_idx) under the spec's
    deterministic total order (ts, text ascending, nulls first).

    One shuffle on (conv_id, turn_idx).  At 10^12 turns this key is nearly
    unique so the window is cheap and skew-free: partitioning is by hash of
    the *composite* key, so even a mega-thread's turns spread uniformly.
    """
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("ts").asc_nulls_first(), F.col("text").asc_nulls_first()
    )
    return (
        transcripts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {
            "conv_id": [], "turn_idx": [], "subj": [], "pred": [],
            "obj": [], "score": [],
        }
        for conv_id, turn_idx, role, text, tool in zip(
            pdf["conv_id"], pdf["turn_idx"], pdf["role"], pdf["text"], pdf["tool"]
        ):
            # schema-violating keys (null turn_idx) must not kill the task
            # — and must not kill the ERROR handler either, so the safe
            # index is computed before the try (error-resume discipline,
            # /root/reference/lib/feedparser.js:140-154)
            ti = None if pd.isna(turn_idx) else int(turn_idx)
            try:
                if ti is None:
                    raise ValueError("null turn_idx")
                triples, _ = extract_turn(conv_id, ti, role, text, tool)
            except Exception:
                triples = [
                    {
                        "conv_id": conv_id, "turn_idx": -1 if ti is None else ti,
                        "subj": None, "pred": ERROR_PRED, "obj": None,
                        "score": 0.0,
                    }
                ]
            for t in triples:
                for k in out:
                    out[k].append(t[k])
        yield pd.DataFrame(out)


def extract_triples(turns: DataFrame) -> DataFrame:
    """transcript turns -> raw triples via Arrow-batched mapInPandas.

    Input must already be deduped (dedupe_first_wins).  Output carries
    (conv_id, turn_idx) so document order is reconstructible downstream via
    a window — order is data, not physical layout (SURVEY.md W1).
    """
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    return turns.select(*cols).mapInPandas(_extract_batches, schema=TRIPLES_RAW)


@pandas_udf(T.StringType())
def normalize_text_udf(texts: pd.Series) -> pd.Series:
    """Vectorized per-turn normalization; byte-identical to the pure-Python
    spec because it calls the same function (per-turn text equality gate)."""
    return texts.map(normalize_text)
