"""LLM-judge scoring at corpus scale — the model-based filtering stage.

Modern curation pipelines score documents with an LLM judge (educational-
value filters, constitution-style safety screens, RLAIF preference
labeling) and filter or weight on the scores.  The model endpoint is
external; what the ENGINE owes the pipeline is the distributed plumbing,
and that is what this module makes real, the multimodal-decode stub
discipline (operators/multimodal.py):

- Arrow-batched ``mapInPandas`` with a pluggable **batched** judge client
  (``judge_fn(texts, criterion) -> list[float]``) — one call per
  (Arrow batch × criterion), never per row, so a real HTTP/gRPC client
  amortizes exactly like the Arrow exchange does;
- one output row per (doc, criterion) with the score at 6 dp;
- error containment (A6 discipline, operators/extract.py): a NULL text or
  a per-batch client failure becomes (score NULL, error msg) rows — the
  job keeps going, the errors flow to metrics;
- a deterministic offline fake (``fake_judge``) scoring by the portable
  60-bit md5 hash (functions/hashing.py), so the ENTIRE path — batching,
  schema, rounding — is testable and DuckDB-oracle-checkable with no
  endpoint; swapping in a real client changes one callable.

Scale shape: embarrassingly parallel — no shuffle at all; the scan's
partitioning carries through the Python stage.  Batch size rides the
session's ``spark.sql.execution.arrow.maxRecordsPerBatch`` (10k, measured
in session.py).  Scores are floats produced by the CLIENT; the operator
only rounds them to 6 dp — cross-engine float discipline applies to the
fake, not to real model outputs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

_TWO_POW_60 = float(1 << 60)


def _r6(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def fake_judge(texts: list[str], criterion: str) -> list[float]:
    """Deterministic offline judge: score = portable 60-bit md5 hash of
    ``criterion:text`` scaled to [0, 1), 6 dp HALF_UP — bit-identical to
    the DuckDB replay ``ROUND(CAST(('0x' || substr(md5(...), 1, 15)) AS
    BIGINT) / 2^60, 6)``.  Uniform over inputs, so threshold filters
    downstream behave like a real (uncalibrated) judge distribution."""
    import hashlib

    out = []
    for t in texts:
        h = int(
            hashlib.md5(f"{criterion}:{t}".encode("utf-8")).hexdigest()[:15],
            16,
        )
        out.append(_r6(h / _TWO_POW_60))
    return out


def judge_scores(
    docs: DataFrame,
    criteria: tuple[str, ...] = ("helpfulness",),
    judge_fn: Callable[[list[str], str], list[float]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document on every criterion with a batched judge.

    Returns (``id_col`` long, criterion string, score double nullable,
    error string nullable): score NULL + error set for NULL text or when
    the client call for a batch×criterion fails (the whole batch's rows
    for that criterion carry the error — a batched client fails
    batched).  ``judge_fn`` defaults to the deterministic offline fake.
    """
    if not criteria:
        raise ValueError("criteria must be non-empty")
    fn = judge_fn or fake_judge
    crits = [str(c) for c in criteria]
    import pandas as pd

    def _score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col]
            texts = pdf[text_col]
            ok = texts.notna()
            out_frames = []
            for crit in crits:
                scores = [None] * len(pdf)
                errors = [None] * len(pdf)
                for i in (~ok).to_numpy().nonzero()[0]:
                    errors[int(i)] = "null text"
                idx = ok.to_numpy().nonzero()[0]
                if len(idx):
                    try:
                        vals = fn([texts.iat[int(i)] for i in idx], crit)
                        if len(vals) != len(idx):
                            raise ValueError(
                                f"judge returned {len(vals)} scores "
                                f"for {len(idx)} texts"
                            )
                        for j, i in enumerate(idx):
                            scores[int(i)] = _r6(float(vals[j]))
                    except Exception as e:  # noqa: BLE001 — A6: contain, emit
                        msg = f"judge error: {e}"
                        for i in idx:
                            errors[int(i)] = msg
                out_frames.append(
                    pd.DataFrame(
                        {
                            id_col: ids.to_numpy(),
                            "criterion": crit,
                            "score": pd.array(scores, dtype="float64"),
                            "error": pd.array(errors, dtype=object),
                        }
                    )
                )
            yield pd.concat(out_frames, ignore_index=True)

    return docs.select(id_col, text_col).mapInPandas(
        _score,
        schema=f"{id_col} long, criterion string, score double, error string",
    )
