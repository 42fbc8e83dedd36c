"""Knowledge fusion — truth discovery over conflicting triple claims.

A KG built from 10^12 transcript turns asserts the same ``(subj, pred)``
fact many times with *conflicting* objects, from sources of very unequal
reliability (different speakers, tools, scrapers).  The reference resolves
conflicts positionally — first value wins per field (dedupe-first-wins,
/root/reference/lib/feedparser.js:440-458) or a fixed precedence chain
(date fallbacks, lib/feedparser.js:389-401).  At corpus scale the analog
is *truth discovery*: estimate per-source trust and per-claim confidence
jointly, then keep the argmax object per ``(subj, pred)``.

``truth_fusion`` runs the classic fixed-point (TruthFinder / Latent
Credibility lite, simplified to the voting form):

    trust_0(source)   = 1
    conf_i(s, p, o)   = sum(trust_{i-1} of sources asserting (s,p,o))
                        / sum(trust_{i-1} over ALL claims on (s,p))
    trust_i(source)   = avg(conf_i over the source's claims)

unrolled a fixed ``n_iter`` times (like operators/graph_algo.pagerank —
fixed-point iterations as a static chain of joins the optimizer can see).

Scale shape: the claims table shuffles once per iteration on (subj, pred)
and once on source; the trust table is **one row per source** — broadcast
back onto claims, so the big side never re-shuffles for the trust join.
Intermediate confidences/trusts are rounded to 9 dp so the DuckDB oracle
(which replays the identical unrolled arithmetic) agrees bit-for-bit after
the final 6 dp rounding regardless of float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from node_feedparser_spark.operators.sessionize import epoch_seconds

#: decimal places for intermediate trust/confidence values — enough that
#: re-rounding at 6 dp downstream is stable across engines' sum orders.
_ROUND = 9


def truth_fusion(
    claims: DataFrame,
    n_iter: int = 2,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    source: str = "source",
) -> DataFrame:
    """Resolve conflicting ``(subj, pred) -> obj`` claims by iterative
    source-trust voting.

    `claims` rows are deduplicated to distinct (subj, pred, obj, source)
    assertions first (a source repeating itself is one vote).  Returns one
    row per (subj, pred): the winning ``obj`` (max final confidence,
    ties broken by obj ascending), its ``confidence`` (6 dp) and
    ``n_sources`` (how many sources asserted the winner).
    """
    c = claims.select(
        F.col(subj).alias("subj"),
        F.col(pred).alias("pred"),
        F.col(obj).alias("obj"),
        F.col(source).alias("source"),
    ).distinct()

    # trust_0 = 1.0 for every source (one row per source: broadcast-sized)
    trust = c.select("source").distinct().withColumn(
        "trust", F.lit(1.0)
    )

    conf = None
    for _ in range(n_iter):
        ct = c.join(F.broadcast(trust), "source")
        num = ct.groupBy("subj", "pred", "obj").agg(
            F.round(F.sum("trust"), _ROUND).alias("num"),
            F.count("*").cast("long").alias("n_sources"),
        )
        den = ct.groupBy("subj", "pred").agg(
            F.round(F.sum("trust"), _ROUND).alias("den")
        )
        conf = num.join(den, ["subj", "pred"]).select(
            "subj",
            "pred",
            "obj",
            "n_sources",
            F.round(F.col("num") / F.col("den"), _ROUND).alias("conf"),
        )
        trust = (
            c.join(conf, ["subj", "pred", "obj"])
            .groupBy("source")
            .agg(F.round(F.avg("conf"), _ROUND).alias("trust"))
        )

    # argmax obj per (subj, pred); deterministic tie-break on obj asc
    best = conf.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("subj", "pred").orderBy(
                F.col("conf").desc(), F.col("obj").asc()
            )
        ),
    )
    return best.filter(F.col("_rn") == 1).select(
        "subj",
        "pred",
        "obj",
        F.round("conf", 6).alias("confidence"),
        "n_sources",
    )


def time_decay_weights(
    assertions: DataFrame,
    key_cols: tuple[str, ...] = ("subj", "pred", "obj"),
    ts: str = "ts",
    now_s: int | None = None,
    half_life_seconds: int = 7 * 86_400,
) -> DataFrame:
    """Exponentially time-decayed assertion weights: for every key (edge,
    fact, mention group) emit

        w = sum_i 2^(-(now - t_i) / half_life)

    — the recency-weighted evidence mass a living KG uses instead of raw
    counts (a fact asserted 100 times last year loses to one asserted 5
    times today), the standard decay discipline of streaming aggregation
    (e.g. Chen et al., "Clustering over an evolving data stream", and
    every feed ranker since).  Deterministic: ``now_s`` must be supplied
    by the caller (epoch seconds) — there is no wall-clock read here, the
    same discipline as bench/test seeds.

    One map-side-combinable agg; the decay factor is computed per ROW
    before the sum (exp2 of an exact integer-seconds ratio), so the only
    order-sensitive float accumulation is the per-key sum itself — keys
    with few assertions (the KG edge shape) keep that noise at machine
    epsilon, and the output is 6dp-rounded like every other score.
    Emits (key..., n_obs, w_decayed, w_latest = decay of newest ts).
    """
    if now_s is None:
        raise ValueError("now_s is required (no wall-clock reads in operators)")
    age = F.lit(now_s).cast("double") - epoch_seconds(F.col(ts))
    # per-row decay rounded at _ROUND dp BEFORE the sum (module discipline:
    # makes the 6 dp re-round downstream stable across engines' sum orders)
    decay = F.round(
        F.pow(F.lit(2.0), -age / F.lit(float(half_life_seconds))), _ROUND
    )
    return (
        assertions.withColumn("_w", decay)
        .groupBy(*[F.col(c) for c in key_cols])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.round(F.sum("_w"), 6).alias("w_decayed"),
            F.round(F.max("_w"), 6).alias("w_latest"),
        )
    )
