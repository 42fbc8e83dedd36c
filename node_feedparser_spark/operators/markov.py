"""First-order Markov chain over per-user event streams.

Sequence modeling for behavioral data: the maximum-likelihood transition
matrix P(next event type | current event type) from every user's
time-ordered stream, plus the distribution after k power-iteration steps
from uniform — the "what does this event stream converge to" diagnostic a
pipeline runs before sampling synthetic sessions or weighting
next-event-prediction training data.

Plan shape: transitions = one per-user lead() window (partitioned by the
big key, bounded per user) + one (cur, nxt) count agg whose output is
|event-type catalog|^2 — tiny; the power iterations run entirely on that
tiny matrix (joins of catalog-sized frames — at scale these are driver-
trivial broadcast ops, never corpus passes).

Determinism: transition probabilities round to 6 dp from exact integer
counts; each power-iteration step re-rounds to 6 dp (the ALS/kmeans
discipline) so both engines iterate identical numbers.  Stream order ties
on equal ts break by event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DP = 6


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(cur, nxt, n) counts of adjacent event-type pairs per user stream."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = events.select(
        F.col(type_col).alias("cur"),
        F.lead(type_col).over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    return pairs.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def markov_chain(
    events: DataFrame,
    n_steps: int = 2,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Transition matrix + k-step distribution from uniform.

    Returns one row per observed (cur, nxt): (cur, nxt, n, p, p_step_k)
    where p = round(n / out(cur), 6) and p_step_k is the probability mass
    AT state nxt after ``n_steps`` applications of the rounded matrix to
    the uniform row vector (repeated on every row with that nxt, rounded
    6 dp) — so the full chain AND its short-horizon behavior are pinned in
    one result.
    """
    if n_steps < 1:
        raise ValueError("n_steps must be >= 1")
    tc = transition_counts(events, user_col, type_col, ts_col, tiebreak_col)
    out_tot = tc.groupBy("cur").agg(F.sum("n").alias("tot"))
    pm = tc.join(out_tot, "cur").select(
        "cur", "nxt", "n", F.round(F.col("n") / F.col("tot"), _DP).alias("p")
    )
    states = pm.select(F.col("cur").alias("s")).union(
        pm.select("nxt")
    ).distinct()
    n_states = states.count()
    # uniform start vector over the observed state set
    vec = states.select(
        "s", F.round(F.lit(1.0 / n_states), _DP).alias("m")
    )
    for _ in range(n_steps):
        # v' = v P  (rows with no outgoing mass drop their mass — absorbing
        # leak is fine for a short-horizon diagnostic and both engines
        # replay it identically)
        vec = (
            pm.join(vec, pm.cur == vec.s)
            .groupBy(F.col("nxt").alias("s"))
            .agg(F.round(F.sum(F.col("p") * F.col("m")), _DP).alias("m"))
        )
    return pm.join(
        vec.select(F.col("s").alias("nxt"), F.col("m").alias("p_step_k")),
        "nxt",
        "left",
    ).select(
        "cur",
        "nxt",
        "n",
        "p",
        F.coalesce("p_step_k", F.lit(0.0)).alias("p_step_k"),
    )


def markov_sql(
    n_steps: int = 2,
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> str:
    """DuckDB replay of markov_chain, emitted from code (the als_sql
    discipline): same lead window, same rounding points, same leaky
    power iterations."""
    ctes = [
        f"""pairs AS (
            SELECT {type_col} AS cur,
                   LEAD({type_col}) OVER (PARTITION BY {user_col}
                        ORDER BY {ts_col}, {tiebreak_col}) AS nxt
            FROM {table})""",
        """tc AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
                  FROM pairs WHERE nxt IS NOT NULL GROUP BY 1, 2)""",
        """tot AS (SELECT cur, SUM(n) AS tot FROM tc GROUP BY 1)""",
        f"""pm AS (SELECT tc.cur, tc.nxt, tc.n,
                          ROUND(tc.n / CAST(tot.tot AS DOUBLE), {_DP}) AS p
                   FROM tc JOIN tot USING (cur))""",
        """states AS (SELECT DISTINCT cur AS s FROM pm
                      UNION SELECT DISTINCT nxt FROM pm)""",
        f"""v0 AS (SELECT s, ROUND(1.0 / (SELECT COUNT(*) FROM states),
                                   {_DP}) AS m
                   FROM states)""",
    ]
    prev = "v0"
    for k in range(1, n_steps + 1):
        ctes.append(
            f"""v{k} AS (
                SELECT pm.nxt AS s,
                       ROUND(SUM(pm.p * {prev}.m), {_DP}) AS m
                FROM pm JOIN {prev} ON pm.cur = {prev}.s
                GROUP BY 1)"""
        )
        prev = f"v{k}"
    body = ",\n".join(ctes)
    return f"""WITH {body}
        SELECT pm.cur, pm.nxt, pm.n, pm.p,
               COALESCE({prev}.m, 0.0) AS p_step_k
        FROM pm LEFT JOIN {prev} ON pm.nxt = {prev}.s"""
