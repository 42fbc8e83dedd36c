"""Rank-2 ALS matrix factorization as pure DataFrame algebra.

Collaborative-filtering embeddings (users x items from interaction counts)
via alternating least squares — but expressed entirely in built-in Spark
SQL functions: at rank 2 each least-squares solve is a CLOSED-FORM 2x2
normal-equation inverse, so one ALS half-step is literally

    join(ratings, other_side_factors) -> groupBy(side).agg(5 sums) ->
    projection computing (A + lambda*I)^-1 b per row

with no Python, no MLlib, no linear-algebra library — every half-step is
one shuffle and whole-stage codegen.  This is the DataFrame-native answer
to "train interaction embeddings over 10^12 events": the user side scales
out (partitioned by user), the item side is a small aggregate, item
factors broadcast.

Determinism / engine portability (the kmeans/HLL discipline from
operators/similarity.py and operators/sketch.py): item factors initialize
from the portable 60-bit hash mapped to (0,1); every aggregate rounds to
6 dp BEFORE the solve so float summation order can never leak into the
closed form; solved factors round to 6 dp.  The DuckDB oracle replays the
identical unrolled alternations via `als_sql` — emitted from the same
code, so Spark plan and oracle SQL cannot drift apart.

Semantics: explicit-feedback ALS (Zhou et al. 2008's shape with a plain
lambda*I ridge term, not the weighted n_u*lambda variant) on r(u,i) =
interaction count; loop = n_alt x (user solve, item solve) + one final
user solve against the final items, so the returned user embeddings are
consistent with the returned item factors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash60, portable_hash60_sql

LAM = 0.1
_DP = 6


def interaction_counts(
    events: DataFrame, user_col: str = "user_id", item_col: str = "event_type"
) -> DataFrame:
    """(user, item, r) with r = interaction count — the one corpus-scale
    aggregation (map-side combinable)."""
    return (
        events.groupBy(
            F.col(user_col).alias("user"), F.col(item_col).alias("item")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("r"))
    )


def init_item_factors(ratings: DataFrame) -> DataFrame:
    """Deterministic item-factor init in (0,1): hash of item||':f<k>'."""

    def _f(k: int):
        return (
            (
                portable_hash60(F.concat(F.col("item"), F.lit(f":f{k}")))
                % 1000
                + 1
            )
            / 1001.0
        ).alias(f"v{k}")

    return ratings.select("item").distinct().select("item", _f(1), _f(2))


def _solve(
    ratings: DataFrame,
    factors: DataFrame,
    solve_for: str,
    join_on: str,
    lam: float,
    broadcast_factors: bool,
) -> DataFrame:
    """One ALS half-step: solve `solve_for`-side factors against the
    `join_on`-side factors via the closed-form 2x2 ridge inverse."""
    f = F.broadcast(factors) if broadcast_factors else factors
    j = ratings.join(f, join_on)
    agg = j.groupBy(solve_for).agg(
        F.round(F.sum(F.col("v1") * F.col("v1")), _DP).alias("a11"),
        F.round(F.sum(F.col("v1") * F.col("v2")), _DP).alias("a12"),
        F.round(F.sum(F.col("v2") * F.col("v2")), _DP).alias("a22"),
        F.round(F.sum(F.col("r") * F.col("v1")), _DP).alias("b1"),
        F.round(F.sum(F.col("r") * F.col("v2")), _DP).alias("b2"),
    )
    a11 = F.col("a11") + lam
    a22 = F.col("a22") + lam
    a12 = F.col("a12")
    det = a11 * a22 - a12 * a12  # positive-definite: lam > 0
    return agg.select(
        solve_for,
        F.round((a22 * F.col("b1") - a12 * F.col("b2")) / det, _DP).alias(
            "v1"
        ),
        F.round((a11 * F.col("b2") - a12 * F.col("b1")) / det, _DP).alias(
            "v2"
        ),
    )


def als_factorize(
    events: DataFrame,
    n_alt: int = 2,
    lam: float = LAM,
    user_col: str = "user_id",
    item_col: str = "event_type",
) -> tuple[DataFrame, DataFrame]:
    """Run n_alt (user, item) alternations + a final user solve; returns
    (user_factors, item_factors) as (key, v1, v2) DataFrames.

    Scale shape per alternation: user solve = ratings ⋈ broadcast(items)
    then a user-keyed agg (one shuffle, partitioned by the big key); item
    solve = ratings ⋈ user-factors on user (co-keyed with the ratings
    shuffle) then an item-keyed agg whose output is item-cardinality-sized.
    Nothing is ever quadratic and the item table never grows past the
    catalog size.
    """
    if n_alt < 1:
        raise ValueError("n_alt must be >= 1")
    ratings = interaction_counts(events, user_col, item_col)
    items = init_item_factors(ratings)
    users = None
    for _ in range(n_alt):
        users = _solve(ratings, items, "user", "item", lam, True)
        items = _solve(ratings, users, "item", "user", lam, False)
    users = _solve(ratings, items, "user", "item", lam, True)
    return (
        users.select(F.col("user").alias(user_col), "v1", "v2"),
        items.select(F.col("item").alias(item_col), "v1", "v2"),
    )


# ----------------------------------------------------------- oracle emitter


def als_sql(
    n_alt: int = 2,
    lam: float = LAM,
    events_table: str = "events",
    user_col: str = "user_id",
    item_col: str = "event_type",
) -> str:
    """DuckDB SQL replaying als_factorize's unrolled alternations exactly
    (same init hash, same 6 dp rounding points, same closed form), emitted
    programmatically so plan and oracle cannot drift."""
    h1 = portable_hash60_sql(f"item || ':f1'")
    h2 = portable_hash60_sql(f"item || ':f2'")

    def solve(out: str, key: str, other: str, prev: str) -> str:
        return f"""
        {out}_agg AS (
            SELECT r.{key},
                   ROUND(SUM(f.v1 * f.v1), {_DP}) AS a11,
                   ROUND(SUM(f.v1 * f.v2), {_DP}) AS a12,
                   ROUND(SUM(f.v2 * f.v2), {_DP}) AS a22,
                   ROUND(SUM(r.r * f.v1), {_DP}) AS b1,
                   ROUND(SUM(r.r * f.v2), {_DP}) AS b2
            FROM ratings r JOIN {prev} f USING ({other})
            GROUP BY r.{key}),
        {out} AS (
            SELECT {key},
                   ROUND(((a22 + {lam}) * b1 - a12 * b2)
                         / ((a11 + {lam}) * (a22 + {lam}) - a12 * a12),
                         {_DP}) AS v1,
                   ROUND(((a11 + {lam}) * b2 - a12 * b1)
                         / ((a11 + {lam}) * (a22 + {lam}) - a12 * a12),
                         {_DP}) AS v2
            FROM {out}_agg)"""

    ctes = [
        f"""ratings AS (
            SELECT {user_col} AS "user", {item_col} AS item,
                   CAST(COUNT(*) AS DOUBLE) AS r
            FROM {events_table} GROUP BY 1, 2)""",
        f"""v0 AS (
            SELECT DISTINCT item,
                   ({h1} % 1000 + 1) / 1001.0 AS v1,
                   ({h2} % 1000 + 1) / 1001.0 AS v2
            FROM ratings)""",
    ]
    prev_items = "v0"
    step = 0
    for _ in range(n_alt):
        step += 1
        ctes.append(solve(f"u{step}", '"user"', "item", prev_items))
        ctes.append(solve(f"v{step}", "item", '"user"', f"u{step}"))
        prev_items = f"v{step}"
    ctes.append(solve("u_final", '"user"', "item", prev_items))
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        f'SELECT "user" AS {user_col}, v1, v2 FROM u_final'
    )
