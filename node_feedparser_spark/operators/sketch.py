"""Mergeable sketches — HyperLogLog distinct counting, count-min frequency
estimation, and histogram quantiles on DataFrames.

At 10^12 rows, ``COUNT(DISTINCT x)`` per group is a full shuffle of every
distinct value; the HLL sketch gets within a few percent with ONE
map-side-combinable aggregation whose state is ``m = 2^p`` small integers
per group.  Spark ships `approx_count_distinct` (a HLL++ built-in), but
its register layout is opaque to other engines; this operator builds the
registers from the repo's portable 60-bit hash (functions/hashing.py) so
the DuckDB oracle can replay them BIT-FOR-BIT — the same
engine-portability discipline as minhash/simhash.

Flajolet et al. 2007 estimator, 60-bit hash split as::

    bucket = h mod m                (low p bits)
    w      = h >> p                 (remaining 60-p bits)
    rho    = (60-p) - bitlen(w) + 1 (leading-zero rank; w=0 -> 60-p+1)

register[bucket] = max(rho); raw estimate alpha_m * m^2 / sum(2^-reg)
(empty buckets contribute 2^0 = 1); linear-counting correction
``m * ln(m / zeros)`` when the raw estimate <= 2.5m and zeros > 0.  No
64-bit large-range correction is needed at a 60-bit hash.

The register table is MERGEABLE (elementwise max) — sketches computed per
partition / per day union into totals without touching raw data, which is
the property that makes the sketch worth having at warehouse scale.

Plan: one groupBy(group, bucket) max (map-side combinable — the only pass
over the data), one groupBy(group) fold of <= m rows per group.  bitlen
via length(bin(w)) keeps everything integer-exact (no double holds a
60-bit int); the dyadic 2^-rho sums are rounded at 9 dp before the final
division so engine summation order cannot leak into the 4 dp estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from node_feedparser_spark.functions.hashing import portable_hash60

#: total hash bits produced by portable_hash60
_HASH_BITS = 60


def _alpha(m: int) -> float:
    # the standard bias-correction constant; the m >= 128 closed form
    # (p >= 7 enforced below)
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """(group..., bucket, register) — the mergeable sketch state."""
    if not 7 <= p <= 16:
        raise ValueError("p must be in [7, 16] (m = 2^p registers)")
    m = 1 << p
    h = portable_hash60(F.col(value_col).cast("string"))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(_HASH_BITS - p + 1)).otherwise(
        F.lit(_HASH_BITS - p + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            *group_cols,
            F.pmod(h, F.lit(m)).alias("bucket"),
            rho.cast("long").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL distinct-count estimate.

    Returns (group..., n_registers, n_zero_buckets, hll_estimate) with the
    estimate rounded to 4 dp.  Relative error is ~1.04/sqrt(m) (~6.5% at
    p=8; raise p for tighter bounds — state grows linearly).
    """
    return hll_estimate_from_registers(
        hll_registers(df, group_cols, value_col, p), group_cols, p
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union several sketches' register tables into one (elementwise max) —
    e.g. per-day sketches folding into a running total."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("register").alias("register")
    )


def hll_estimate_from_registers(
    registers: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Finish a (possibly merged) register table into estimates — identical
    arithmetic to hll_distinct's tail."""
    m = 1 << p
    alpha = _alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.round(F.sum(F.pow(F.lit(2.0), -F.col("register"))), 9).alias("_s"),
    )
    zeros = F.lit(m) - F.col("n_registers")
    raw = F.lit(alpha * m * m) / (F.col("_s") + zeros.cast("double"))
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        "n_registers",
        zeros.cast("long").alias("n_zero_buckets"),
        F.round(est, 4).alias("hll_estimate"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------
#
# Frequency estimation in sublinear state: d seeded hash rows of w counters;
# an item's estimate is the MIN of its d counters, which is always >= the
# true count (collisions only inflate) and exceeds it by more than
# eps * total_count with probability <= (1/2)^d at w = 2/eps.  The counter
# table is MERGEABLE by elementwise SUM — per-shard / per-day sketches fold
# into totals without touching raw data, exactly like hll_merge.
#
# Plan shape: ONE pass over the data (posexplode of the d bucket ids is a
# projection; the groupBy(row, bucket) count is map-side combinable with
# state d*w per partition), then estimation is a broadcast join of the
# candidate items against the d*w-row counter table.  No COUNT(*) GROUP BY
# over the full key domain ever happens — that is the point at 10^12 rows,
# where the exact per-token count table is itself warehouse-sized.


def cms_counters(
    df: DataFrame, value_col: str, d: int = 4, w: int = 512
) -> DataFrame:
    """(row, bucket, cnt) counter table — the mergeable sketch state.

    ``row`` indexes the d independent hash functions (portable_hash60
    seeded by row index, so the DuckDB oracle replays every counter
    bit-for-bit); ``bucket`` = hash mod w.
    """
    if d < 1 or w < 8:
        raise ValueError("need d >= 1 hash rows and w >= 8 counters")
    v = F.col(value_col).cast("string")
    buckets = F.array(
        *[F.pmod(portable_hash60(v, seed=r), F.lit(w)) for r in range(d)]
    )
    return (
        df.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(counters: DataFrame) -> DataFrame:
    """Fold several sketches' counter tables into one (elementwise sum)."""
    return counters.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    counters: DataFrame,
    items: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Point-estimate each item's frequency: min over the d counters.

    ``counters`` is broadcast (d*w rows); the items side never shuffles
    beyond its own groupBy(item) min — and since each item carries exactly
    d rows after the explode, that agg is map-side trivial.  Absent
    (row, bucket) cells are zero (the item was never seen).
    """
    v = F.col(value_col).cast("string")
    buckets = F.array(
        *[F.pmod(portable_hash60(v, seed=r), F.lit(w)) for r in range(d)]
    )
    return (
        items.select(
            F.col(value_col), F.posexplode(buckets).alias("row", "bucket")
        )
        .join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: float = 0.01,
    d: int = 4,
    w: int = 512,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Items whose estimated frequency >= threshold * total, via CMS.

    CMS one-sided error means NO true heavy hitter is ever missed (estimates
    only overshoot); light items can slip in on collisions — size w against
    the threshold (w >= 2 / threshold keeps expected overshoot below
    threshold/2 of mass).

    ``candidates`` defaults to the distinct items of ``df`` — fine below
    warehouse scale, but at 10^12 rows the distinct set is the very thing
    the sketch avoids materializing: pass a candidate frame from a
    hash-sampled stripe of the corpus instead (every item with frequency
    >= threshold appears in a 1/s sample w.h.p. for s << threshold *
    total), or track candidates streaming-side.  The sketch itself never
    depends on the candidate strategy.
    """
    counters = cms_counters(df, value_col, d, w)
    cand = (
        candidates
        if candidates is not None
        else df.select(value_col).distinct()
    )
    total = df.count()
    est = cms_estimate(counters, cand, value_col, d, w)
    floor_cnt = int(threshold * total)
    return est.filter(F.col("cms_count") >= floor_cnt).select(
        value_col,
        "cms_count",
        F.round(F.col("cms_count") / F.lit(float(total)), 6).alias(
            "est_frac"
        ),
    )


# ---------------------------------------------------------------------------
# Histogram quantiles
# ---------------------------------------------------------------------------
#
# Per-group quantile estimates from a fixed-width histogram: two cheap
# aggregations (per-group min/max, then per-group-and-bucket counts — both
# map-side combinable, state <= n_buckets per group) replace a full sort.
# The bucket table is MERGEABLE by elementwise sum given shared min/max
# (publish the (min, max) with the sketch, as real warehouse histogram
# stats do).  Error is bounded by one bucket width — tighten with
# n_buckets, state grows linearly.  Spark ships approx_percentile
# (Greenwald-Khanna); this operator exists for the same reason the HLL
# twin does: the sketch state is portable, so the DuckDB oracle replays it
# exactly, and per-shard states are explicitly foldable.


def histogram_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    n_buckets: int = 64,
) -> DataFrame:
    """(group..., q, quantile_est) — linear interpolation inside the
    covering bucket: est = lo + (b + partial/cnt_b) * (hi-lo)/B where b is
    the first bucket with cumulative count >= q*total and partial is the
    remaining rank mass inside it.  Degenerate groups (hi == lo) return the
    single value."""
    if not qs or any(not 0 < q < 1 for q in qs):
        raise ValueError("each q must be in (0, 1)")
    v = F.col(value_col).cast("double")
    bounds = df.groupBy(*group_cols).agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi")
    )
    b = F.when(
        F.col("_hi") > F.col("_lo"),
        F.least(
            F.floor(
                (v - F.col("_lo"))
                / (F.col("_hi") - F.col("_lo"))
                * n_buckets
            ),
            F.lit(n_buckets - 1),
        ),
    ).otherwise(F.lit(0))
    hist = (
        df.join(F.broadcast(bounds), group_cols)
        .select(*group_cols, "_lo", "_hi", b.cast("long").alias("_b"))
        .groupBy(*group_cols, "_lo", "_hi", "_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "_lo",
        "_hi",
        "_b",
        "_cnt",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(w_tot).alias("_tot"),
    )
    q_rows = cum.join(
        F.broadcast(
            cum.sparkSession.createDataFrame(
                [(float(q),) for q in qs], ["q"]
            )
        )
    )
    # first bucket whose cumulative count reaches rank q*total
    rank = F.col("q") * F.col("_tot")
    covering = q_rows.filter(
        (F.col("_cum") >= rank) & ((F.col("_cum") - F.col("_cnt")) < rank)
    )
    partial = rank - (F.col("_cum") - F.col("_cnt"))
    est = F.when(F.col("_hi") > F.col("_lo"),
        F.col("_lo")
        + (F.col("_b") + partial / F.col("_cnt"))
        * (F.col("_hi") - F.col("_lo"))
        / n_buckets,
    ).otherwise(F.col("_lo"))
    return covering.select(
        *group_cols,
        F.col("q"),
        F.round(est, 6).alias("quantile_est"),
    )


# Poisson(1) inverse-CDF thresholds (cumulative, 6 dp — exact decimal
# literals so Spark and DuckDB draw identical counts from identical hashes):
# P(X<=k) for k = 0..4; u above the last threshold draws 5.
POISSON1_CDF = [0.367879, 0.735759, 0.919699, 0.981012, 0.996340]


def poisson_bootstrap(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
    n_replicates: int = 50,
) -> DataFrame:
    """Per-group bootstrap standard error of the mean via the Poisson(1)
    bootstrap — the resampling scheme that actually distributes: instead of
    materializing B resamples of N rows (impossible at 10^12), every row
    independently draws a Poisson(1) multiplicity PER REPLICATE, which
    approximates multinomial resampling to O(1/N) and needs only one
    explode + two aggregations.

    The draw is DETERMINISTIC: u = (portable_hash60(id || ':' || replicate)
    mod 1e6) / 1e6 inverted through the 6 dp Poisson(1) CDF table — both
    engines draw bit-identical weights, so the oracle replays the whole
    resampling exactly (no RNG in either engine).

    Returns (group_col, mean, boot_mean, boot_se, n_reps), where mean is
    the plain group mean, boot_mean/boot_se are the mean and sample-stddev
    of the per-replicate weighted means (6 dp), n_reps counts replicates
    with nonzero total weight.

    Plan: explode sequence(1, B) (B x rows, corpus-linear), one
    (group, replicate) weighted agg (map-side combinable), one group agg
    over B-row slices.  No collect, no RNG state, no Python.
    """
    if n_replicates < 2:
        raise ValueError("n_replicates must be >= 2")
    rep = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("v"),
        F.col(id_col).cast("string").alias("_id"),
        F.explode(
            F.sequence(F.lit(1), F.lit(int(n_replicates)))
        ).alias("rep"),
    )
    u = (
        F.pmod(
            portable_hash60(
                F.concat(F.col("_id"), F.lit(":"), F.col("rep"))
            ),
            F.lit(1_000_000),
        )
        / 1_000_000.0
    )
    w = F.lit(0)
    for t in POISSON1_CDF:
        w = w + F.when(u >= t, 1).otherwise(0)
    per_rep = (
        rep.withColumn("w", w.cast("double"))
        .groupBy("grp", "rep")
        .agg(
            F.sum(F.col("w") * F.col("v")).alias("wv"),
            F.sum("w").alias("ws"),
        )
        .where(F.col("ws") > 0)
        .select("grp", "rep", (F.col("wv") / F.col("ws")).alias("m"))
    )
    plain = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.round(F.avg(F.col(value_col).cast("double")), 6).alias("mean")
    )
    boot = per_rep.groupBy("grp").agg(
        F.round(F.avg("m"), 6).alias("boot_mean"),
        F.round(F.stddev_samp("m"), 6).alias("boot_se"),
        F.count(F.lit(1)).cast("long").alias("n_reps"),
    )
    return plain.join(boot, "grp").select(
        F.col("grp").alias(group_col),
        "mean",
        "boot_mean",
        "boot_se",
        "n_reps",
    )


#: 2^60 — the exclusive upper bound of portable_hash60's value space.
#: Exactly representable as an IEEE double (power of two), so the
#: (count * SPACE / threshold) estimator divisions are bit-identical
#: across engines.
_KMV_SPACE = 1 << 60


def kmv_sketch(
    elements: DataFrame,
    side_col: str = "side",
    elem_col: str = "elem",
    k: int = 256,
) -> DataFrame:
    """The per-side KMV sketch state: (side, h, rn) — the k smallest
    distinct portable-60-bit hash values of each side's element set, rn
    = 1-based ascending rank.  MERGEABLE: the sketch of a union of
    element sets equals re-ranking the k smallest of the concatenated
    per-set sketches (pinned by tests/test_kmv.py) — per-shard / per-day
    sketches combine without touching raw data, the same property the
    HLL registers have.

    Plan: one distinct on (side, hash) — vocabulary-sized — then a
    two-stage k-smallest (64-way bucketed window before the per-side
    window) so no single task ever sorts a whole side's vocabulary."""
    h = portable_hash60(F.col(elem_col).cast("string"))
    dist = elements.select(
        F.col(side_col).alias("side"), h.alias("h")
    ).distinct()
    pre = Window.partitionBy("side", F.pmod(F.col("h"), F.lit(64))).orderBy(
        "h"
    )
    w = Window.partitionBy("side").orderBy("h")
    return (
        dist.withColumn("prn", F.row_number().over(pre))
        .filter(F.col("prn") <= k)
        .drop("prn")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def kmv_set_overlap(
    elements: DataFrame,
    side_col: str = "side",
    elem_col: str = "elem",
    k: int = 256,
) -> DataFrame:
    """KMV / theta-sketch set-overlap estimation (Beyer et al., "On
    Synopses for Distinct-Value Estimation Under Multiset Operations",
    SIGMOD 2007): per side, the sketch is the k smallest distinct 60-bit
    hash values; |S| ~ (k-1) * SPACE / h_(k), and union / intersection
    between sides are estimated from the combined sketch below
    theta = min(h_(k)^A, h_(k)^B).  This is how two 100 TB corpus slices
    compare vocabularies without a distinct-join: each side ships k
    integers, and sketches are trivially mergeable (k smallest of the
    concatenation).

    Deterministic by construction (md5-derived portable_hash60, the
    minhash discipline) so the DuckDB oracle rebuilds the identical
    sketches and estimates.  Sides with fewer than k distinct values get
    their EXACT count (threshold = SPACE, i.e. theta = 1) — the sketch
    degrades to exact, never to garbage.

    Plan (all JVM, zero Python): one distinct on (side, hash) — output
    vocabulary-sized, not corpus-sized — then a TWO-STAGE k-smallest
    (64-way bucketed window before the per-side window, so no single
    task ever sorts a whole side's vocabulary), then only sketch-sized
    (<= 2k row) joins and aggregates.  Exactly two side values expected;
    output is ONE row: (side_a, side_b, k, est_distinct_a,
    est_distinct_b, est_union, est_intersection, est_jaccard).
    """
    H = F.lit(_KMV_SPACE).cast("long")
    sk = kmv_sketch(elements, side_col=side_col, elem_col=elem_col, k=k)
    stats = sk.groupBy("side").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
    )
    st2 = stats.select(
        "side",
        "cnt",
        F.when(F.col("cnt") >= k, F.col("kth")).otherwise(H).alias("thresh"),
        F.when(F.col("cnt") < k, F.col("cnt").cast("double"))
        .otherwise(
            F.round(
                (F.lit(float(k - 1)) * H.cast("double"))
                / F.col("kth").cast("double"),
                4,
            )
        )
        .alias("est"),
    )
    sides = st2.agg(
        F.min("side").alias("side_a"),
        F.max("side").alias("side_b"),
        F.min_by("est", "side").alias("est_distinct_a"),
        F.max_by("est", "side").alias("est_distinct_b"),
        F.min("thresh").alias("min_thresh"),
        F.count_distinct("side").alias("n_sides"),
    )
    # live two-side guard: with a third side present, min/max would pick
    # two labels while the pruned counts mix ALL sides — fail loudly at
    # execution instead of mis-answering.  Folded into EVERY estimate's
    # dependency cone (est_distinct_a, est_distinct_b, and min_thresh,
    # which est_union / est_intersection / est_jaccard all consume via the
    # pruned-sketch filter) so no projection of the output can prune the
    # check away; use kmv_pairwise_overlap for the n-side matrix.
    def _guarded(col: str):
        return F.when(F.col("n_sides") == 2, F.col(col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("kmv_set_overlap expects exactly 2 sides, got "),
                    F.col("n_sides").cast("string"),
                    F.lit(
                        " — use kmv_pairwise_overlap for the n-side matrix"
                    ),
                )
            )
        )

    sides = (
        sides.withColumn("side_a", _guarded("side_a"))
        .withColumn("side_b", _guarded("side_b"))
        .withColumn("est_distinct_a", _guarded("est_distinct_a"))
        .withColumn("est_distinct_b", _guarded("est_distinct_b"))
        .withColumn("min_thresh", _guarded("min_thresh"))
        .drop("n_sides")
    )
    pruned = sk.crossJoin(F.broadcast(sides.select("min_thresh"))).filter(
        F.col("h") < F.col("min_thresh")
    )
    pc = pruned.groupBy("h").agg(
        F.countDistinct("side").alias("nsides")
    )
    cnts = pc.agg(
        F.count(F.lit(1)).alias("union_cnt"),
        F.count(F.when(F.col("nsides") == 2, F.lit(1))).alias("inter_cnt"),
    )
    out = sides.crossJoin(cnts)
    return out.select(
        "side_a",
        "side_b",
        F.lit(k).alias("k"),
        "est_distinct_a",
        "est_distinct_b",
        F.round(
            F.col("union_cnt").cast("double")
            * H.cast("double")
            / F.col("min_thresh").cast("double"),
            4,
        ).alias("est_union"),
        F.round(
            F.col("inter_cnt").cast("double")
            * H.cast("double")
            / F.col("min_thresh").cast("double"),
            4,
        ).alias("est_intersection"),
        F.when(
            F.col("union_cnt") > 0,
            F.round(
                F.col("inter_cnt").cast("double")
                / F.col("union_cnt").cast("double"),
                4,
            ),
        ).alias("est_jaccard"),
    )


def kmv_pairwise_overlap(
    elements: DataFrame,
    side_col: str = "side",
    elem_col: str = "elem",
    k: int = 128,
) -> DataFrame:
    """All-pairs KMV overlap matrix: one sketch per side, then every
    unordered side pair gets theta-sketch intersection / union / Jaccard
    estimates — the "which corpus slices share content" lineage matrix
    that would otherwise be a quadratic family of distinct-joins.  After
    the one sketch pass, EVERYTHING is sketch-sized: n_sides * k rows
    join against an n_pairs-row broadcast threshold table, so 100 slices
    of a 100 TB corpus compare in ~100*k integers.

    Per pair: theta = min of the two k-th values (a side under k distinct
    keeps theta = SPACE, i.e. its sketch IS the set); A' = that side's
    sketch values strictly below theta; est_inter = |A' n B'| * SPACE /
    theta, est_union = |A' u B'| * SPACE / theta, est_jaccard =
    |A' n B'| / |A' u B'| (the ratio estimator, NULL on empty union).
    Deterministic md5 hashing — the DuckDB oracle replays bit-for-bit.

    Returns (side_a, side_b, est_intersection, est_union, est_jaccard)
    with side_a < side_b.
    """
    H = F.lit(_KMV_SPACE).cast("long")
    sk = kmv_sketch(elements, side_col=side_col, elem_col=elem_col, k=k)
    stats = sk.groupBy("side").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
    )
    st = stats.select(
        "side",
        F.when(F.col("cnt") >= k, F.col("kth")).otherwise(H).alias("thresh"),
    )
    a, b = st.alias("a"), st.alias("b")
    pairs = (
        a.join(b, F.col("a.side") < F.col("b.side"))
        .select(
            F.col("a.side").alias("side_a"),
            F.col("b.side").alias("side_b"),
            F.least(F.col("a.thresh"), F.col("b.thresh")).alias("th"),
        )
    )
    # per-pair below-threshold counts for each side of the pair
    a_cnt = (
        pairs.join(F.broadcast(sk).alias("s"), F.col("s.side") == F.col("side_a"))
        .filter(F.col("s.h") < F.col("th"))
        .groupBy("side_a", "side_b")
        .agg(F.count(F.lit(1)).alias("na"))
    )
    b_cnt = (
        pairs.join(F.broadcast(sk).alias("s"), F.col("s.side") == F.col("side_b"))
        .filter(F.col("s.h") < F.col("th"))
        .groupBy("side_a", "side_b")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    s1, s2 = sk.alias("s1"), sk.alias("s2")
    inter = (
        s1.join(
            s2,
            (F.col("s1.h") == F.col("s2.h"))
            & (F.col("s1.side") < F.col("s2.side")),
        )
        .select(
            F.col("s1.side").alias("side_a"),
            F.col("s2.side").alias("side_b"),
            F.col("s1.h").alias("h"),
        )
        .join(pairs, ["side_a", "side_b"])
        .filter(F.col("h") < F.col("th"))
        .groupBy("side_a", "side_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    out = (
        pairs.join(a_cnt, ["side_a", "side_b"], "left")
        .join(b_cnt, ["side_a", "side_b"], "left")
        .join(inter, ["side_a", "side_b"], "left")
        .select(
            "side_a",
            "side_b",
            "th",
            F.coalesce(F.col("na"), F.lit(0)).alias("na"),
            F.coalesce(F.col("nb"), F.lit(0)).alias("nb"),
            F.coalesce(F.col("ni"), F.lit(0)).alias("ni"),
        )
        .withColumn("nu", F.col("na") + F.col("nb") - F.col("ni"))
    )
    return out.select(
        "side_a",
        "side_b",
        F.round(
            F.col("ni").cast("double")
            * H.cast("double")
            / F.col("th").cast("double"),
            4,
        ).alias("est_intersection"),
        F.round(
            F.col("nu").cast("double")
            * H.cast("double")
            / F.col("th").cast("double"),
            4,
        ).alias("est_union"),
        F.when(
            F.col("nu") > 0,
            F.round(F.col("ni").cast("double") / F.col("nu").cast("double"), 4),
        ).alias("est_jaccard"),
    )
