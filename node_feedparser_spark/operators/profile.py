"""Key-skew profiling — the diagnosis step behind every salting decision.

The repo handles skew in several places (conv_apply salted applyInPandas,
simhash hot-block guard, AQE skew-join in the pipeline); this operator is
the PROFILER that tells an operator owner where those mitigations are
needed before a job falls over: per-key share of the table, how many
average-partition-widths the key would occupy after a hash shuffle, and
the salt factor that would bound it back to one partition's width.

One count agg (map-side combinable) + windows over the top-k rows only.
The full per-key count table never leaves the executors — the profile is
the top-k slice, deterministically tie-broken.

Reference analog: the reference caps pathological inputs structurally
(MAX_BUFFER_LENGTH guard, /root/reference/lib/feedparser.js:33-35) — the
same "measure, then bound the hot case" discipline applied to shuffle keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skew_profile(
    df: DataFrame,
    key_col: str,
    n_partitions: int = 200,
    top_k: int = 10,
) -> DataFrame:
    """Top-``top_k`` hottest keys of ``key_col`` with skew arithmetic.

    Returns (key as string, n, share, partition_widths, suggested_salt):
    share = n / total rows (6 dp); partition_widths = share * n_partitions
    (6 dp) — how many average-partition-widths of work this single key
    ships to one reducer; suggested_salt = ceil(partition_widths) clamped
    to >= 1 — the split factor that bounds the key back to one partition's
    width.  Ordered by (n desc, key) — fully deterministic.
    """
    if n_partitions < 1 or top_k < 1:
        raise ValueError("n_partitions and top_k must be >= 1")
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_tot = Window.partitionBy()
    w_rank = Window.orderBy(F.col("n").desc(), F.col("key"))
    share = F.col("n") / F.sum("n").over(w_tot)
    return (
        counts.withColumn("share", F.round(share, 6))
        .withColumn(
            "partition_widths", F.round(share * n_partitions, 6)
        )
        .withColumn(
            "suggested_salt",
            F.greatest(
                F.ceil(share * n_partitions), F.lit(1)
            ).cast("long"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= top_k)
        .select(
            "key",
            F.col("n").cast("long").alias("n"),
            "share",
            "partition_widths",
            "suggested_salt",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def k_anonymity_violations(
    df: DataFrame, qid_cols: list[str], k: int = 5
) -> DataFrame:
    """Quasi-identifier combinations occurring fewer than ``k`` times —
    the k-anonymity audit a pipeline runs after `curation.pii_scrub`:
    direct identifiers are scrubbed by pattern, but RARE attribute
    combinations still re-identify (the classic linkage-attack surface),
    and the fix (suppress or generalize those rows) starts from exactly
    this violating-group list.

    One count agg on the QID tuple (map-side combinable); the result is
    only the violating groups, ordered nowhere — callers aggregate or
    join back to suppress.  Returns (qid_cols..., n) with 1 <= n < k.
    """
    if not qid_cols:
        raise ValueError("qid_cols must be non-empty")
    if k < 2:
        raise ValueError("k must be >= 2")
    return (
        df.groupBy(*qid_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") < k)
    )


def l_diversity_violations(
    df: DataFrame,
    qid_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """Quasi-identifier groups whose SENSITIVE attribute takes fewer than
    ``l`` distinct values — the homogeneity-attack audit that k-anonymity
    alone misses (Machanavajjhala et al., ICDE'06): a group can be large
    (k-anonymous) yet still leak if every row in it shares one sensitive
    value, so an attacker who places a person in the group learns the
    attribute without identifying the row.

    Runs downstream of `k_anonymity_violations` on the SAME qid tuple:
    k-anonymity bounds group SIZE, this bounds group ENTROPY floor.
    Plan: one groupBy(qid) with count + count_distinct(sensitive) — the
    distinct agg is Spark's standard two-phase partial-distinct expand,
    map-side combinable on (qid, sensitive) first, so the shuffle carries
    at most one row per observed (qid, sensitive) pair, never the corpus.
    NULL sensitive values are their own disclosure (the attacker learns
    "withheld") and count as one distinct value via a coalesce sentinel.

    Returns (qid_cols..., n, n_distinct_sensitive) for violating groups
    only: n_distinct_sensitive < l.
    """
    if not qid_cols:
        raise ValueError("qid_cols must be non-empty")
    if l < 2:
        raise ValueError("l must be >= 2")
    if sensitive_col in qid_cols:
        raise ValueError("sensitive_col must not be a qid column")
    sens = F.coalesce(
        F.col(sensitive_col).cast("string"), F.lit("\x00null")
    )
    return (
        df.groupBy(*qid_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct(sens).cast("long").alias(
                "n_distinct_sensitive"
            ),
        )
        .where(F.col("n_distinct_sensitive") < l)
    )


def t_closeness_violations(
    df: DataFrame,
    qid_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """Quasi-identifier groups whose SENSITIVE-attribute distribution sits
    farther than ``t`` from the table-global distribution — the
    skewness-attack audit that l-diversity misses (Li, Li &
    Venkatasubramanian, ICDE'07): a group can carry >= l distinct
    sensitive values yet still leak if its MIX differs sharply from the
    population (e.g. 90% of one diagnosis where the population has 5%).
    Completes the trio: `k_anonymity_violations` bounds group SIZE,
    `l_diversity_violations` bounds the distinct floor, this bounds the
    DISTRIBUTIONAL gap.

    Distance is the earth-mover distance under equal ground distance
    (the paper's categorical case) = total variation:

        tv(c) = 1/2 * sum_s | n_cs/n_c - n_s/n |

    summed over the GLOBAL sensitive domain.  Values absent from the
    class contribute |0 - n_s/n| — materializing that class x domain
    cross product would explode, so the absent mass is folded in
    algebraically: sum_{absent s} n_s*n_c = n_c*(n - sum_{present} n_s),
    keeping the shuffle at ONE row per observed (qid, sensitive) pair,
    the l_diversity scale shape exactly.

    All mass terms are exact integer arithmetic (|n_cs*n - n_s*n_c| as
    longs; sound for n below ~3e9 rows — beyond that, audit per
    partition); ONE double division at the end, rounded 6 dp, so the SQL
    oracle is bit-identical.  NULL sensitive values are their own
    disclosure and count as a domain value via a coalesce sentinel.

    Plan: one groupBy(qid, sensitive) count (map-side combinable), two
    re-aggregations of that pair table (per-class, per-value — both tiny
    relative to the corpus), a 1-row global total broadcast-crossed in,
    and one final per-class sum.  The corpus shuffles once.

    Returns (qid_cols..., n, tv_distance) for violating groups only:
    tv_distance > t (strictly — a class AT the bound passes).
    """
    if not qid_cols:
        raise ValueError("qid_cols must be non-empty")
    if not 0 < t < 1:
        raise ValueError("t must be in (0, 1)")
    if sensitive_col in qid_cols:
        raise ValueError("sensitive_col must not be a qid column")
    sens = F.coalesce(
        F.col(sensitive_col).cast("string"), F.lit("\x00null")
    )
    pairs = df.groupBy(*qid_cols, sens.alias("__s")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cs")
    )
    per_class = pairs.groupBy(*qid_cols).agg(
        F.sum("n_cs").cast("long").alias("n_c")
    )
    per_value = pairs.groupBy("__s").agg(
        F.sum("n_cs").cast("long").alias("n_s")
    )
    total = per_value.agg(F.sum("n_s").cast("long").alias("n_tot"))
    enriched = (
        pairs.join(per_value, "__s")
        .join(per_class, qid_cols)
        .join(F.broadcast(total))
    )
    numer_present = F.abs(
        F.col("n_cs") * F.col("n_tot") - F.col("n_s") * F.col("n_c")
    )
    agg = enriched.groupBy(*qid_cols).agg(
        F.first("n_c").alias("n_c"),
        F.first("n_tot").alias("n_tot"),
        F.sum(numer_present).cast("long").alias("num_present"),
        F.sum("n_s").cast("long").alias("ns_present"),
    )
    numer_total = F.col("num_present") + F.col("n_c") * (
        F.col("n_tot") - F.col("ns_present")
    )
    return (
        agg.withColumn(
            "tv_distance",
            F.round(
                numer_total / (F.lit(2.0) * F.col("n_c") * F.col("n_tot")),
                6,
            ),
        )
        .where(F.col("tv_distance") > t)
        .select(
            *qid_cols,
            F.col("n_c").cast("long").alias("n"),
            "tv_distance",
        )
    )


def blocking_quality(
    candidates: DataFrame,
    truth: DataFrame,
    records: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Blocking-quality audit for entity-resolution candidate generation:
    the standard reduction-ratio / pairs-completeness / pair-quality
    triple (Christen's ER evaluation framework) of a blocking scheme's
    ``candidates`` against a ``truth`` pair set.

    - reduction_ratio  = 1 - n_candidates / C(n_records, 2): how much of
      the quadratic comparison space the blocking prunes (the whole point
      of blocking — at 10^12 records, anything below ~0.999999 is a
      non-starter);
    - pairs_completeness = n_hits / n_truth: the recall of the blocking —
      true pairs whose candidates survive (what the SNM multi-pass /
      LSH band-count knobs trade against the ratio above);
    - pair_quality = n_hits / n_candidates: candidate precision (how much
      verify work is wasted).

    Pairs are canonicalized to (least, greatest) and deduplicated on both
    sides, so pass unions and (a,b)/(b,a) mirror encodings audit
    correctly.  Scale shape: two pair-keyed distincts, one semi-join on
    the pair key, then three single-row aggregates cross-joined — the
    record table itself contributes only COUNT(DISTINCT id).  Returns one
    row: (n_records, n_total_pairs, n_candidates, n_truth, n_hits,
    reduction_ratio, pairs_completeness, pair_quality).
    """

    def _canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        ).distinct()

    cand = _canon(candidates)
    tru = _canon(truth)
    n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    n_tru = tru.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    n_hit = tru.join(cand, ["a", "b"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    n_rec = records.agg(
        F.countDistinct(F.col(id_col)).cast("long").alias("n_records")
    )
    total = (F.col("n_records") * (F.col("n_records") - 1) / 2).cast("long")
    return (
        n_rec.crossJoin(n_cand)
        .crossJoin(n_tru)
        .crossJoin(n_hit)
        .select(
            "n_records",
            total.alias("n_total_pairs"),
            "n_candidates",
            "n_truth",
            "n_hits",
            F.round(
                1 - F.col("n_candidates") / total.cast("double"), 6
            ).alias("reduction_ratio"),
            F.round(F.col("n_hits") / F.col("n_truth"), 6).alias(
                "pairs_completeness"
            ),
            F.round(F.col("n_hits") / F.col("n_candidates"), 6).alias(
                "pair_quality"
            ),
        )
    )


def burst_detect(
    events: DataFrame,
    group: str = "event_type",
    ts: str = "ts",
    bucket_seconds: int = 21_600,
    trail: int = 8,
    z: float = 2.0,
) -> DataFrame:
    """Rate-burst detection over an event stream: bucket counts per
    ``group``, then flag buckets whose count exceeds the trailing-window
    mean by ``z`` trailing standard deviations — the streaming-corpus
    anomaly screen (a feed suddenly re-emitting its archive, a scraper
    loop, an error storm) run as a batch operator.  Kleinberg's burst
    model is the literature anchor; this is the deterministic z-score
    variant of its level-0/1 split.

    Plan shape for scale: the raw stream collapses to per-(group, bucket)
    counts FIRST (one map-side-combinable agg, output bounded by
    groups x time-buckets, not events); the lag window then runs over
    that bounded table partitioned by group.  Mean/std come from integer
    sum/sum-of-squares over exactly ``trail`` preceding buckets
    (warm-up rows with fewer are never flagged), and the flag test is
    ROUND(cnt - mean - z*std, 6) > 0 so the oracle comparison never
    straddles a ULP.  std uses the sample (n-1) denominator; a flat
    trailing window (std = 0) still flags any strict rise, which the
    +0*std edge handles for free.
    """
    b = F.lit(bucket_seconds).cast("long")
    cnts = (
        events.select(
            F.col(group).alias("g"),
            ((F.unix_micros(F.col(ts).cast("timestamp")) / 1_000_000).cast("long")
             / b).cast("long").alias("bkt"),
        )
        .groupBy("g", "bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("g").orderBy("bkt").rowsBetween(-trail, -1)
    t = cnts.select(
        "g",
        "bkt",
        "cnt",
        F.count(F.lit(1)).over(w).alias("k"),
        F.sum("cnt").over(w).alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("s2"),
    ).filter(F.col("k") == trail)
    mean = F.col("s1") / trail
    var = (F.col("s2") - F.col("s1") * F.col("s1") / trail) / (trail - 1)
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (
        t.withColumn("mean", mean)
        .withColumn("std", std)
        .filter(F.round(F.col("cnt") - F.col("mean") - z * F.col("std"), 6) > 0)
        .select(
            F.col("g").alias(group),
            (F.col("bkt") * b).alias("bucket_start_s"),
            F.col("cnt").cast("long").alias("cnt"),
            F.round("mean", 6).alias("trail_mean"),
            F.round("std", 6).alias("trail_std"),
        )
    )


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    relation: str,
) -> DataFrame:
    """Referential-integrity profile for one FK relation, as ONE row
    (relation, n_child, n_orphan, orphan_rate): how many child rows
    reference a parent that does not exist — the generic-table face of
    validate_kg's triple_refs_resolve/edge_refs_resolve checks, run
    BEFORE graph construction so broken joins surface as a number, not
    as silently-dropped rows in an inner join downstream.

    Plan: distinct parent keys (dimension-sized) left-joined under the
    child keys, one count agg; NULL child keys count as orphans (they
    would vanish in an inner join — that is exactly the bug class this
    reports).  In-plan HALF_UP rounding.
    """
    p = parent.select(F.col(parent_key).alias("_pk")).distinct().withColumn(
        "_hit", F.lit(1)
    )
    j = child.select(F.col(child_key).alias("_pk")).join(p, "_pk", "left")
    return j.agg(
        F.lit(relation).alias("relation"),
        F.count(F.lit(1)).cast("long").alias("n_child"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_orphan"),
        F.round(
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("orphan_rate"),
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column STRING-DOMAIN profile, one row per column:
    (column, n_rows, n_null, n_distinct, min_s, max_s) with values cast
    to string first — min/max are lexicographic BY CONTRACT (float
    columns are out of scope: engines format doubles differently, so a
    float profile would not be oracle-portable; profile their rounded
    string derivation instead).  The ingest-time schema sanity check a
    pipeline runs before trusting a new snapshot: nullability creep,
    cardinality collapse, and domain drift all show up here.

    Plan: one pass per column (each a map-side-combinable agg over one
    projected column — column pruning reaches the scan), unioned; for
    wide tables Spark scans stay columnar so k small aggs beat one
    row-exploding unpivot.
    """
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            df.select(s.alias("_v")).agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null"),
                F.count_distinct(F.col("_v")).cast("long").alias("n_distinct"),
                F.min("_v").alias("min_s"),
                F.max("_v").alias("max_s"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


#: Benford expected first-digit probabilities, log10(1 + 1/d) — module
#: literals so the Spark plan and the SQL oracle embed the SAME doubles
BENFORD_P = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_digits(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-digit profile of a positive money-like column:
    per digit d in 1..9, (digit, n_obs, exp_p, contrib) where contrib is
    the chi-square term (n_obs - n*p_d)^2 / (n*p_d) — the fraud/synthetic
    -data screen (Benford 1938; Nigrini's forensic accounting practice):
    organically-grown magnitudes follow log10(1+1/d), fabricated or
    truncated feeds don't.  Sum contrib for the chi-square statistic
    (df=8); emitting per-digit rows keeps every number derived row-
    locally from integer counts and literal constants — no float sum
    crosses rows, the modularity discipline.

    Portability: the leading digit comes from ROUND(x*100) cast to long
    then string (ROUND is HALF_UP in both engines; a raw double→int cast
    TRUNCATES in Spark ANSI but ROUNDS in DuckDB — the 9999.99→10000
    digit flip this sidesteps).  Positive-domain column by contract.
    """
    cents = F.round(F.col(col) * 100, 0).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = (
        df.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(d, p) for d, p in sorted(BENFORD_P.items())], "digit int, exp_p double"
    )
    j = dim.join(obs, "digit", "left").join(F.broadcast(tot))
    e = F.col("n") * F.col("exp_p")
    o = F.coalesce("n_obs", F.lit(0).cast("long"))
    return j.select(
        F.col("digit").cast("long").alias("digit"),
        o.alias("n_obs"),
        F.round("exp_p", 6).alias("exp_p"),
        F.round((o - e) * (o - e) / e, 6).alias("contrib"),
    )


def gini_concentration(
    values: DataFrame, value: str = "v", round_dp: int = 6
) -> DataFrame:
    """Gini coefficient of a non-negative value column, as ONE row
    (gini, n, total) — the concentration probe completing the
    distribution-profile family (powerlaw_alpha: tail exponent;
    assortativity: degree mixing; this: how unequal the mass is, e.g.
    "do 1% of entities hold 90% of the edge weight", the number that
    predicts whether broadcast thresholds and salting plans survive the
    next snapshot).

    Exact grouped computation, never a per-row sort: values collapse to
    a distinct-value histogram (map-side-combinable), the single window
    runs over DISTINCT VALUES ascending (same bounded-table discipline
    as roc_auc/hist_quantiles), and ties are exact because equal values
    contribute identical rank-weighted mass whatever their order:

        G = 2 * sum_k v_k * (c_k * n_below_k + c_k*(c_k+1)/2)
            / (n * S) - (n + 1) / n
    """
    hist = (
        values.select(F.col(value).alias("_v"))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    t = hist.select(
        "_v",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0).cast("long")).alias("nb"),
    )
    return t.agg(
        F.round(
            2.0
            * F.sum(
                F.col("_v")
                * (F.col("c") * F.col("nb") + F.col("c") * (F.col("c") + 1) / 2.0)
            )
            / (F.sum("c") * F.sum(F.col("_v") * F.col("c")))
            - (F.sum("c") + 1) / F.sum("c"),
            round_dp,
        ).alias("gini"),
        F.sum("c").cast("long").alias("n"),
        F.round(F.sum(F.col("_v") * F.col("c")), 6).alias("total"),
    )


def exact_percentiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """EXACT grouped quartiles (p25 / p50 / p75) of an integer-valued
    column — the sketch-free twin of `hist_quantiles`: where that trades
    accuracy for a fixed-size state at unbounded cardinality, this is
    bit-exact whenever the value DOMAIN is bounded (quantities, counts,
    ages, star-ratings — most KG edge statistics), which is the common
    case the sketch needlessly approximates.

    Selection semantics: p_q = the element at 1-indexed position
    ``ceil(q * n)`` of the sorted multiset (the lower/type-1 empirical
    quantile) — pure integer position arithmetic, NO interpolation, so
    no float ever enters and the SQL oracle is bit-identical (engines
    disagree on interpolated percentile conventions; they cannot
    disagree on element selection).

    Plan (the gini/roc_auc distinct-histogram discipline): values
    collapse to a per-(key, value) count first (map-side combinable —
    the only corpus-sized shuffle), the cumulative window runs over
    DISTINCT VALUES per key, never rows, and one final min-conditional
    agg picks each quartile.  A key with millions of rows but a bounded
    value domain costs its distinct-value count, not its row count.

    Returns (key_cols..., n, p25, p50, p75), all longs.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    hist = df.groupBy(
        *key_cols, F.col(value_col).cast("long").alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_ord = (
        Window.partitionBy(*key_cols)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*key_cols)
    cum = hist.select(
        *key_cols,
        "v",
        F.sum("c").over(w_ord).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )

    def _pick(num: int, den: int, name: str):
        pos = F.expr(f"(n * {num} + {den} - 1) DIV {den}")
        return F.min(
            F.when(F.col("cum") >= pos, F.col("v"))
        ).cast("long").alias(name)

    return cum.groupBy(*key_cols).agg(
        F.first("n").cast("long").alias("n"),
        _pick(1, 4, "p25"),
        _pick(1, 2, "p50"),
        _pick(3, 4, "p75"),
    )


def conversation_profile(transcripts: DataFrame) -> DataFrame:
    """Per-conversation structural profile of the north-rule transcript
    shape (conv_id, turn_idx, role, text, tool, ts) — the corpus-health
    view a trillion-turn ingest needs before extraction: turn counts per
    role, tool-call density, text volume, role-alternation rate (a
    mangled thread interleaves wrongly — the transcript analog of the
    reference's out-of-order-child tolerance, lib/feedparser.js:440-458),
    and the conversation's wall-clock span.

    Per conv_id:
      n_turns        — rows
      n_user / n_assistant / n_tool_role — role counts (other roles land
                       in none of the three; n_turns still counts them)
      n_tool_calls   — turns with a non-null tool
      total_chars    — sum of text lengths (NULL text counts 0)
      role_switches  — turns whose role differs from the previous turn in
                       (turn_idx) order
      span_seconds   — max(ts) - min(ts) in whole seconds

    Scale shape: one shuffle on conv_id; the lag window and the final agg
    share that partitioning, and every group is conversation-sized (the
    mega-thread salting upstream bounds that).  All counters are exact
    integers — nothing here is float, so the DuckDB oracle matches
    bit-for-bit with no rounding discipline needed.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        F.coalesce(F.length("text"), F.lit(0)).cast("long").alias("chars"),
        F.lag("role").over(w).alias("prev_role"),
    )
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("long")
        .alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .cast("long")
        .alias("n_assistant"),
        F.sum(F.when(F.col("role") == "tool", 1).otherwise(0))
        .cast("long")
        .alias("n_tool_role"),
        F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_tool_calls"),
        F.sum("chars").cast("long").alias("total_chars"),
        F.sum(
            F.when(
                F.col("prev_role").isNotNull()
                & (F.col("role") != F.col("prev_role")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("role_switches"),
        # integer micros end-to-end (ANSI forbids NTZ->long; DIV keeps the
        # span exact in both engines)
        (
            (
                F.max(F.unix_micros(F.col("ts").cast("timestamp")))
                - F.min(F.unix_micros(F.col("ts").cast("timestamp")))
            )
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("span_seconds"),
    )
