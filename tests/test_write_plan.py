"""Plan-shape gates for the triples write frame (plans/pipeline.py
triples_write_frame): the two properties that decide write-phase cost at
cluster scale.

1. The per-row-constant columns (lineage struct, snap literal) are
   computed ABOVE the co-locating exchange — shuffling them would roughly
   double exchange bytes (measured: 2->8 scaling efficiency 0.640 ->
   0.716-0.770 after moving them, BENCH/scaling_2_8_r3_slimshuffle.json).
2. The sub-split salt is decorrelated from the bucket hash — a salt of
   xxhash64(conv_id) % sub is FULLY determined by the bucket whenever sub
   divides n_buckets, silently collapsing every bucket into one write
   task (found live: every bench config had sub | n_buckets).
"""

from pyspark.sql import functions as F

from node_feedparser_spark.plans.pipeline import triples_write_frame

SNAP = "snap-0123456789abcdef"


def _triples(spark, n_convs=200, n_buckets=4):
    return (
        spark.range(0, n_convs * 5, 1, 4)
        .select(
            F.concat(F.lit("conv-"), F.col("id") % n_convs).alias("conv_id"),
            (F.col("id") % 7).cast("int").alias("turn_idx"),
            F.concat(F.lit("s"), F.col("id") % 50).alias("subj"),
            F.lit("mentions").alias("pred"),
            F.concat(F.lit("o"), F.col("id") % 30).alias("obj"),
            F.lit(0.5).alias("score"),
            F.xxhash64(F.col("id") % 50).alias("subj_id"),
            F.xxhash64(F.col("id") % 30).alias("obj_id"),
            # lateral alias: conv_id here is the REAL string built above,
            # so the bucket-salt correlation the frame must avoid is
            # faithfully present in the fixture
            F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
            .cast("int")
            .alias("bucket"),
        )
    )


def test_constants_attach_above_the_exchange(spark):
    frame = triples_write_frame(_triples(spark), SNAP, 4, 4)
    plan = frame._jdf.queryExecution().optimizedPlan().toString()
    # tree prints parents first: the Project computing lineage must sit
    # ABOVE (= print before) the repartition node
    i_lineage = plan.index("partition_hash")
    i_exchange = plan.index("RepartitionByExpression")
    assert i_lineage < i_exchange, plan
    # and the repartition itself must not carry lineage/snap in its output
    repart_tail = plan[i_exchange:]
    assert "partition_hash" not in repart_tail, plan


def test_salt_subsplits_each_bucket(spark):
    # n_buckets=4, par=4 -> sub=4, which DIVIDES n_buckets: the correlated
    # salt (xxhash64(conv_id) % sub) would put every bucket in exactly one
    # task.  With 200 convs (~50 per bucket) a decorrelated salt leaves a
    # single-task bucket with probability ~4 * 0.25^50 — impossible.
    frame = triples_write_frame(_triples(spark), SNAP, 4, 4)
    spread = (
        frame.withColumn("pid", F.spark_partition_id())
        .groupBy("bucket")
        .agg(F.count_distinct("pid").alias("n_tasks"))
        .collect()
    )
    assert len(spread) == 4
    for row in spread:
        assert row["n_tasks"] > 1, spread


def test_frame_schema_is_the_table_contract(spark):
    frame = triples_write_frame(_triples(spark), SNAP, 4, 4)
    assert frame.columns == [
        "conv_id", "turn_idx", "subj", "pred", "obj", "score",
        "subj_id", "obj_id", "lineage", "bucket", "snap",
    ]
    row = frame.limit(1).collect()[0]
    assert row["snap"] == SNAP
    assert row["lineage"]["snapshot_id"] == SNAP
    assert len(row["lineage"]["partition_hash"]) == 40


# --- round-3 exchange fusion (fuse_write_partitioning +
# triples_clustered_frame + the prefixed dedupe window): one corpus shuffle
# serves both the first-wins dedupe and the bucketed write.

from node_feedparser_spark.operators.extract import dedupe_first_wins
from node_feedparser_spark.plans.pipeline import (
    fuse_write_partitioning,
    triples_clustered_frame,
    write_sub,
)


def _turns(spark, n_convs=60, n_buckets=4):
    df = spark.range(0, n_convs * 8, 1, 4).select(
        F.concat(F.lit("conv-"), F.col("id") % n_convs).alias("conv_id"),
        # %5 over 8 rows/conv: repeated (conv_id, turn_idx) keys so the
        # dedupe window has real duplicates to drop
        (F.col("id") % 5).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.col("id") % 3).cast("timestamp").alias("ts"),
    )
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


def test_fused_dedupe_has_single_exchange(spark):
    """The prefixed window must ELIDE its exchange: the whole
    dedupe-after-fuse plan carries exactly the one (bucket, wsalt)
    repartition — a second hashpartitioning(conv_id, turn_idx) exchange
    would mean the fusion silently regressed to two corpus shuffles."""
    fused = dedupe_first_wins(
        fuse_write_partitioning(_turns(spark), 4, 2),
        partition_prefix=("bucket", "wsalt"),
    )
    p = fused._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1, p
    assert "hashpartitioning(bucket" in p, p


def test_prefixed_dedupe_equals_unprefixed(spark):
    """bucket and wsalt are pure functions of (conv_id, turn_idx), so the
    prefixed window's groups — and therefore its survivors — are identical
    to the plain (conv_id, turn_idx) window's."""
    turns = _turns(spark)
    plain = dedupe_first_wins(turns).select(
        "conv_id", "turn_idx", "text"
    )
    fused = dedupe_first_wins(
        fuse_write_partitioning(turns, 4, 2),
        partition_prefix=("bucket", "wsalt"),
    ).select("conv_id", "turn_idx", "text")
    assert plain.exceptAll(fused).count() == 0
    assert fused.exceptAll(plain).count() == 0


def test_clustered_frame_adds_no_exchange(spark):
    """triples_clustered_frame must not repartition: the whole point is
    that the write consumes the fused clustering as-is."""
    frame = triples_clustered_frame(_triples(spark), SNAP, 4)
    p = frame._jdf.queryExecution().optimizedPlan().toString()
    assert "Repartition" not in p, p
    assert frame.columns == [
        "conv_id", "turn_idx", "subj", "pred", "obj", "score",
        "subj_id", "obj_id", "lineage", "bucket", "snap",
    ]


def test_fused_clustering_bounds_files_per_bucket(spark):
    """Physically: after fuse_write_partitioning, every bucket's rows live
    in at most `sub` partitions (that bound — not task count — is what caps
    files per bucket when the write skips its repartition), and a
    conversation's rows spread across salts (mega-thread write skew is
    strictly better than the old one-task-per-conversation salt)."""
    n_buckets, sub = 4, 2
    assert write_sub(n_buckets, 2) == sub
    fused = fuse_write_partitioning(_turns(spark), n_buckets, sub)
    spread = (
        fused.withColumn("pid", F.spark_partition_id())
        .groupBy("bucket")
        .agg(F.count_distinct("pid").alias("n_tasks"))
        .collect()
    )
    assert len(spread) == n_buckets
    for row in spread:
        assert row["n_tasks"] <= sub, spread
