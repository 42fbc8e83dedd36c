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
