"""Fixed output schemas — the analog of the reference's index.d.ts contract.

The reference pre-declares every normalized field and pre-initializes it so
consumers never see undefined (lib/feedparser.js:494-501, index.d.ts:50-99);
same discipline here: fixed StructTypes, explicit nullability, no schema
inference anywhere.  Shapes per FIXTURES.md §2.
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Raw extraction output (before entity-ID assignment).  pred='__error__'
# rows are the error side channel (reference parser.errors array,
# lib/feedparser.js:125,140-154): they are routed to metrics, never thrown.
TRIPLES_RAW = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("subj", T.StringType(), True),
        T.StructField("pred", T.StringType(), True),
        T.StructField("obj", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("partition_hash", T.StringType(), True),
        T.StructField("snapshot_id", T.StringType(), True),
    ]
)

TRIPLES = T.StructType(
    list(TRIPLES_RAW.fields)
    + [
        T.StructField("subj_id", T.LongType(), True),
        T.StructField("obj_id", T.LongType(), True),
        T.StructField("lineage", LINEAGE, True),
    ]
)

VERTICES = T.StructType(
    [
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("canonical_name", T.StringType(), True),
        T.StructField("aliases", T.ArrayType(T.StringType()), True),
        T.StructField("n_mentions", T.LongType(), True),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("src_id", T.LongType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("dst_id", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), True),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_hash", T.StringType(), False),
        T.StructField("snapshot_id", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("n_triples", T.LongType(), True),
        T.StructField("n_errors", T.LongType(), True),
        T.StructField(
            "link_score_hist",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("bucket", T.DoubleType(), True),
                        T.StructField("count", T.LongType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)
