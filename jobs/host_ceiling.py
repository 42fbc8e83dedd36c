"""Host scaling-ceiling calibration for the N-vs-4N protocol.

The 8->32-core pair on this single-JVM, single-memory-domain microVM
cannot distinguish "the pipeline scales poorly" from "the host stops
scaling": a real 4N-executor cluster multiplies cores AND memory
bandwidth AND GC capacity, while this host multiplies only task slots.
This job measures what EMBARRASSINGLY-PARALLEL work achieves on the same
bound cpusets, giving the ceiling against which the pipeline's measured
efficiency should be read:

- compute: xxhash64 over a generated range, bit_xor-reduced — pure
  whole-stage-codegen arithmetic, near-zero memory traffic, no shuffle
  rows, no Python.  Anything below 1.0 here is host saturation (SMT,
  turbo, scheduler), not algorithm.
- scan: parquet scan + hash aggregation over the scaling corpus —
  decompression + memory-bandwidth bound, the profile of the pipeline's
  scan/write phases.

Usage: python jobs/host_ceiling.py [--out BENCH/host_ceiling.json]
Writes/prints one JSON with efficiency per workload for the same bound
8->32 pair the pipeline bench uses.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import json, sys, time
from pyspark.sql import SparkSession, functions as F

mode, n = sys.argv[1], int(sys.argv[2])
corpus = sys.argv[3] if len(sys.argv) > 3 else None
spark = SparkSession.builder.getOrCreate()

# warm-JIT protocol (late r3, same rationale as bench_scaling): run the
# SAME workload once at ~1/10 size untimed before timing.  The probe
# walls are short (tens of seconds), so cold-JVM compile time is a large
# constant on the fast leg and the cold probe UNDERSTATES the ceiling --
# the r3-warm pipeline pair measured 0.660 against a cold 'ceiling' of
# 0.551, which is how this confound was caught.
def compute(m):
    return (
        spark.range(0, m, 1, spark.sparkContext.defaultParallelism * 4)
        .select(F.xxhash64("id").alias("h"))
        .agg(F.expr("bit_xor(h)"))
        .collect()
    )

def scan(unions):
    df = spark.read.parquet(corpus)
    for _ in range(unions):
        df = df.unionAll(spark.read.parquet(corpus))
    return df.agg(
        F.count(F.lit(1)), F.expr("bit_xor(xxhash64(conv_id, turn_idx, text))")
    ).collect()

def write(m, tag):
    # triple-shaped rows, no shuffle: measures pure parquet encode +
    # tmpfs write scalability.  mode 'write_wide' adds the full width of
    # the pipeline's triples table (entity-id longs, a low-cardinality
    # 64-hex lineage string, snap/bucket) so the probe's memory traffic
    # per row matches the real write phase, not a slimmed-down ideal.
    df = (
        spark.range(0, m, 1, spark.sparkContext.defaultParallelism * 4)
        .select(
            F.concat(F.lit("conv-"), (F.col("id") % 100000)).alias("conv_id"),
            (F.col("id") % 997).cast("int").alias("turn_idx"),
            F.concat(F.lit("ent-"), F.xxhash64("id")).alias("subj"),
            F.lit("mentions").alias("pred"),
            F.concat(F.lit("ent-"), F.xxhash64("id", F.lit(1))).alias("obj"),
            ((F.col("id") % 11) / 11.0 / 2 + 0.5).alias("score"),
        )
    )
    if mode == "write_wide":
        df = (
            df.withColumn("subj_id", F.xxhash64("subj"))
            .withColumn("obj_id", F.xxhash64("obj"))
            .withColumn(
                "lineage",
                F.sha2((F.col("turn_idx") % 32).cast("string"), 256),
            )
            .withColumn("snap", F.lit("snap-0123456789abcdef"))
            .withColumn("bucket", (F.col("turn_idx") % 32))
        )
    df.write.mode("overwrite").parquet("/dev/shm/host_ceiling_write_" + tag)

if mode == "compute":
    compute(max(n // 10, 1))  # untimed JIT warm
    t0 = time.monotonic()
    out = compute(n)
elif mode in ("write", "write_wide"):
    write(max(n // 10, 1), "warm")  # untimed JIT warm
    t0 = time.monotonic()
    out = write(n, "timed")
else:
    scan(0)  # untimed JIT warm: one corpus pass
    t0 = time.monotonic()
    out = scan(4)  # long enough that fixed stage overhead amortizes
print(json.dumps({"wall_s": round(time.monotonic() - t0, 3)}))
"""


def run(cores: int, mode: str, n: int, corpus: str | None) -> float:
    script = os.path.join("/tmp", "host_ceiling_driver.py")
    with open(script, "w") as f:
        f.write(DRIVER)
    cmd = ["taskset", "-c", f"0-{cores - 1}", "spark-submit", "--master",
           f"local[{cores}]", "--driver-memory", "16g", script, mode, str(n)]
    if corpus:
        cmd.append(corpus)
    env = dict(os.environ)
    env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark_local")
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800, env=env)
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)["wall_s"]
    raise RuntimeError(proc.stdout[-1000:] + proc.stderr[-1000:])


def best(trials: int, *args) -> float:
    return min(run(*args) for _ in range(trials))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--n", type=int, default=100_000_000_000)
    ap.add_argument("--n-write", type=int, default=100_000_000,
                    help="rows for the parquet-write ceiling probe")
    ap.add_argument("--corpus", default="/dev/shm/bench_scaling/corpus")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "host_ceiling.json"))
    args = ap.parse_args()

    report = {"low_cores": args.low, "high_cores": args.high,
              "trials": args.trials, "workloads": {}}
    ratio = args.high / args.low
    for mode, n, corpus in (
        ("compute", args.n, None),
        ("write", args.n_write, None),
        ("write_wide", args.n_write, None),
        ("scan", 0, args.corpus if os.path.isdir(args.corpus) else None),
    ):
        if mode == "scan" and corpus is None:
            continue
        lo = best(args.trials, args.low, mode, n, corpus)
        hi = best(args.trials, args.high, mode, n, corpus)
        report["workloads"][mode] = {
            "low_wall_s": lo,
            "high_wall_s": hi,
            "efficiency": round((lo / hi) / ratio, 3),
        }
    import shutil

    for tag in ("warm", "timed"):
        shutil.rmtree(f"/dev/shm/host_ceiling_write_{tag}", ignore_errors=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
