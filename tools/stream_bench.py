"""Structured Streaming throughput benchmark.

The streaming operators (OP-LLM-05 family) are value-oracled for
correctness, but BASELINE.md carried no sustained-throughput number
for them. This tool measures rows/sec through two representative
micro-batch pipelines fed by the built-in ``rate`` source:

  window_agg   event-time tumbling window (5 s) count/sum by key with
               a 10 s watermark — the op_llm_05_tumbling_window shape.
  dedup_state  watermarked ``dropDuplicates`` on a synthetic id — the
               stateful exactly-once ingest shape (state store on the
               hot path).

For each workload and each requested generation rate it runs
``--duration`` seconds into a ``noop`` sink, then reads the query's
``recentProgress``: the reported number is the MEDIAN
``processedRowsPerSecond`` over completed non-warmup batches, plus
whether the pipeline kept up (processed ≥ 95% of the input rate —
the rate source grows batches unboundedly when processing falls
behind, so sustained != requested exposes the ceiling honestly).

Prints one JSON line for BASELINE.md.

Usage::

    python tools/stream_bench.py --rates 1000000,5000000,20000000
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

from pyspark.sql import functions as F


def host_load() -> float:
    return os.getloadavg()[0]


def make_stream(spark, rows_per_sec: int, partitions: int):
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", partitions)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 5).cast("string").alias("event_type"),
            (F.col("value") % 997).cast("double").alias("value"),
            F.col("value").alias("event_id"),
        )
    )


def window_agg(stream):
    return (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "5 seconds"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )


def dedup_state(stream):
    # Planted 1% duplicate rate: ids repeat every 100 values.
    return (
        stream.withColumn("dup_id", F.col("event_id") % 100)
        .withWatermark("ts", "10 seconds")
        .dropDuplicates(["dup_id", "ts"])
    )


def run_once(spark, build, rows_per_sec: int, duration: float, partitions: int):
    q = (
        build(make_stream(spark, rows_per_sec, partitions))
        .writeStream.format("noop")
        .option("checkpointLocation", f"/tmp/stream_bench_ckpt_{time.time_ns()}")
        .outputMode("update")
        .start()
    )
    try:
        time.sleep(duration)
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
        q.awaitTermination(30)
    # Drop warmup: first 2 batches pay source/codegen/state init.
    rows = [
        (
            p.get("processedRowsPerSecond") or 0.0,
            p.get("inputRowsPerSecond") or 0.0,
            p.get("numInputRows") or 0,
            (p.get("durationMs") or {}).get("triggerExecution"),
        )
        for p in progress
        if p.get("numInputRows")
    ][2:]
    if not rows:
        return None
    processed = [r[0] for r in rows]
    total_rows = sum(r[2] for r in rows)
    trig = [r[3] for r in rows if r[3] is not None]
    med = statistics.median(processed)
    return {
        "requested_rows_per_sec": rows_per_sec,
        "batches": len(rows),
        "rows_processed": total_rows,
        "median_processed_rows_per_sec": round(med, 1),
        "max_processed_rows_per_sec": round(max(processed), 1),
        "median_batch_ms": (
            round(statistics.median(trig), 1) if trig else None
        ),
        "kept_up": med >= 0.95 * rows_per_sec,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--rates", default="1000000,5000000,20000000",
        help="comma-separated requested rows/sec",
    )
    ap.add_argument("--duration", type=float, default=25.0)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--shuffle-partitions", type=int, default=16)
    ap.add_argument(
        "--state-provider",
        choices=["hdfs", "rocksdb"],
        default="hdfs",
        help="state store provider for the stateful workload "
        "(rocksdb = spark's in-box RocksDBStateStoreProvider)",
    )
    ap.add_argument(
        "--workloads", default="window_agg,dedup_state",
        help="comma-separated subset of {window_agg,dedup_state}",
    )
    args = ap.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from gexp_ml_dask_spark.session import get_spark

    load_before = host_load()
    spark = get_spark(
        app_name="stream_bench",
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.state_provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )

    wanted = set(args.workloads.split(","))
    out: dict[str, list] = {}
    for name, build in (("window_agg", window_agg), ("dedup_state", dedup_state)):
        if name not in wanted:
            continue
        out[name] = []
        for rate in (int(r) for r in args.rates.split(",")):
            res = run_once(
                spark, build, rate, args.duration, args.partitions
            )
            if res:
                out[name].append(res)
                print(
                    f"# {name} @ {rate:,}/s -> "
                    f"{res['median_processed_rows_per_sec']:,.0f}/s "
                    f"kept_up={res['kept_up']}",
                    file=sys.stderr,
                )
    print(
        json.dumps(
            {
                "metric": "stream_throughput",
                "duration_s": args.duration,
                "partitions": args.partitions,
                "state_provider": args.state_provider,
                "workloads": out,
                "loadavg_before": round(load_before, 2),
                "loadavg_after": round(host_load(), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
