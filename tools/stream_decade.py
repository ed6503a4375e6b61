#!/usr/bin/env python
"""Streaming decade sweep — drive the REAL streaming layer against a
derived decade fixture (sf1/sf10) with value verification, the way
round 6's sf1 sweep caught the silent directory-layout 0-rows bug
(VERDICT r6 item 1: streaming-only code paths hide bugs the batch
sweeps can't see).

The small-SF equivalents live in tests/test_streaming.py
(test_multibatch_tumbling_complete_equals_batch,
test_restart_from_checkpoint_exactly_once,
test_multibatch_sessions_match_watermark_predicate); this tool is the
same three contracts at fixture scale, digest-compared instead of
collected, plus an optional executor-kill chaos pass:

  multibatch_tumbling   complete-mode tumbling aggregation over K
                        chronological micro-batches == the batch twin
                        (full digest equality).
  restart_tumbling      append-mode tumbling -> parquet sink with a
                        checkpoint, STOPPED mid-stream and restarted
                        with the remaining chunks: exactly-once input
                        consumption, no double emission, final sink ==
                        batch twin under the watermark predicate.
                        With --kill: one executor is SIGKILLed during
                        the second phase (master local-cluster) — the
                        append-mode kill chaos run.
  multibatch_sessions   append-mode session windows over K batches:
                        every session emitted exactly once, emitted
                        set == batch sessions with end <= the final
                        ms-truncated watermark.

Chunks are chronological (sorted by ts, lexicographic names) so
maxFilesPerTrigger=1 advances the watermark between batches exactly
as production arrival order would.

Usage::

    python tools/stream_decade.py --sf-dir /root/repo/.scratch/sf10
    python tools/stream_decade.py --sf-dir /root/repo/.scratch/sf10 \
        --kill   # local-cluster + SIGKILL during the restart phase

Prints one JSON line per check plus a summary; exit 1 on failure.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Above this row count the arrow chunker's 2x in-memory
# materialization stops being reasonable and the Spark path takes
# over (sf10 = 10M rows is fine at ~2 GB peak; sf100 = 100M is not).
ARROW_CHUNK_MAX_ROWS = 20_000_000


def _chunk_events(
    sf_dir: str, out_dir: str, k: int, spark=None, chunker: str = "auto"
) -> int:
    """Split the fixture's events table into ``k`` chronological
    parquet chunks (handles both physical layouts: the driver's
    single file and the decade tooling's directory of parts).

    Two implementations behind one contract (chronological files in
    lexicographic name order):

    * ``arrow`` — pyarrow read + sorted take; materializes the table
      twice, fine through sf10 (10M events, ~2 GB peak);
    * ``spark`` — range-partition by ``ts`` into ``k`` ranges, sort
      within partitions, write once, rename the (range-ordered)
      part files to chunk names. Never holds the table in one
      process; this is the decade path for sf100 (100M events).

    ``auto`` picks by row count (parquet footer metadata only).
    """
    import pyarrow.dataset as ds

    src = f"{sf_dir}/events.parquet"
    n = ds.dataset(src, format="parquet").count_rows()
    if chunker == "auto":
        chunker = (
            "spark"
            if spark is not None and n > ARROW_CHUNK_MAX_ROWS
            else "arrow"
        )
    if chunker == "spark":
        from pyspark.sql import functions as F  # noqa: F401

        tmp = out_dir + ".spark"
        (
            spark.read.parquet(src)
            .repartitionByRange(k, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # part-NNNNN order == range order under repartitionByRange,
        # so renaming in name order preserves chronology — in NAME.
        # But rename (same-fs shutil.move) PRESERVES the source
        # mtime, which is task-COMPLETION order, and Spark's file
        # stream source orders new files by modification time, not
        # name: without restamping, chunk-003 written by a fast task
        # arrives before chunk-000 and the watermark silently drops
        # the "late" earlier chunks (the sf100 sessions check emitted
        # 61M of ~97M sessions exactly this way; complete-mode checks
        # are arrival-order-insensitive and masked it). Stamp
        # strictly increasing mtimes in chunk order so arrival ==
        # chronology, deterministically.
        parts = sorted(glob.glob(f"{tmp}/part-*.parquet"))
        base = time.time()
        for i, p in enumerate(parts):
            dst = f"{out_dir}/chunk-{i:03d}.parquet"
            shutil.move(p, dst)
            os.utime(dst, (base + i, base + i))
        shutil.rmtree(tmp, ignore_errors=True)
        return n

    import pyarrow.compute as pc

    table = ds.dataset(src, format="parquet").to_table()
    order = pc.sort_indices(table, sort_keys=[("ts", "ascending")])
    table = table.take(order)
    import pyarrow.parquet as pq

    base = time.time()
    for i in range(k):
        lo, hi = i * n // k, (i + 1) * n // k
        dst = f"{out_dir}/chunk-{i:03d}.parquet"
        pq.write_table(table.slice(lo, hi - lo), dst)
        # same arrival-order contract as the spark chunker: the file
        # stream orders by mtime, so stamp chunk order explicitly
        # rather than relying on sequential-write timestamps
        os.utime(dst, (base + i, base + i))
    return n


def _drain(q) -> int:
    try:
        q.processAllAvailable()
        return sum(p["numInputRows"] for p in q.recentProgress)
    finally:
        q.stop()


def _kill_one_executor(spark) -> int | None:
    """SIGKILL one CoarseGrainedExecutorBackend of this app (only
    meaningful under a local-cluster master)."""
    pids = subprocess.run(
        [
            "pgrep",
            "-f",
            "CoarseGrainedExecutorBackend.*"
            + spark.sparkContext.applicationId,
        ],
        capture_output=True,
        text=True,
    ).stdout.split()
    if not pids:
        return None
    os.kill(int(pids[0]), signal.SIGKILL)
    return int(pids[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument(
        "--chunker",
        choices=("auto", "arrow", "spark"),
        default="auto",
        help="chunk builder: arrow (in-memory, <=sf10), spark "
        "(range-partitioned sort, the decade path), auto by rows",
    )
    ap.add_argument(
        "--kill",
        action="store_true",
        help="local-cluster master + SIGKILL an executor during the "
        "restart phase (the append-mode kill chaos run)",
    )
    ap.add_argument(
        "--checks",
        default="multibatch_tumbling,restart_tumbling,multibatch_sessions",
        help="comma list",
    )
    args = ap.parse_args()
    checks = args.checks.split(",")

    from pyspark.sql import functions as F

    from oracle_sweep import _spark_digest

    from gexp_ml_dask_spark.session import get_spark
    from gexp_ml_dask_spark.sources.readers import load_events
    from gexp_ml_dask_spark.streaming import (
        streaming_session_counts,
        streaming_tumbling_counts,
        tumbling_window_counts,
    )

    # recentProgress retention must cover every micro-batch (plus
    # zero-row flush batches) or the exactly-once row accounting
    # undercounts on high --chunks runs; default retention is 100.
    extra = {
        "spark.sql.streaming.numRecentProgressUpdates": str(
            4 * args.chunks + 100
        )
    }
    master = None
    if args.kill:
        # Executor death needs real executor processes; the worker
        # JVMs get the master-string allowance (MB).
        master = "local-cluster[2,4,4096]"
        extra["spark.executor.memory"] = "3g"
    spark = get_spark(
        app_name="stream_decade", master=master, extra_configs=extra
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{args.sf_dir}/events.parquet").schema

    work = tempfile.mkdtemp(prefix="stream_decade_")
    chunk_dir = f"{work}/chunks"
    os.makedirs(chunk_dir)
    n_events = _chunk_events(
        args.sf_dir, chunk_dir, args.chunks, spark=spark, chunker=args.chunker
    )

    events = load_events(spark, args.sf_dir)
    max_us = events.select(
        F.max(F.unix_micros(F.col("ts"))).alias("m")
    ).collect()[0]["m"]
    wm_us = (max_us // 1000 - 30 * 60 * 1000) * 1000

    out: dict[str, dict] = {}
    failures = 0

    def record(name: str, rec: dict) -> None:
        nonlocal failures
        out[name] = rec
        if not rec.get("ok"):
            failures += 1
        print(json.dumps({name: rec}), flush=True)

    if "multibatch_tumbling" in checks:
        t0 = time.time()
        agg = streaming_tumbling_counts(
            spark, chunk_dir, raw_schema, max_files_per_trigger=1
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("sd_mb_tumbling")
            .start()
        )
        try:
            q.processAllAvailable()
            n_batches = len(
                [p for p in q.recentProgress if p["numInputRows"] > 0]
            )
        finally:
            q.stop()
        online = _spark_digest(spark.table("sd_mb_tumbling"))
        batch = _spark_digest(tumbling_window_counts(events))
        record(
            "multibatch_tumbling",
            {
                "ok": n_batches >= args.chunks and online == batch,
                "n_batches": n_batches,
                "rows": online["__n"],
                "digest_match": online == batch,
                "wall_s": round(time.time() - t0, 1),
            },
        )
        spark.catalog.clearCache()

    if "restart_tumbling" in checks:
        t0 = time.time()
        chunks = sorted(glob.glob(f"{chunk_dir}/chunk-*.parquet"))
        src = f"{work}/restart_src"
        os.makedirs(src)
        sink, chk = f"{work}/restart_out", f"{work}/restart_chk"
        half = len(chunks) // 2

        def run_phase(kill: bool) -> tuple[int, int | None]:
            agg = streaming_tumbling_counts(
                spark, src, raw_schema, max_files_per_trigger=1
            )
            q = (
                agg.writeStream.outputMode("append")
                .format("parquet")
                .option("path", sink)
                .option("checkpointLocation", chk)
                .start()
            )
            killed = None
            if kill:
                deadline = time.time() + 60
                while time.time() < deadline and not q.recentProgress:
                    time.sleep(0.2)
                killed = _kill_one_executor(spark)
                time.sleep(4.0)  # survive the death + replacement
            return _drain(q), killed

        for c in chunks[:half]:
            shutil.copy(c, src)
        rows1, _ = run_phase(kill=False)
        for c in chunks[half:]:
            shutil.copy(c, src)
        rows2, killed_pid = run_phase(kill=args.kill)

        emitted = spark.read.parquet(sink)
        n_rows = emitted.count()
        n_keys = emitted.select("window_start", "event_type").distinct().count()
        closed = tumbling_window_counts(events).filter(
            (F.col("window_start") + 600) * 1000000 <= F.lit(wm_us)
        )
        got, want = _spark_digest(emitted), _spark_digest(closed)
        vacuous = bool(args.kill and killed_pid is None)
        record(
            "restart_tumbling",
            {
                "ok": (
                    rows1 + rows2 == n_events
                    and rows1 > 0
                    and rows2 > 0
                    and n_rows == n_keys
                    and got == want
                    and not vacuous
                ),
                "rows_phase1": rows1,
                "rows_phase2": rows2,
                "n_events": n_events,
                "exactly_once": rows1 + rows2 == n_events,
                "no_double_emission": n_rows == n_keys,
                "digest_match": got == want,
                "emitted_rows": n_rows,
                "killed_pid": killed_pid,
                "kill_vacuous": vacuous,
                "wall_s": round(time.time() - t0, 1),
            },
        )
        spark.catalog.clearCache()

    if "multibatch_sessions" in checks:
        t0 = time.time()
        agg = streaming_session_counts(
            spark, chunk_dir, raw_schema, max_files_per_trigger=1
        )
        # Parquet sink, NOT memory: the emitted-session table is
        # data-scaled (sf100 = ~99M sessions), and the memory sink
        # serializes every sink row to the driver — the sf100 run
        # died on spark.driver.maxResultSize before this switch. The
        # digest compare below is fully distributed either way.
        sess_sink = f"{work}/sessions_out"
        sess_chk = f"{work}/sessions_chk"
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sess_sink)
            .option("checkpointLocation", sess_chk)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        emitted = spark.read.parquet(sess_sink)
        n_rows = emitted.count()
        n_keys = emitted.select(
            "user_id", "session_start", "session_end"
        ).distinct().count()
        closed = (
            events.groupBy(
                F.session_window(F.col("ts"), "5 minutes").alias("w"),
                "user_id",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 6).alias("total"),
            )
            .select(
                "user_id",
                F.col("w.start").cast("long").alias("session_start"),
                F.col("w.end").cast("long").alias("session_end"),
                F.unix_micros(F.col("w.end")).alias("end_us"),
                "n_events",
                "total",
            )
            .filter(F.col("end_us") <= F.lit(wm_us))
            .drop("end_us")
        )
        got, want = _spark_digest(emitted), _spark_digest(closed)
        record(
            "multibatch_sessions",
            {
                "ok": n_rows == n_keys and got == want,
                "no_double_emission": n_rows == n_keys,
                "digest_match": got == want,
                "emitted_rows": n_rows,
                "wall_s": round(time.time() - t0, 1),
            },
        )

    print(
        json.dumps(
            {
                "summary": {
                    "sf_dir": args.sf_dir,
                    "chunks": args.chunks,
                    "kill": bool(args.kill),
                    "n_events": n_events,
                    "checked": len(out),
                    "failed": failures,
                }
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
