"""Task-retry / executor-loss chaos harness.

At 100 TB task failures are routine (spot kills, OOM evictions, disk
faults), so every operator must be RETRY-SAFE: a task that fails and
is re-attempted — or a whole executor that dies, taking its shuffle
files with it — must not change the result. That holds only if every
row's fate is a pure function of its data (the repo's hash-derived
randomness contract, SCALING.md §3); anything leaning on
``rand()``/partition-local state silently corrupts under retry. The
reference never had to prove this (single-process Dask harnesses,
``singlemachine_dataset_samplewise_benchmark.py`` — a worker death
there kills the run); on Spark it is a testable property.

Two modes, each needing its own master (so: subprocess-per-mode,
see tests/test_resilience.py):

``--mode retry`` (default) — ``local[8,4]`` (4 task attempts).
    Every battery operator runs three times: clean, with injected
    first-attempt task failures on the INPUT scan stage, and with
    the injection appended to the OUTPUT (so the retried task must
    re-fetch shuffle blocks and recompute the operator's final
    stage). All three results must hash identically, and marker
    files prove the failures actually fired.

``--mode speculate`` — ``local-cluster[2,4,2048]`` with
    ``spark.speculation=true``. An injected straggler (partition 0's
    first attempt sleeps) invites the scheduler to race a duplicate
    attempt; compute results AND parquet sink output must be
    identical no matter which attempt wins (the
    OutputCommitCoordinator admits exactly one sink commit); attempt
    markers detect whether a duplicate actually launched.

    Measured limitation, single machine: NO duplicate ever launches
    here — ``local[N]`` never starts the speculation thread at all
    (non-local masters only), and under local-cluster every executor
    shares this host while the scheduler refuses to place a
    speculative copy on a host that already has a running attempt
    (probed with an 8 s straggler, 50 ms interval, quantile 0.25,
    efficiency heuristic both on and off: 0 duplicates, job waits
    out the sleep). So on one box this mode can only pin the
    correctness half (results identical, exit 2 = vacuous); the
    semantics speculation relies on — deterministic recomputation +
    single-commit sinks — are exactly what ``--mode retry`` proves.
    On a real multi-host cluster the same invocation is the full
    test (exit 0 with ``speculated_tasks > 0``).

``--mode stream-kill`` — ``local-cluster[2,4,2048]``, Structured
    Streaming. SIGKILL one executor while a rate-source complete-mode
    aggregation is running; its partitions reschedule on the survivor
    and reload their state stores from the checkpoint. Invariant:
    with keys = value % 100, every key's final count is exactly
    derivable from the total — lost or double-counted state breaks it.

``--mode stream-kill-append`` — same topology, but APPEND-mode
    session windows over synthetic (value-derived) event time: rows
    sit in the session store until the checkpointed watermark closes
    them, then emit exactly once. Executor death while sessions are
    open exercises the watermark/state interplay complete mode
    can't; every emitted session must carry its block's exact count,
    start, and per-key multiplicity.

``--mode kill`` — ``local-cluster[2,4,2048]`` (2 worker JVMs).
    SIGKILL one CoarseGrainedExecutorBackend mid-query (pid matched
    on THIS app's id, scheduled at ~30% of the measured clean wall).
    The dead executor's shuffle files vanish -> FetchFailed -> stage
    resubmission; the standalone worker relaunches a replacement.
    The query must finish with a bit-identical result, and the tool
    asserts the kill landed inside the job's wall span (else exit 2:
    vacuous, enlarge the workload).

Prints one JSON line; exit 0 = all invariants held.

Usage::

    python tools/retry_chaos.py                 # retry battery, sf0.001
    python tools/retry_chaos.py --mode kill     # executor-loss run, sf0.1
    python tools/retry_chaos.py --sf sf0.01 --inject-mod 2
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def flaky(df, tag: str, marker_dir: str, mod: int = 3):
    """Identity pass-through that fails every (partition % mod == 0)
    task on its FIRST attempt. Arrow-batched identity keeps schemas
    intact; a marker file per injected failure proves the chaos
    actually fired (a green run with zero markers is vacuous)."""
    schema = df.schema

    def gen(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc.partitionId() % mod == 0 and tc.attemptNumber() == 0:
            open(
                os.path.join(
                    marker_dir,
                    f"{tag}-s{tc.stageId()}-p{tc.partitionId()}",
                ),
                "w",
            ).close()
            raise RuntimeError(
                f"chaos: injected failure [{tag}] partition "
                f"{tc.partitionId()} attempt 0"
            )
        yield from batches

    return df.mapInPandas(gen, schema)


def df_hash(df) -> tuple[int, str]:
    """Order/layout-independent content hash (the oracle-sweep
    normalization: sort columns by name, then rows)."""
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(by=cols, na_position="last").reset_index(
        drop=True
    )
    return len(pdf), hashlib.md5(
        pdf.to_csv(index=False, float_format="%.12g").encode()
    ).hexdigest()


def battery(spark, sf_dir: str):
    """(name, builder) pairs covering the retry-sensitive shapes:
    shuffle agg, seeded-hash membership, windowed shuffle, banded
    multi-stage LSH, boundary-literal global rank, dedup window."""
    from pyspark.sql import functions as F

    from gexp_ml_dask_spark.llm.dedup import exact_dedup, minhash_lsh_pairs
    from gexp_ml_dask_spark.llm.mixture import epoch_shuffle
    from gexp_ml_dask_spark.ml.pipeline import hash_split
    from gexp_ml_dask_spark.operators.sorts import global_rank

    def docs():
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    def events():
        return spark.read.parquet(f"{sf_dir}/events.parquet")

    return [
        (
            "shuffle_agg",
            docs,
            lambda d: d.groupBy("source").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_chars").alias("chars"),
            ),
        ),
        (
            "hash_split_test_half",
            docs,
            lambda d: hash_split(d, 0.3, key_col="doc_id")[1].select(
                "doc_id"
            ),
        ),
        (
            "epoch_shuffle",
            docs,
            lambda d: epoch_shuffle(d, seed=7, n_shards=16),
        ),
        (
            "minhash_lsh_pairs",
            docs,
            lambda d: minhash_lsh_pairs(d, threshold=0.5),
        ),
        (
            "global_rank",
            events,
            lambda d: global_rank(
                d.select("event_id", "value"), "value", "event_id"
            ),
        ),
        (
            "exact_dedup",
            docs,
            lambda d: exact_dedup(d).select("doc_id", "n_chars"),
        ),
    ]


def run_retry(args) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.threads},4]")
        .appName("retry_chaos")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = f"{args.data_root}/{args.sf}"
    marker_dir = tempfile.mkdtemp(prefix="retry_chaos_")
    results, bad = {}, []
    for name, src, op in battery(spark, sf_dir):
        clean = df_hash(op(src()))
        in_chaos = df_hash(
            op(flaky(src(), f"{name}-in", marker_dir, args.inject_mod))
        )
        out_chaos = df_hash(
            flaky(op(src()), f"{name}-out", marker_dir, args.inject_mod)
        )
        fired = len(
            [m for m in os.listdir(marker_dir) if m.startswith(name)]
        )
        ok = clean == in_chaos == out_chaos and fired > 0
        results[name] = {
            "rows": clean[0],
            "identical": clean == in_chaos == out_chaos,
            "injected_failures": fired,
        }
        if not ok:
            bad.append(name)
        print(
            f"{'OK  ' if ok else 'FAIL'} {name} rows={clean[0]} "
            f"injected={fired} clean={clean[1][:12]} "
            f"in={in_chaos[1][:12]} out={out_chaos[1][:12]}",
            file=sys.stderr,
            flush=True,
        )
    # Write-path retry: a task that fails mid-sink must not leave
    # partial files behind — the FileOutputCommitter only promotes
    # files from the attempt that COMMITS, so the re-attempt's output
    # replaces (never duplicates) the failed attempt's rows. This is
    # the invariant that makes batch sinks retry-exactly-once.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clean = df_hash(docs)
    sink = tempfile.mkdtemp(prefix="retry_chaos_sink_")
    flaky(
        docs.repartition(6), "sink", marker_dir, args.inject_mod
    ).write.mode("overwrite").parquet(f"{sink}/docs")
    back = df_hash(spark.read.parquet(f"{sink}/docs"))
    fired = len([m for m in os.listdir(marker_dir) if m.startswith("sink")])
    ok = back == clean and fired > 0
    results["parquet_sink_commit"] = {
        "rows": clean[0],
        "identical": back == clean,
        "injected_failures": fired,
    }
    if not ok:
        bad.append("parquet_sink_commit")
    print(
        f"{'OK  ' if ok else 'FAIL'} parquet_sink_commit rows={clean[0]} "
        f"injected={fired} clean={clean[1][:12]} back={back[1][:12]}",
        file=sys.stderr,
        flush=True,
    )
    spark.stop()
    print(
        json.dumps(
            {"mode": "retry", "ok": not bad, "results": results}
        )
    )
    return 1 if bad else 0


def straggler(df, tag: str, marker_dir: str, sleep_s: float):
    """Identity pass-through that makes partition 0's FIRST attempt a
    straggler (sleeps ``sleep_s``), and drops a marker for EVERY task
    attempt — two markers for one (stage, partition) prove a
    speculative duplicate actually launched."""
    schema = df.schema

    def gen(batches):
        import time as _time

        from pyspark import TaskContext

        tc = TaskContext.get()
        open(
            os.path.join(
                marker_dir,
                f"{tag}-s{tc.stageId()}-p{tc.partitionId()}"
                f"-a{tc.attemptNumber()}",
            ),
            "w",
        ).close()
        if tc.partitionId() == 0 and tc.attemptNumber() == 0:
            _time.sleep(sleep_s)
        yield from batches

    return df.mapInPandas(gen, schema)


def _speculated(marker_dir: str, tag: str) -> int:
    """Count (stage, partition) cells that ran more than one attempt."""
    from collections import Counter

    cells = Counter(
        m.rsplit("-a", 1)[0]
        for m in os.listdir(marker_dir)
        if m.startswith(tag)
    )
    return sum(1 for n in cells.values() if n > 1)


def run_speculate(args) -> int:
    """spark.speculation=true + an injected straggler: the scheduler
    races a duplicate attempt against the slow original; results and
    sink output must be identical no matter which attempt wins (the
    OutputCommitCoordinator lets exactly one sink attempt commit)."""
    from pyspark.sql import SparkSession

    from gexp_ml_dask_spark.llm.dedup import minhash_lsh_pairs

    # NOT local[N]: TaskSchedulerImpl only starts its speculation
    # thread when the master is non-local. local-cluster runs the
    # real scheduler path, but see the module docstring: on a single
    # machine the same-host exclusion still keeps duplicates at 0,
    # so expect exit 2 (vacuous, results pinned identical) here and
    # exit 0 only on a genuinely multi-host cluster.
    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("retry_chaos_speculate")
        .config("spark.executor.memory", "1536m")
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "50ms")
        .config("spark.speculation.multiplier", "1.2")
        .config("spark.speculation.quantile", "0.25")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = f"{args.data_root}/{args.sf}"
    marker_dir = tempfile.mkdtemp(prefix="retry_chaos_spec_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    results, bad = {}, []

    # Compute path: straggler on the scan feeding MinHash-LSH.
    clean = df_hash(minhash_lsh_pairs(docs, threshold=0.5))
    t0 = time.time()
    chaos = df_hash(
        minhash_lsh_pairs(
            straggler(
                docs.repartition(8), "compute", marker_dir, args.straggle_s
            ),
            threshold=0.5,
        )
    )
    wall = time.time() - t0
    spec = _speculated(marker_dir, "compute")
    ok = clean == chaos and spec > 0
    results["compute"] = {
        "rows": clean[0],
        "identical": clean == chaos,
        "speculated_tasks": spec,
        "wall_s": round(wall, 2),
        "straggler_s": args.straggle_s,
    }
    if not ok:
        bad.append("compute")

    # Sink path: the straggler races the speculative copy INTO the
    # parquet commit; the loser's commit is denied, files from
    # exactly one attempt are promoted.
    clean = df_hash(docs)
    sink = tempfile.mkdtemp(prefix="retry_chaos_spec_sink_")
    straggler(
        docs.repartition(8), "sink", marker_dir, args.straggle_s
    ).write.mode("overwrite").parquet(f"{sink}/docs")
    back = df_hash(spark.read.parquet(f"{sink}/docs"))
    spec = _speculated(marker_dir, "sink")
    ok = back == clean and spec > 0
    results["sink"] = {
        "rows": clean[0],
        "identical": back == clean,
        "speculated_tasks": spec,
    }
    if not ok:
        bad.append("sink")
    spark.stop()
    vacuous = any(r["speculated_tasks"] == 0 for r in results.values())
    print(
        json.dumps(
            {
                "mode": "speculate",
                "ok": not bad,
                "vacuous": vacuous,
                "results": results,
            }
        )
    )
    return (2 if vacuous else 1) if bad else 0


def _kill_one_executor(sc, delay: float, out: dict, done):
    """Wait until a job is actually RUNNING (poll the status tracker
    — a wall-clock-only schedule is vacuous whenever JIT/page-cache
    warmup makes the chaos run faster than the cold estimate), then
    sleep ``delay`` and SIGKILL one of this app's executor JVMs."""
    try:
        tracker = sc.statusTracker()

        def wait_active() -> bool:
            while not done.is_set():
                if tracker.getActiveJobsIds():
                    return True
                time.sleep(0.02)
            return False

        if not wait_active():
            out["note"] = "no job ever became active"
            return
        time.sleep(delay)
        # If the job beat the timer (warm runs keep getting faster),
        # fire at the START of the next active job instead — an early
        # kill is the harsher case anyway (stage-0 map outputs lost).
        if not tracker.getActiveJobsIds() and not wait_active():
            out["note"] = "chaos run ended before the timer fired"
            return
        pids = subprocess.run(
            [
                "pgrep",
                "-f",
                f"CoarseGrainedExecutorBackend.*{sc.applicationId}",
            ],
            capture_output=True,
            text=True,
        ).stdout.split()
        if pids:
            os.kill(int(pids[0]), signal.SIGKILL)
            out["killed_pid"] = int(pids[0])
            out["kill_time"] = time.time()
        else:
            out["note"] = "no executor pid matched at fire time"
    except Exception as ex:  # noqa: BLE001 — surface, don't die silent
        out["error"] = repr(ex)


def run_kill(args) -> int:
    from pyspark.sql import SparkSession, functions as F

    from gexp_ml_dask_spark.llm.dedup import minhash_lsh_pairs

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("retry_chaos_kill")
        .config("spark.executor.memory", "1536m")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = f"{args.data_root}/{args.sf}"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # 4 tagged copies (ids offset, text version-suffixed) quadruple
    # the corpus so the job is long enough to kill mid-flight; the
    # suffix only perturbs trailing shingles, so cross-copy pairs are
    # legitimate near-dups — more work, still deterministic.
    big = None
    for i in range(4):
        c = docs.select(
            (F.col("doc_id") + F.lit(i * 100_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" chaosv{i}")).alias("text"),
        )
        big = c if big is None else big.union(c)
    big = big.persist()
    big.count()

    def pairs():
        return minhash_lsh_pairs(big, threshold=0.5, max_bucket=5000)

    df_hash(pairs())  # cold run: JIT + page-cache warmup, discarded
    t0 = time.time()
    clean = df_hash(pairs())
    clean_wall = time.time() - t0  # warm estimate the kill is timed on
    # The kill placement races the job under co-tenant load; a miss
    # is vacuous (exit 2), not wrong, so retry the chaos leg a few
    # times rather than flake the wrapping test.
    for attempt in range(args.attempts):
        kill_info = {}
        done = threading.Event()
        killer = threading.Thread(
            target=_kill_one_executor,
            args=(
                spark.sparkContext,
                max(0.3, args.kill_frac * clean_wall),
                kill_info,
                done,
            ),
        )
        t1 = time.time()
        killer.start()
        chaos = df_hash(pairs())
        t2 = time.time()
        done.set()
        killer.join()
        vacuous = (
            "killed_pid" not in kill_info or kill_info["kill_time"] >= t2
        )
        if not vacuous:
            break
        print(
            f"attempt {attempt}: vacuous "
            f"({kill_info.get('note') or kill_info.get('error')})",
            file=sys.stderr,
            flush=True,
        )
    spark.stop()
    ok = not vacuous and clean == chaos
    print(
        json.dumps(
            {
                "mode": "kill",
                "ok": ok,
                "vacuous": vacuous,
                "rows": clean[0],
                "identical": clean == chaos,
                "clean_wall_s": round(clean_wall, 2),
                "chaos_wall_s": round(t2 - t1, 2),
                "killed_pid": kill_info.get("killed_pid"),
                "kill_at_s": round(kill_info["kill_time"] - t1, 2)
                if "kill_time" in kill_info
                else None,
                "note": kill_info.get("note") or kill_info.get("error"),
            }
        )
    )
    return 2 if vacuous else (0 if ok else 1)


def run_stream_kill(args) -> int:
    """Streaming state must survive executor loss. A rate-source
    complete-mode aggregation carries an exactly-checkable invariant:
    with keys = value % K over values 0..N-1, every key's count is
    N//K (+1 for k < N%K) — any state lost or double-counted when an
    executor dies breaks it. The killed executor's partitions are
    rescheduled on the survivor, which reloads their state store
    from the checkpoint (the same recovery a DFS checkpoint gives a
    real cluster); micro-batch offset tracking makes the replayed
    batch exactly-once."""
    import tempfile as _tf

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("retry_chaos_stream")
        .config("spark.executor.memory", "1536m")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    K = 100
    ckpt = _tf.mkdtemp(prefix="retry_chaos_stream_ckpt_")
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 20000)
        .load()
        .groupBy((F.col("value") % K).alias("k"))
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("chaos_counts")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    kill_info: dict = {}
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not q.recentProgress:
            time.sleep(0.2)  # let at least one batch commit first
        time.sleep(2.0)
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
        if pids:
            os.kill(int(pids[0]), signal.SIGKILL)
            kill_info["killed_pid"] = int(pids[0])
        # keep streaming across the death + replacement executor
        time.sleep(6.0)
        q.processAllAvailable()
    finally:
        q.stop()
    pdf = spark.table("chaos_counts").toPandas()
    spark.stop()
    n = int(pdf["count"].sum())
    got = {int(r["k"]): int(r["count"]) for _, r in pdf.iterrows()}
    want = {k: n // K + (1 if k < n % K else 0) for k in range(K)}
    want = {k: v for k, v in want.items() if v > 0}
    exact = got == want
    vacuous = "killed_pid" not in kill_info or n == 0
    ok = exact and not vacuous
    print(
        json.dumps(
            {
                "mode": "stream-kill",
                "ok": ok,
                "vacuous": vacuous,
                "rows_streamed": n,
                "keys": len(got),
                "state_exact": exact,
                "killed_pid": kill_info.get("killed_pid"),
            }
        )
    )
    return 2 if vacuous else (0 if ok else 1)


def run_stream_kill_append(args) -> int:
    """Append-mode session windows must survive executor loss.

    Complete-mode (--mode stream-kill) only exercises state reload;
    append mode adds the watermark/state interplay: rows are held in
    the session store until the (checkpointed) watermark passes the
    session end + gap, then emitted EXACTLY ONCE — an executor death
    that loses or replays store contents shows up as a wrong count,
    a duplicate emission, or a session that never closes.

    The invariant is exact because event time is synthetic (a pure
    function of the rate source's ``value``, never wall clock): key
    ``value % K`` sees one event per second ``j = value // K``, and
    every B events the clock jumps G seconds — far past the session
    gap — so each key's sessions are exactly the B-event blocks. All
    keys' blocks share identical time ranges (the jump is aligned on
    ``value``), so whatever prefix of blocks the watermark closes, it
    closes for every key: the sink must hold the SAME number of
    sessions per key, every one with count == B and the block's exact
    start. Any deviation is state lost/duplicated in the kill."""
    import tempfile as _tf

    from pyspark.sql import SparkSession, functions as F

    K, B, GAP_JUMP_S = 10, 50, 60
    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("retry_chaos_stream_append")
        .config("spark.executor.memory", "1536m")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ckpt = _tf.mkdtemp(prefix="retry_chaos_stream_append_ckpt_")
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 20000)
        .load()
        .select(
            (F.col("value") % K).alias("k"),
            F.timestamp_seconds(
                (F.col("value") / K).cast("long")
                + (F.col("value") / (K * B)).cast("long") * GAP_JUMP_S
            ).alias("ts"),
        )
        .withWatermark("ts", "10 seconds")
    )
    q = (
        src.groupBy(F.session_window("ts", "5 seconds"), "k")
        .count()
        .select(
            "k",
            F.col("session_window.start").cast("long").alias("s_start"),
            F.col("session_window.end").cast("long").alias("s_end"),
            "count",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("chaos_sessions")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    kill_info: dict = {}
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not q.recentProgress:
            time.sleep(0.2)  # let at least one batch commit first
        time.sleep(2.0)
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
        if pids:
            os.kill(int(pids[0]), signal.SIGKILL)
            kill_info["killed_pid"] = int(pids[0])
        kill_info["sessions_at_kill"] = spark.table(
            "chaos_sessions"
        ).count()
        # Keep streaming across the death + replacement executor so
        # the watermark advances and closes sessions POST-recovery.
        # BOUNDED poll, never processAllAvailable(): a rate source
        # produces forever, so on a loaded host where the recovering
        # cluster can't outrun it, processAllAvailable() simply never
        # returns (observed: 540 s test timeout under a concurrent
        # sweep). The invariants hold for WHATEVER prefix of blocks
        # was emitted, so all we need is evidence of post-kill
        # emission, not a drained source.
        drain_deadline = time.time() + 120
        while time.time() < drain_deadline:
            n_now = spark.table("chaos_sessions").count()
            if n_now >= kill_info["sessions_at_kill"] + 3 * K:
                break  # >= 3 whole blocks emitted after the kill
            time.sleep(1.0)
    finally:
        q.stop()
    pdf = spark.table("chaos_sessions").toPandas()
    spark.stop()
    n_sessions = len(pdf)
    counts_exact = bool((pdf["count"] == B).all()) if n_sessions else False
    per_key = pdf.groupby("k").size() if n_sessions else None
    keys_symmetric = (
        per_key is not None
        and len(per_key) == K
        and int(per_key.nunique()) == 1
    )
    # block i of every key starts at second i*B + i*GAP_JUMP_S and
    # spans B events 1s apart -> session end = start + (B-1) + gap(5)
    starts_exact = bool(
        n_sessions
        and (
            (pdf["s_start"] % (B + GAP_JUMP_S) == 0)
            & (pdf["s_end"] == pdf["s_start"] + B - 1 + 5)
        ).all()
    )
    exact = counts_exact and keys_symmetric and starts_exact
    vacuous = (
        "killed_pid" not in kill_info
        or n_sessions == 0
        # no post-kill emission observed -> recovery never proved
        or n_sessions <= kill_info.get("sessions_at_kill", 0)
    )
    ok = exact and not vacuous
    print(
        json.dumps(
            {
                "mode": "stream-kill-append",
                "ok": ok,
                "vacuous": vacuous,
                "sessions_at_kill": kill_info.get("sessions_at_kill"),
                "sessions_emitted": n_sessions,
                "sessions_per_key": (
                    int(per_key.iloc[0]) if keys_symmetric else None
                ),
                "counts_exact": counts_exact,
                "keys_symmetric": bool(keys_symmetric),
                "starts_exact": starts_exact,
                "killed_pid": kill_info.get("killed_pid"),
            }
        )
    )
    return 2 if vacuous else (0 if ok else 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode",
        choices=[
            "retry",
            "kill",
            "speculate",
            "stream-kill",
            "stream-kill-append",
        ],
        default="retry",
    )
    ap.add_argument("--sf", default=None, help="testdata dir name")
    ap.add_argument("--data-root", default="/root/testdata")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--inject-mod", type=int, default=3)
    ap.add_argument(
        "--kill-frac",
        type=float,
        default=0.25,
        help="schedule the SIGKILL at this fraction of the clean wall",
    )
    ap.add_argument(
        "--attempts",
        type=int,
        default=3,
        help="kill-mode retries when the kill misses the job window",
    )
    ap.add_argument(
        "--straggle-s",
        type=float,
        default=4.0,
        help="speculate-mode straggler sleep (must dwarf the median "
        "task so the scheduler launches a duplicate)",
    )
    args = ap.parse_args()
    if args.attempts < 1:
        ap.error("--attempts must be >= 1 (kill mode needs at least one try)")
    if args.sf is None:
        args.sf = "sf0.1" if args.mode == "kill" else "sf0.001"
    if args.mode == "retry":
        return run_retry(args)
    if args.mode == "speculate":
        return run_speculate(args)
    if args.mode == "stream-kill":
        return run_stream_kill(args)
    if args.mode == "stream-kill-append":
        return run_stream_kill_append(args)
    return run_kill(args)


if __name__ == "__main__":
    raise SystemExit(main())
