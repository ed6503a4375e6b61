#!/usr/bin/env python
"""Benchmark harness — the driver's per-round feedback loop.

Runs the headline queries from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE compact JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The compact line is sized to survive the driver's ~2000-char stdout
tail capture (BENCH_r04/r05 recorded ``"parsed": null`` because the
old single line outgrew it); the complete record — host telemetry,
per-query RSS windows, pipeline-grid scores — is written to
``BENCH_full.json`` (override: ``$SPARK_GRAFT_BENCH_OUT``), which the
round snapshot commits.

Measurement recipe mirrors the reference's
(``singlemachine_dataset_samplewise_benchmark.py:52-53``,
``min(timeit.repeat(repeat=3, number=1))``): each repeat is a full
plan→execute→drain cycle (plan construction included — some
composites collect fit scalars at build time), the reported number
is the min of 3 repeats, and the Spark cache is cleared between
repeats so no repeat reads a previous repeat's persisted data. We
drain with ``write.format('noop')`` so every row is produced but
nothing is collected to the driver.

Beyond the operator suite, this harness also times the reference's
PRIMARY published workload: the whole ``gexp_pipeline`` end-to-end
(load → UQ normalize → stat filter → log2 → assemble → split →
encode → scale → CV10 fit/score → eval fit/score,
``functions/dask_pipeline.py:124-157``) over the reference's
samplewise/featurewise n×f grid
(``singlemachine_dataset_samplewise_benchmark.py:21-33``,
``…featurewise…py:20-34``), scaled to the driver tables (the
reference's n ∈ {200,600,1205} kept verbatim; f scaled 20k→500 so
the largest cell's dense n×f matrix ≈ the whole sf0.1 fact table).
Data prep (dense matrix + labels to parquet) happens OUTSIDE the
timed region, exactly like the reference's ``data/brca_undersample.py``
prep step; the timed region starts at ``spark.read.parquet`` like the
reference's ``dask_load_data``.

Peak memory is recorded for reference parity with
``memory_usage(max_usage=True, include_children=True)``
(``…samplewise…py:47-48``): a sampler thread walks the process tree
(python driver + JVM children) every 250 ms summing VmRSS, reporting
a per-query window peak and a suite-level peak.

Host-state guard: identical plans swing 2–6× with co-tenant load
(BASELINE.md environment note; BENCH_r3 was recorded at loadavg 15).
The JSON line carries start/end telemetry and ``degraded: true``
whenever loadavg_1m > 4 or pipe RTT > 60 µs, so a gate read never
mistakes host noise for a code regression.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: the flagship composites plus one representative per
# operator family — heavy enough to exercise shuffle/agg/join paths,
# bounded enough to finish in minutes at sf0.1.
HEADLINE = [
    "op_ml_01_upper_quartile",      # UQ normalization composite
    "op_ml_02_tmm",                 # TMM composite (hardest op)
    "op_fil_02_stat_threshold_genes",  # mean/var thresholds + semi-join
    "op_sort_02_top_k_variance",    # top-k (TakeOrderedAndProject)
    "op_src_07_pivot_long_to_wide",  # long→wide pivot
    "op_llm_01_exact_dedup",        # sha256 hash-groupBy dedup
    "op_llm_02_minhash_lsh",        # MinHash-LSH near-dup (scale path)
    "op_llm_03_knn_bruteforce",     # cosine top-k similarity
    "op_llm_04_text_stats",         # text quality scalars
    "op_llm_05_tumbling_window",    # event-time windows
    "op_llm_08_curation_pipeline",  # dedup -> quality -> mixture composite
    "op_join_04_asof_events",       # as-of join (union + single-shuffle window)
    "op_llm_04_tfidf",              # TF-IDF keywords (tf agg + broadcast idf)
    "op_llm_02_dup_clusters",       # near-dup clusters (pairs -> union-find/CC)
    "op_llm_04_scrub_pii",          # PII scrub (chained codegen regex scan)
    "op_llm_02_dup_ngram_spans",    # cross-doc repeated-ngram coverage (2 window shuffles)
    "op_llm_08_curation_max",       # every curation signal chained (scrub->dedup->gates->decontam->mix)
    "op_agg_14_coexpression",       # gene-gene correlation (pair agg over co-keyed join)
    "op_agg_17_welch_t",            # Welch's t between groups (2 partial aggs)
    "op_join_07_fuzzy",             # blocked Levenshtein entity-resolution join
    "op_llm_04_nb_quality",         # NB quality LLR scorer (vocab agg + keyed scoring join)
    "op_llm_07_temperature_weights",  # temperature mixture weights (source-key agg)
    "op_llm_04_bpe_tokenize",       # BPE train (5 merges) + apply: vocab-dim rounds + word-key join
    "op_llm_03_kmeans",             # exact-contract Lloyd k-means (3 rounds, pos-join distances)
    "op_agg_18_cohort_retention",   # cohort retention (2 fact aggs + user-key join)
    "op_agg_19_constraints",        # data-quality gate (1 fused scan + keyed agg + FK anti-join)
    # round-8 additions (entries may be ADDED, never removed/renamed):
    # the two queries VERDICT r7 named perf-weak, rewritten this round
    # from a single-partition Window.orderBy onto the bucketed
    # distributed global_rank — in the suite so the fix stays measured
    "op_ml_10_auc",                 # Mann-Whitney AUC over global_rank
    "op_ml_10_calibration",         # reliability bins: closed-form NTILE over global_rank
]

# The reference's benchmark grid (singlemachine_dataset_samplewise
# _benchmark.py:21-33: n ∈ {200,600,1205} × f=20k; …featurewise…
# py:20-34: f ∈ {10k,20k,40k} × n=1205), f scaled 20k→500 for the
# driver tables (same 1:2:4 feature ratio). (1205, 500) is shared
# between the two sweeps, so 5 unique cells.
PIPELINE_GRID = [
    ("samplewise_n200_f500", 200, 500, "classification"),
    ("samplewise_n600_f500", 600, 500, "classification"),
    ("samplewise_n1205_f500", 1205, 500, "classification"),
    ("featurewise_n1205_f250", 1205, 250, "classification"),
    ("featurewise_n1205_f1000", 1205, 1000, "classification"),
    # the reference's SECOND task: lung cigarettes-per-day is a
    # REGRESSION workload (lung_data_prep.ipynb cell-3; r² scoring,
    # dask_pipeline.py:100-102) — continuous label, GBT regressor
    ("regression_n1205_f500", 1205, 500, "regression"),
]

# The reference's REAL featurewise axis runs to f=20k/40k assembled
# dims (singlemachine_dataset_featurewise_benchmark.py:20-34). These
# wide-vector boundary cells are opt-in (SPARK_GRAFT_PIPE_WIDE=1 or
# explicit SPARK_GRAFT_PIPE_CELLS) — too slow for the per-round
# default bench, measured once per scale point for BASELINE.md's
# f-scaling row.
PIPELINE_GRID_WIDE = [
    ("featurewise_n1205_f5000", 1205, 5000, "classification"),
    ("featurewise_n1205_f20000", 1205, 20000, "classification"),
    # The reference's largest grid point. At f=40k the measured RSS
    # lever is CV-fold concurrency (each in-flight fold holds dense
    # 40k-dim scaled copies) — run with SPARK_GRAFT_CV_PAR=4-5 on a
    # 128 GiB box (f=20k at parallelism 10 peaked 52.7 GB).
    ("featurewise_n1205_f40000", 1205, 40000, "classification"),
]

# Wide cells fold 6M sf1 fact rows into up to 24M matrix cells —
# >75% zeros, which is NOT the reference's workload shape (its
# f=20k/40k runs are on dense FPKM matrices) and is degenerate for
# UQ normalization (per-sample q75 = 0 scales the matrix to zeros;
# gexp_pipeline now fails fast on it). Wide-cell prep therefore fills
# cells the fact table can't populate with a deterministic
# pseudo-count (xxhash64-derived, uniform 1..19) instead of 0.0,
# reproducing the dense-matrix contract. Default cells keep the
# left-join-zeros prep bit-for-bit (recorded timings stay valid).
DENSE_FILL_CELLS = {name for name, *_ in PIPELINE_GRID_WIDE}

DEGRADED_LOAD = 4.0
DEGRADED_RTT_US = 60.0
# Per-Spark-job fixed overhead (min wall of a trivial 1-stage
# collect, measured after warm-up). Healthy local[32] hosts sit at
# 20-40 ms; the round-8 A/B caught a VM where identical plans ran
# 2-4x slower because this number was 150-480 ms while loadavg and
# pipe RTT looked healthy — scheduler-bound queries (many small
# stages: kmeans rounds, curation composites) absorb the hit,
# scan-bound ones (UQ/TMM) don't. Recording it makes those swings
# attributable; crossing the threshold stamps degraded:true and
# triggers the same backoff-retry as load/RTT.
DEGRADED_JOB_MS = 75.0


def spark_job_overhead_ms(spark) -> float:
    """Min wall-clock of a trivial JVM-only job (no Python workers,
    no shuffle), in ms — the per-job scheduling+dispatch constant
    every multi-stage query pays once per job."""
    best = float("inf")
    for _ in range(15):
        t0 = time.perf_counter()
        spark.range(100).selectExpr("sum(id)").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)


def host_telemetry() -> dict[str, float]:
    """Scheduling-latency + load snapshot recorded alongside the
    timings. BASELINE.md's environment note documents 2-5x swings of
    identical plans with co-tenant host load; pipe round-trip time
    (healthy: 5-20 us) and loadavg make each recording interpretable
    after the fact."""
    import time as _t

    r, w = os.pipe()
    r2, w2 = os.pipe()
    pid = os.fork()
    if pid == 0:  # child: echo server
        os.close(w)
        os.close(r2)
        while True:
            b = os.read(r, 1)
            if not b:
                os._exit(0)
            os.write(w2, b)
    os.close(r)
    os.close(w2)
    n = 1000
    t0 = _t.perf_counter()
    for _ in range(n):
        os.write(w, b"x")
        os.read(r2, 1)
    rtt_us = (_t.perf_counter() - t0) / n * 1e6
    os.close(w)
    os.close(r2)
    os.waitpid(pid, 0)
    load1 = os.getloadavg()[0]
    return {"pipe_rtt_us": round(rtt_us, 1), "loadavg_1m": round(load1, 2)}


def _proc_tree_rss_mb() -> float:
    """Sum VmRSS over this process and all descendants (the JVM is a
    child of the python driver in local mode) — the same quantity the
    reference's memory_usage(max_usage=True, include_children=True)
    tracks (singlemachine_dataset_samplewise_benchmark.py:47-48)."""

    def rss(pid: int) -> float:
        try:
            with open(f"/proc/{pid}/status") as fh:
                for line in fh:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1]) / 1024.0
        except OSError:
            pass
        return 0.0

    def children(pid: int) -> list[int]:
        out: list[int] = []
        try:
            for tid in os.listdir(f"/proc/{pid}/task"):
                with open(f"/proc/{pid}/task/{tid}/children") as fh:
                    out += [int(x) for x in fh.read().split()]
        except OSError:
            pass
        return out

    total, stack, seen = 0.0, [os.getpid()], set()
    while stack:
        pid = stack.pop()
        if pid in seen:
            continue
        seen.add(pid)
        total += rss(pid)
        stack.extend(children(pid))
    return total


class PeakRssSampler:
    """Background max-RSS tracker: suite-level peak plus a resettable
    per-query window peak, sampled every ``interval`` seconds."""

    def __init__(self, interval: float = 0.25) -> None:
        self.interval = interval
        self.peak = 0.0
        self.window_peak = 0.0
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            cur = _proc_tree_rss_mb()
            with self._lock:
                self.peak = max(self.peak, cur)
                self.window_peak = max(self.window_peak, cur)
            self._stop.wait(self.interval)

    def start(self) -> "PeakRssSampler":
        self._thread.start()
        return self

    def reset_window(self) -> None:
        with self._lock:
            self.window_peak = _proc_tree_rss_mb()

    def take_window(self) -> float:
        with self._lock:
            self.window_peak = max(self.window_peak, _proc_tree_rss_mb())
            return round(self.window_peak, 1)

    def stop(self) -> float:
        self._stop.set()
        self._thread.join(timeout=2.0)
        return round(self.peak, 1)


def prep_pipeline_cell(
    spark,
    sf_dir: str,
    n: int,
    f: int,
    out: str,
    task: str = "classification",
    dense_fill: bool = False,
) -> None:
    """Derive the reference-shaped dense n×f expression matrix +
    labels from lineitem (prep step ≡ data/brca_undersample.py —
    outside the timed region). Samples/genes are key-folded so every
    cell is a real subset-shaped workload of the same fact table;
    missing (sample, gene) cells become explicit zeros exactly like
    an FPKM matrix. Labels derive from the first-50-genes expression
    SHARE — a composition signal that survives the pipeline's
    per-sample normalization (a total-expression label would be
    erased by it): classification splits it at the median (the BRCA
    subtype analogue), regression uses the share itself as the
    continuous target (the lung cigarettes-per-day analogue,
    lung_data_prep.ipynb cell-3)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    gid = F.concat(
        F.lit("g"),
        F.format_string("%05d", (F.col("l_partkey") % f).cast("int")),
    )
    vals = (
        li.select(
            (F.col("l_orderkey") % n).alias("sample_id"),
            gid.alias("gene_id"),
            F.col("l_quantity").alias("value"),
        )
        .groupBy("sample_id", "gene_id")
        .agg(F.sum("value").alias("value"))
    )
    samples = spark.range(n).select(F.col("id").alias("sample_id"))
    genes = spark.range(f).select(
        F.concat(
            F.lit("g"), F.format_string("%05d", F.col("id").cast("int"))
        ).alias("gene_id")
    )
    dense = (
        samples.crossJoin(F.broadcast(genes))
        .join(vals, ["sample_id", "gene_id"], "left")
        .select(
            "sample_id",
            "gene_id",
            F.coalesce(
                "value",
                # Wide cells: deterministic dense pseudo-count
                # (1..19) for cells the folded fact can't populate —
                # see DENSE_FILL_CELLS. Default: explicit FPKM zero.
                (
                    F.pmod(
                        F.xxhash64("sample_id", "gene_id"), F.lit(19)
                    ).cast("double")
                    + 1.0
                )
                if dense_fill
                else F.lit(0.0),
            ).alias("value"),
        )
    )
    dense.repartition(8).write.mode("overwrite").parquet(f"{out}/gexp")
    dg = spark.read.parquet(f"{out}/gexp")
    if task == "regression":
        # Continuous target: the UQ-normalized expression of one
        # robustly-kept gene (above-median mean AND variance, then
        # max variance — guaranteed to survive the pipeline's own
        # stat-threshold filter), i.e. y = ln(1 + v_g * q75_s /
        # sum_s). The target is exactly realizable from the
        # pipeline's post-normalization feature space, so r²
        # measures pipeline fidelity end-to-end (the folded TPC-H
        # matrix has ~1 draw per cell — multi-gene ratio targets
        # drown in Poisson noise and score r² ≈ 0 for any learner).
        gs = dg.groupBy("gene_id").agg(
            F.avg("value").alias("m"), F.var_samp("value").alias("v")
        )
        med_m, med_v = gs.agg(
            F.expr("percentile(m, 0.5)"), F.expr("percentile(v, 0.5)")
        ).first()
        target_row = (
            gs.filter((F.col("m") > med_m) & (F.col("v") > med_v))
            .orderBy(F.desc("v"), "gene_id")
            .first()
        )
        if target_row is None:
            # Degenerate cell (near-constant slice / tiny n×f): no
            # gene clears both median filters. Fall back to the
            # global max-variance gene so prep never crashes.
            target_row = gs.orderBy(F.desc("v"), "gene_id").first()
        target_gene = target_row["gene_id"]
        stats = dg.groupBy("sample_id").agg(
            F.expr("percentile(value, 0.75)").alias("q75"),
            F.sum("value").alias("tot"),
        )
        labels = (
            dg.filter(F.col("gene_id") == target_gene)
            .join(stats, "sample_id")
            .select(
                "sample_id",
                F.round(
                    F.log1p(
                        F.col("value") * F.col("q75") / F.col("tot")
                    ),
                    6,
                ).alias("label"),
            )
        )
    else:
        shares = dg.groupBy("sample_id").agg(
            (
                F.sum(
                    F.when(
                        F.col("gene_id") < "g00050", F.col("value")
                    ).otherwise(0.0)
                )
                / F.sum("value")
            ).alias("share")
        )
        # median split as a collected scalar, not a whole-frame
        # percentile_cont window: the window form was the LAST
        # "Moving all data to a single partition" WARN in the bench
        # tail (7 executions per prep under AQE) after round 8
        # removed every engine-side partitionless window. percentile
        # (the exact interpolated aggregate) computes the identical
        # value, so the hi/lo labels are bit-for-bit unchanged; prep
        # is outside the timed region either way.
        med_share = shares.agg(F.expr("percentile(share, 0.5)")).first()[0]
        labels = shares.select(
            "sample_id",
            F.when(F.col("share") > F.lit(med_share), "hi")
            .otherwise("lo")
            .alias("label"),
        )
    labels.coalesce(1).write.mode("overwrite").parquet(f"{out}/labels")


def run_pipeline_grid(
    spark, sf_dir: str, sampler: PeakRssSampler, repeats: int
) -> tuple[dict[str, float], dict[str, dict], dict[str, float]]:
    """Time gexp_pipeline end-to-end per grid cell; returns
    (timings, scores, peak_rss)."""
    import shutil
    import tempfile

    from gexp_ml_dask_spark.plans.gexp_pipeline import gexp_pipeline

    cells = os.environ.get("SPARK_GRAFT_PIPE_CELLS")
    pool = list(PIPELINE_GRID)
    if os.environ.get("SPARK_GRAFT_PIPE_WIDE") == "1" or cells:
        pool += PIPELINE_GRID_WIDE
    grid = [
        c for c in pool if cells is None or c[0] in cells.split(",")
    ]
    timings: dict[str, float] = {}
    scores: dict[str, dict] = {}
    peaks: dict[str, float] = {}
    for name, n, f, task in grid:
        tmp = tempfile.mkdtemp(prefix=f"pipebench_{name}_")
        try:
            prep_pipeline_cell(
                spark,
                sf_dir,
                n,
                f,
                tmp,
                task,
                dense_fill=name in DENSE_FILL_CELLS,
            )
            best, res = float("inf"), None
            for _ in range(repeats):
                spark.catalog.clearCache()
                sampler.reset_window()
                t0 = time.perf_counter()
                gexp = spark.read.parquet(f"{tmp}/gexp")
                labels = spark.read.parquet(f"{tmp}/labels")
                res = gexp_pipeline(
                    gexp,
                    labels,
                    task=task,
                    k_folds=10,
                    seed=42,
                    # Default 10 ≡ the recorded grid; the wide-cell
                    # RSS lever (see PIPELINE_GRID_WIDE note).
                    cv_parallelism=int(
                        os.environ.get("SPARK_GRAFT_CV_PAR", "10")
                    ),
                    fit_partitions=8,
                )
                best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            timings[name] = round(best, 3)
            peaks[name] = sampler.take_window()
            scores[name] = {
                "mean_cv": round(res[0], 4),
                "var_cv": round(res[1], 6),
                "eval": round(res[2], 4),
            }
            print(
                f"# pipeline {name}: {best:.3f}s eval={res[2]:.3f}",
                file=sys.stderr,
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return timings, scores, peaks


def ann_recall(spark, sf_dir: str, k: int = 10, n_queries: int = 20) -> dict:
    """recall@k of the two no-oracle ANN entries against exact brute
    force, at THEIR registered serving configs (op_llm_03_knn_ivf:
    8 cells / n_probe=5; op_llm_03_knn_lsh: 2 planes x 4 tables) and
    the same query set (vec_id < 20). Published per-round in the
    bench JSON so the rows-only entries carry a quality number the
    driver records (VERDICT r4 'Next round' item 5)."""
    from pyspark.sql import functions as F

    from gexp_ml_dask_spark.llm.similarity import (
        knn_bruteforce_pandas,
        knn_ivf,
        knn_lsh,
    )
    from gexp_ml_dask_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def pairs(df):
        return {
            (r["query_id"], r["vec_id"])
            for r in df.select("query_id", "vec_id").collect()
        }

    exact = pairs(knn_bruteforce_pandas(emb, queries, k=k))
    out = {"k": k, "n_queries": n_queries, "sf_dir": sf_dir}
    for name, approx_df in (
        ("op_llm_03_knn_ivf", knn_ivf(emb, queries, k=k, n_cells=8, n_probe=5)),
        (
            "op_llm_03_knn_lsh",
            knn_lsh(emb, queries, k=k, n_planes=2, n_tables=4),
        ),
    ):
        approx = pairs(approx_df)
        out[name] = round(len(exact & approx) / len(exact), 4)
    return out


def _is_degraded(host: dict) -> bool:
    return (
        host["loadavg_1m"] > DEGRADED_LOAD
        or host["pipe_rtt_us"] > DEGRADED_RTT_US
    )


def run_suite(sf_dir: str, sf: float, host: dict, degraded: bool) -> dict:
    """One full measurement attempt (headline suite + pipeline grid +
    ANN recall) on a fresh SparkSession; returns the full record."""
    from __spark_entry__ import queries

    from gexp_ml_dask_spark.session import get_spark

    spark = get_spark(app_name="bench")
    registry = queries()
    sampler = PeakRssSampler().start()

    # Warm-up: pay one-time JVM classloading / codegen / Arrow init
    # outside the measured window (the reference's min-of-3 repeats
    # serve the same purpose, singlemachine_*_benchmark.py:52-53).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    registry["op_agg_01_per_gene_mean"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    # Post-warm-up scheduling probe (see DEGRADED_JOB_MS): needs the
    # live session, so it can't run in host_telemetry() with the
    # pre-Spark checks.
    job_ms = spark_job_overhead_ms(spark)
    host["job_overhead_ms"] = job_ms
    if job_ms > DEGRADED_JOB_MS and not degraded:
        degraded = True
        print(
            f"# WARNING: degraded host (trivial-job overhead "
            f"{job_ms}ms > {DEGRADED_JOB_MS}ms) — timings stamped "
            "degraded:true",
            file=sys.stderr,
        )

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    query_peaks: dict[str, float] = {}
    # Targeted pipeline-cell measurement runs (e.g. the sf1
    # wide-vector boundary cells) skip the 26-query suite.
    headline = [] if os.environ.get("SPARK_GRAFT_HEADLINE_SKIP") == "1" else HEADLINE
    for name in headline:
        fn = registry[name]
        best = float("inf")
        sampler.reset_window()
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # Drain every row without driver collection; noop sink
            # keeps the full pipeline (shuffles included) on the
            # executors.
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        timings[name] = round(best, 3)
        query_peaks[name] = sampler.take_window()
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
        # Ask the JVM to collect between queries (outside every timed
        # window) so a query's RSS window reflects ITS live set, not
        # the heap high-water of everything before it — G1 on JDK 17
        # uncommits at full GC, without this the per-query peaks are
        # simply monotone.
        spark.sparkContext._jvm.System.gc()

    # Default min-of-3: the judge measured a 2.5× single-shot swing
    # (featurewise_f1000 62.1 s vs the 25.1 s min-of-3 record) —
    # repeats=1 eventually stamps a phantom pipeline regression.
    pipe_repeats = int(os.environ.get("SPARK_GRAFT_PIPE_REPEATS", "3"))
    pipe_timings: dict[str, float] = {}
    pipe_scores: dict[str, dict] = {}
    pipe_peaks: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_PIPE_SKIP") != "1":
        pipe_timings, pipe_scores, pipe_peaks = run_pipeline_grid(
            spark, sf_dir, sampler, pipe_repeats
        )

    recall = {}
    if os.environ.get("SPARK_GRAFT_RECALL_SKIP") != "1":
        recall = ann_recall(spark, sf_dir)
        print(f"# ann recall@10: {recall}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    peak_mb = sampler.stop()
    host_end = host_telemetry()
    full = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # The session's ACTUAL scheduling width (== local[N]): proves
        # $SPARK_GRAFT_CPUS was honored without stage-width forensics
        "cpus": spark.sparkContext.defaultParallelism,
        "host": host,
        # host_end is informational only: a multi-minute
        # 32-thread bench drives its OWN loadavg past any
        # threshold, so only the PRE-run snapshot can
        # distinguish co-tenant noise from our work.
        "host_end": host_end,
        "degraded": bool(degraded),
        "peak_rss_mb": peak_mb,
        "query_peak_rss_mb": query_peaks,
        "pipeline": pipe_timings,
        "pipeline_total": round(sum(pipe_timings.values()), 3),
        "pipeline_scores": pipe_scores,
        "pipeline_peak_rss_mb": pipe_peaks,
        "pipeline_repeats": pipe_repeats,
        # Per-round recall@k for the two no-oracle ANN
        # entries (op_llm_03_knn_ivf / knn_lsh) — makes their
        # quality visible in every BENCH_r{N}.json, not just
        # the >=0.8 gate in tests/test_llm_ops.py.
        "ann_recall": recall,
    }
    spark.stop()
    return full


def write_artifacts(full: dict, out_path: str) -> None:
    """CSV + (optional) bar-chart artifact parity with the
    reference's benchmark scripts, which persist a timings CSV and a
    matplotlib PDF alongside the raw numbers
    (singlemachine_dataset_samplewise_benchmark.py:127-167). The CSV
    always writes; the chart is gated on matplotlib being importable
    (absent in this container — cluster images have it)."""
    base = Path(out_path).with_suffix("")
    rows = [("kind", "name", "seconds")]
    rows += [("headline", k, v) for k, v in full["queries"].items()]
    rows += [("pipeline", k, v) for k, v in full.get("pipeline", {}).items()]
    csv_path = base.with_suffix(".csv")
    csv_path.write_text(
        "\n".join(",".join(str(c) for c in r) for r in rows) + "\n"
    )
    print(f"# csv artifact: {csv_path}", file=sys.stderr)
    try:
        import matplotlib  # noqa: F401

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    names = list(full["queries"])
    vals = [full["queries"][n] for n in names]
    fig, ax = plt.subplots(figsize=(max(8, len(names) * 0.4), 4))
    ax.bar(range(len(names)), vals)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=90, fontsize=6)
    ax.set_ylabel("seconds (min-of-N)")
    ax.set_title(f"headline suite, sf={full['sf']}")
    fig.tight_layout()
    pdf_path = base.with_suffix(".pdf")
    fig.savefig(pdf_path)
    plt.close(fig)
    print(f"# chart artifact: {pdf_path}", file=sys.stderr)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    host = host_telemetry()
    degraded = _is_degraded(host)
    if degraded:
        print(
            f"# WARNING: degraded host (load={host['loadavg_1m']}, "
            f"rtt={host['pipe_rtt_us']}us) — timings will be stamped "
            "degraded:true; retrying once after a backoff",
            file=sys.stderr,
        )

    full = run_suite(sf_dir, sf, host, degraded)
    # run_suite may raise the stamp itself (job-overhead probe)
    degraded = bool(full["degraded"])
    attempts = [
        {"host": host, "degraded": degraded, "value": full["value"],
         "pipeline_total": full["pipeline_total"]}
    ]
    # Degraded-host retry (VERDICT r6 item 5): identical plans swing
    # 2-6x with co-tenant load, so a degraded PRE-run stamp is noise,
    # not signal. Back off once, re-stamp, re-run, and keep the
    # better record — prefer a non-degraded attempt, then the lower
    # suite total. Both stamps land in the full record either way.
    if degraded and os.environ.get("SPARK_GRAFT_DEGRADED_RETRY", "1") == "1":
        backoff = int(os.environ.get("SPARK_GRAFT_DEGRADED_BACKOFF_S", "120"))
        print(f"# degraded-host backoff: {backoff}s", file=sys.stderr)
        time.sleep(backoff)
        host2 = host_telemetry()
        degraded2 = _is_degraded(host2)
        full2 = run_suite(sf_dir, sf, host2, degraded2)
        degraded2 = bool(full2["degraded"])
        attempts.append(
            {"host": host2, "degraded": degraded2, "value": full2["value"],
             "pipeline_total": full2["pipeline_total"]}
        )
        kept = 1
        # pipeline_total breaks ties when the headline suite was
        # skipped (SPARK_GRAFT_HEADLINE_SKIP=1 runs have value == 0).
        if (degraded, full["value"], full["pipeline_total"]) > (
            degraded2,
            full2["value"],
            full2["pipeline_total"],
        ):
            full, kept = full2, 2
        print(f"# kept attempt {kept} of {len(attempts)}", file=sys.stderr)
    full["attempts"] = attempts
    timings = full["queries"]
    total = full["value"]
    peak_mb = full["peak_rss_mb"]
    recall = full["ann_recall"]
    degraded = full["degraded"]
    host = full["host"]

    # The driver records only the LAST ~2000 chars of stdout; the
    # full record grew past that two rounds running, truncating its
    # own head ("parsed": null in BENCH_r04/r05). So: the full record
    # goes to a committed file, and stdout carries ONE compact line —
    # guaranteed under the capture window — with the gate-read
    # fields (suite total, per-query seconds, degraded, recall).
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        str(Path(__file__).resolve().parent / "BENCH_full.json"),
    )
    Path(out_path).write_text(json.dumps(full, indent=1) + "\n")
    print(f"# full record: {out_path}", file=sys.stderr)
    write_artifacts(full, out_path)
    compact = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # Echo the honored core count (VERDICT r8 item 3: the driver's
        # low-core scaling probe could not SEE that local[$CPUS] was
        # respected because the compact line never said so; stage
        # widths in BENCH_r08_c8.json proved it after the fact).
        "cpus": full["cpus"],
        "degraded": bool(degraded),
        "host_load": host["loadavg_1m"],
        "job_overhead_ms": host.get("job_overhead_ms"),
        "pipeline_total": full["pipeline_total"],
        "ann_recall": {
            k: v for k, v in recall.items() if k.startswith("op_")
        },
        "peak_rss_mb": peak_mb,
        "attempts": len(attempts),
        "full_json": out_path,
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # stay inside the driver's tail capture
        compact["queries"] = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:10]
        )
        compact["queries_truncated_to_top10"] = True
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
