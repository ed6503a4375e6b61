"""Driver-style oracle sweep, reproducible at any SF / session conf.

Runs EVERY value-oracled query in the registry through a VANILLA
SparkSession (Spark 4 defaults: ANSI on — the external driver's
environment, which the repo's tuned ``get_spark()`` would mask) and
compares each result against its DuckDB oracle with the driver's own
normalization (sort columns by name, sort rows, exact float compare).

Usage::

    python tools/oracle_sweep.py                     # sf0.01, defaults
    python tools/oracle_sweep.py --sf sf0.001
    python tools/oracle_sweep.py --sf sf0.1 --threads 16
    python tools/oracle_sweep.py --no-aqe --shuffle-partitions 7
    python tools/oracle_sweep.py --only op_llm_02_tf_cosine,op_sql_01_pricing_summary

Round-3 findings this tool reproduced (now fixed/pinned): the 2dp
monetary-sum contract (round(,6) sits inside the double ULP of ~1e9
sums and flipped at sf0.1), and the dense-corpus tf-cosine memory
boundary (documented in llm/dedup.py). Exit code 1 on any FAIL/ERR.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def compare(got, want, pd):
    got = got[sorted(got.columns)].sort_values(
        by=sorted(got.columns), na_position="last"
    ).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(
        by=sorted(want.columns), na_position="last"
    ).reset_index(drop=True)
    if list(got.columns) != list(want.columns) or len(got) != len(want):
        return False
    for c in got.columns:
        g, w = got[c], want[c]
        g_f, w_f = pd.api.types.is_float_dtype(g), pd.api.types.is_float_dtype(w)
        g_i, w_i = pd.api.types.is_integer_dtype(g), pd.api.types.is_integer_dtype(w)
        # Driver's value-hash is dtype-sensitive: an int column on one
        # side rendered as float on the other (e.g. DuckDB HUGEINT ->
        # pandas float) hash-mismatches even when values are equal.
        # Mirror that here so local sweeps catch it BEFORE the driver.
        if (g_f and w_i) or (g_i and w_f):
            print(f"     dtype-class mismatch col={c}: {g.dtype} vs {w.dtype}")
            return False
        if g_f or w_f:
            ga, wa = pd.to_numeric(g), pd.to_numeric(w)
            if not (((ga == wa) | (ga.isna() & wa.isna())).all()):
                return False
        elif not (g.astype(str) == w.astype(str)).all():
            return False
    return True


def _spark_digest(df):
    """Order-invariant multiset digest, computed DISTRIBUTED: row
    count + per-column sum of a 32-bit md5 prefix over a canonical
    string rendering. This is how value-verification survives scales
    where collecting the result is itself the bottleneck (a 60M-row
    result blows spark.driver.maxResultSize long before the operator
    itself struggles): both engines reduce to O(columns) scalars.
    Canonical form: NULL -> '~null~'; float/decimal -> printf %.6f of
    round(x,6)+0.0 (the +0.0 folds -0.0; nan/inf spelled out — Java
    and C printf disagree on case and -0); everything else -> its
    string cast."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        col = F.col(f.name)
        if isinstance(f.dataType, (T.DoubleType, T.FloatType, T.DecimalType)):
            d = col.cast("double")
            canon = (
                F.when(col.isNull(), F.lit("~null~"))
                .when(F.isnan(d), F.lit("nan"))
                .when(d == float("inf"), F.lit("inf"))
                .when(d == float("-inf"), F.lit("-inf"))
                .otherwise(
                    F.format_string("%.6f", F.round(d, 6) + F.lit(0.0))
                )
            )
        else:
            canon = F.when(col.isNull(), F.lit("~null~")).otherwise(
                col.cast("string")
            )
        h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
        aggs.append(F.sum(h).alias(f.name))
    return df.agg(*aggs).collect()[0].asDict()


def _duck_digest(con, sql: str):
    """DuckDB twin of :func:`_spark_digest` (same canonical form,
    same md5-prefix sum; hex via the '0x…'::BIGINT cast)."""
    desc = con.execute(f"DESCRIBE SELECT * FROM ({sql}) t").fetchall()
    parts = ["count(*) AS __n"]
    for row in desc:
        name, typ = row[0], row[1].upper()
        q = f'"{name}"'
        if typ in ("DOUBLE", "FLOAT", "REAL") or typ.startswith("DECIMAL"):
            canon = (
                f"CASE WHEN {q} IS NULL THEN '~null~' "
                f"WHEN isnan({q}::DOUBLE) THEN 'nan' "
                f"WHEN isinf({q}::DOUBLE) AND {q} > 0 THEN 'inf' "
                f"WHEN isinf({q}::DOUBLE) THEN '-inf' "
                f"ELSE printf('%.6f', round({q}::DOUBLE, 6) + 0.0) END"
            )
        else:
            canon = (
                f"CASE WHEN {q} IS NULL THEN '~null~' "
                f"ELSE {q}::VARCHAR END"
            )
        # outer BIGINT cast: DuckDB sums BIGINT into HUGEINT, which
        # pandas renders as float64 — exactness dies past 2^53 and
        # every big digest "mismatches" by the float spacing
        parts.append(
            "CAST(sum(CAST(concat('0x', substr(md5(" + canon + "), 1, 8)) "
            f'AS BIGINT)) AS BIGINT) AS "{name}"'
        )
    got = con.execute(f"SELECT {', '.join(parts)} FROM ({sql}) t").df()
    return {c: (None if got[c].isna()[0] else int(got[c][0])) for c in got.columns}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01", help="testdata dir name")
    ap.add_argument("--data-root", default="/root/testdata")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--no-aqe", action="store_true")
    ap.add_argument(
        "--driver-memory",
        default=None,
        help="JVM heap for the local session (default: Spark's 1g — "
        "the vanilla driver gate, fine for sf0.01. Size it for FULL "
        "sweeps at sf0.1+ (4g measured sufficient at sf0.1; the "
        "accumulated 195-query session state alone can tip a 1g "
        "heap) and for >= sf1 runs, the documented local-heap cliff "
        "in SCALING.md §4)",
    )
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--only", default=None, help="comma-separated names")
    ap.add_argument(
        "--duck-mem",
        default=None,
        help="DuckDB memory_limit (e.g. 32GB) + disk spill. Set this "
        "on big-SF sweeps: DuckDB's default limit (80%% of RAM) "
        "assumes it owns the box, and a large Spark driver heap "
        "starves it into 'bad allocation' failures on the oracle "
        "side (observed at sf10 with a 100g heap).",
    )
    ap.add_argument(
        "--digest-over",
        type=int,
        default=500_000,
        help="results with more rows than this are compared by "
        "distributed order-invariant digest (count + per-column "
        "md5-prefix sums) instead of collecting — the verification "
        "form that scales past spark.driver.maxResultSize. Digest "
        "compare is type-canonicalizing (everything hashes as a "
        "string), so dtype-class strictness only applies below the "
        "threshold. Default 500000: sf0.01 sweeps (max result 60k "
        "rows) stay fully collect/dtype-strict like the driver, "
        "while sf0.1+ sweeps digest the handful of fact-sized "
        "results routinely (the round-5 sf10 TMM trim boundary was "
        "found by exactly this compare). 0 = always collect.",
    )
    ap.add_argument(
        "--master",
        default=None,
        help="override the master (e.g. local-cluster[2,8,4096] to "
        "sweep across a real executor-to-executor serialization "
        "boundary; default local[--threads])",
    )
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="extra Spark conf, repeatable — the execution-shape "
        "perturbation hook (e.g. spark.sql.codegen.wholeStage=false, "
        "spark.sql.execution.arrow.maxRecordsPerBatch=7, "
        "spark.sql.session.timeZone=America/New_York). A query whose "
        "answer CHANGES under any of these has a config-dependent "
        "contract — the single-box analogue of shipping it to a "
        "cluster tuned differently",
    )
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    b = SparkSession.builder.master(args.master or f"local[{args.threads}]")
    if args.master and args.master.startswith("local-cluster"):
        # Worker JVMs get the master-string allowance (MB); leave
        # headroom for overhead so executors actually launch.
        try:
            worker_mb = int(args.master.rstrip("]").split(",")[-1])
        except ValueError:
            worker_mb = 1024
        b = b.config(
            "spark.executor.memory", f"{max(worker_mb - 512, 512)}m"
        )
    if args.driver_memory:
        b = b.config("spark.driver.memory", args.driver_memory)
    if args.no_aqe:
        b = b.config("spark.sql.adaptive.enabled", "false")
    if args.shuffle_partitions:
        b = b.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    for kv in args.conf:
        k, sep, v = kv.partition("=")
        if not sep or not k:
            print(f"bad --conf (expected KEY=VALUE): {kv!r}", file=sys.stderr)
            return 2
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = f"{args.data_root}/{args.sf}"
    con = duckdb.connect()
    if args.duck_mem:
        con.execute(f"SET memory_limit='{args.duck_mem}'")
        # a KILLED sweep leaves its spill behind (observed: 50 GB of
        # orphans from an aborted sf1 sweep later failed an unrelated
        # Spark shuffle with ENOSPC) — reclaim before spilling anew.
        # Spill dirs are per-pid so a second concurrent sweep cannot
        # delete a live one out from under the first (ADVICE r6);
        # only siblings whose owning pid is dead are stale.
        import glob
        import shutil

        for stale in glob.glob("/tmp/duckdb_spill.*"):
            try:
                pid = int(stale.rsplit(".", 1)[1])
            except ValueError:
                continue
            # liveness alone is not enough: a recycled pid would make
            # a dead sweep's 50 GB look owned forever — require the
            # live process to actually BE an oracle_sweep run.
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as fh:
                    cmdline = fh.read()
            except OSError:
                cmdline = b""  # pid gone
            if b"oracle_sweep" not in cmdline:
                shutil.rmtree(stale, ignore_errors=True)
        shutil.rmtree("/tmp/duckdb_spill", ignore_errors=True)  # legacy name
        spill_dir = f"/tmp/duckdb_spill.{os.getpid()}"
        con.execute(f"SET temp_directory='{spill_dir}'")
    for t in TABLES:
        # driver testdata = single files; tools/make_scaled_sf.py
        # output = Spark directory-of-parts — glob the latter
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import __spark_entry__ as entry

    queries, oracles = entry.queries(), entry.oracle_sql()
    names = sorted(oracles)
    if args.only:
        names = [n for n in args.only.split(",") if n in oracles]
    fails = []
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            digested = False
            if args.digest_over > 0:
                # ONE plan execution regardless of path: persist the
                # result, let count() materialize it, then digest OR
                # collect from the cache (the old count-then-digest
                # form executed large plans twice). DISK_ONLY, not
                # MEMORY_AND_DISK: cached blocks under
                # spark.memory.storageFraction are UNEVICTABLE, so a
                # heap-resident cache steals execution memory from
                # the very plan materializing it — measured as a
                # driver-JVM OOM on the heaviest sf0.1 query under
                # the default 1g heap. Disk blocks cost one local
                # write/read and compete with nothing.
                from pyspark.storagelevel import StorageLevel

                df = df.persist(StorageLevel.DISK_ONLY)
                n = df.count()
                if n > args.digest_over:
                    digested = True
                    g = _spark_digest(df)
                    w = _duck_digest(con, oracles[name])
                    ok = g == w
                    if not ok:
                        diff = {
                            k: (g.get(k), w.get(k))
                            for k in set(g) | set(w)
                            if g.get(k) != w.get(k)
                        }
                        print(f"     digest diff: {diff}")
            if not digested:
                got = df.toPandas()
                want = con.execute(oracles[name]).df()
                n = len(got)
                ok = compare(got, want, pd)
            if args.digest_over > 0:
                df.unpersist()
            # Between-query hygiene: drop any cache a query left
            # behind (e.g. the persist-reuse op) so 195 queries'
            # leftovers can't accumulate into a heap cliff late in
            # the sweep — the full sf0.1 sweep on the default 1g
            # heap OOM'd at query #63 from exactly this buildup,
            # while the same query passed in isolation.
            spark.catalog.clearCache()
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"ERR  {name}: {str(ex)[:150]}", flush=True)
            try:  # drop the result cache if we persisted before dying
                df.unpersist()
            except Exception:  # noqa: BLE001 — df may not exist yet
                pass
            try:  # dead gateway? every later query would ERR too —
                spark.range(1).count()  # abort with ONE honest line
            except Exception:  # noqa: BLE001
                print(
                    "FATAL: Spark JVM is gone (above error killed it); "
                    f"aborting sweep at {name} — remaining queries "
                    "NOT checked",
                    flush=True,
                )
                remaining = names[names.index(name) + 1 :]
                fails.extend(remaining)
                break
            continue
        dt = time.time() - t0
        if not ok:
            fails.append(name)
        tag = "OK  " if ok else "FAIL"
        print(
            f"{tag} {name} rows={n} "
            f"({dt:.1f}s{', digest' if digested else ''})",
            flush=True,
        )
    print(f"checked {len(names)} | FAILS: {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
