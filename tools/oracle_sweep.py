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
        "the vanilla driver gate; size it for >= sf1 runs, the "
        "documented local-heap cliff in SCALING.md §4)",
    )
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--only", default=None, help="comma-separated names")
    ap.add_argument(
        "--master",
        default=None,
        help="override the master (e.g. local-cluster[2,8,4096] to "
        "sweep across a real executor-to-executor serialization "
        "boundary; default local[--threads])",
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
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = f"{args.data_root}/{args.sf}"
    con = duckdb.connect()
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
            got = queries[name](spark, sf_dir).toPandas()
            want = con.execute(oracles[name]).df()
            ok = compare(got, want, pd)
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"ERR  {name}: {str(ex)[:150]}", flush=True)
            continue
        dt = time.time() - t0
        if not ok:
            fails.append(name)
        print(
            f"{'OK  ' if ok else 'FAIL'} {name} rows={len(got)} "
            f"({dt:.1f}s)",
            flush=True,
        )
    print(f"checked {len(names)} | FAILS: {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
