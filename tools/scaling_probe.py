"""Low-core vs high-core scaling record at a data-dominated scale.

VERDICT r8 item 3: at sf0.1 the headline suite is dispatch-bound
(60-107 ms fixed cost per job swamps per-core data work), so the
driver's 8-core/32-core ratio sits near 1 and trips its
``suspect_cpus_ignored`` heuristic even though ``local[$CPUS]`` is
honored. The fix is evidence at a scale where per-core work dominates:
run the heaviest queries on the sf1 fixture (tools/make_scaled_sf.py)
at two core counts and record the ratios.

Usage::

    python tools/make_scaled_sf.py                      # once, ~min
    SPARK_GRAFT_CPUS=8  python tools/scaling_probe.py --out a.json
    SPARK_GRAFT_CPUS=32 python tools/scaling_probe.py --out b.json

Each run prints/writes {query: min_of_N_sec} plus the session's cpus;
compare the two files for the scaling block. The measurement recipe is
bench.py's (min-of-N full plan->execute->drain, noop sink, cache
cleared between repeats).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_QUERIES = [
    "op_ml_02_tmm",
    "op_ml_01_upper_quartile",
    "op_llm_02_minhash_lsh",
    "op_llm_04_bpe_tokenize",
    "op_join_07_fuzzy",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf1"
        ),
    )
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from gexp_ml_dask_spark.queries import QUERIES
    from gexp_ml_dask_spark.session import get_spark

    names = args.queries or DEFAULT_QUERIES
    spark = get_spark(app_name="scaling_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    QUERIES["op_agg_01_per_gene_mean"](spark, args.sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    rec = {
        "sf_dir": args.sf_dir,
        "cpus": spark.sparkContext.defaultParallelism,
        "repeats": args.repeats,
        "timings": {},
    }
    for name in names:
        best = float("inf")
        for _ in range(args.repeats):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        rec["timings"][name] = round(best, 3)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)
    spark.stop()
    text = json.dumps(rec, indent=1)
    print(text)
    if args.out:
        Path(args.out).write_text(text + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
