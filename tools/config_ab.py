"""Session-config A/B over headline queries, dispatch-noise aware.

OPTIMIZATION_r08.md deferred two config levers because they cannot be
resolved under heavy host dispatch noise: the shuffle compression
codec (lz4 -> zstd, guide §2.3) and the join-strategy preference
(``spark.sql.join.preferSortMergeJoin=false`` + AQE's
shuffled-hash-join rewrite threshold, guide §3.1). This tool measures
both honestly:

- each variant runs in a FRESH JVM (subprocess) so codecs/planner
  flags cannot bleed between variants;
- variants are INTERLEAVED round-robin (A B C, A B C, ...) so a
  drifting host charges every variant the same drift, and the final
  number per (variant, query) is the min across rounds — the same
  min-of-N convention as bench.py;
- every subprocess records the trivial-job dispatch overhead
  (bench.py's probe) so a poisoned round is visible in the artifact;
- the engine's own ``get_spark()`` builds the session, with the
  variant applied via ``extra_configs`` — exactly how a cluster
  deployment would apply it (no code fork).

The variants change PHYSICAL execution only (codec bytes, join
operator choice); results stay bit-identical by construction, and a
row-count cross-check per query asserts it anyway.

Usage::

    python tools/config_ab.py                       # default battery
    python tools/config_ab.py --rounds 3 --repeats 3
    python tools/config_ab.py --queries op_ml_02_tmm,op_join_07_fuzzy
    python tools/config_ab.py --out plans/r08/config_ab.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Shuffle-heavy + join-heavy headline subset: big exchanges (codec
# lever) and non-broadcast joins (SHJ lever).
DEFAULT_QUERIES = [
    "op_ml_02_tmm",
    "op_ml_01_upper_quartile",
    "op_llm_02_minhash_lsh",
    "op_src_07_pivot_long_to_wide",
    "op_agg_14_coexpression",
    "op_llm_02_dup_ngram_spans",
    "op_join_07_fuzzy",
    "op_llm_04_nb_quality",
    "op_agg_18_cohort_retention",
]

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "zstd": {"spark.io.compression.codec": "zstd"},
    "shj": {
        "spark.sql.join.preferSortMergeJoin": "false",
        # AQE's runtime SMJ->SHJ rewrite is off until this is set; the
        # 64 MB advisory partition size bounds each build side.
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(
            128 * 1024 * 1024
        ),
    },
}

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["AB_REPO"])
from __spark_entry__ import queries
from gexp_ml_dask_spark.session import get_spark
from bench import spark_job_overhead_ms

extra = json.loads(os.environ["AB_EXTRA"])
names = json.loads(os.environ["AB_QUERIES"])
repeats = int(os.environ["AB_REPEATS"])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="config_ab", extra_configs=extra)
reg = queries()
# warm-up (classloading/codegen) outside every timed window
spark.range(1_000_000).selectExpr("sum(id)").collect()
reg["op_agg_01_per_gene_mean"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()
job_ms = spark_job_overhead_ms(spark)

out = {"job_overhead_ms": job_ms, "timings": {}, "rows": {}}
for name in names:
    fn = reg[name]
    best = float("inf")
    for _ in range(repeats):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    out["timings"][name] = round(best, 3)
    out["rows"][name] = fn(spark, sf_dir).count()
    spark.catalog.clearCache()
print("AB_RESULT " + json.dumps(out))
spark.stop()
"""


def run_variant(
    variant: str, extra: dict, queries: list[str], repeats: int
) -> dict:
    env = dict(os.environ)
    env["AB_EXTRA"] = json.dumps(extra)
    env["AB_QUERIES"] = json.dumps(queries)
    env["AB_REPEATS"] = str(repeats)
    env["AB_REPO"] = str(REPO)
    proc = subprocess.run(
        [sys.executable, "-c", WORKER],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(REPO),
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"variant {variant} produced no result; stderr tail:\n"
        + proc.stderr[-2000:]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.rounds < 1:
        ap.error("--rounds must be >= 1")

    names = args.queries.split(",")
    variants = {v: VARIANTS[v] for v in args.variants.split(",")}
    record: dict = {
        "queries": names,
        "rounds": args.rounds,
        "repeats": args.repeats,
        "variants": {v: {"configs": c, "rounds": []} for v, c in variants.items()},
        "loadavg_start": os.getloadavg()[0],
    }
    best: dict[str, dict[str, float]] = {v: {} for v in variants}
    rows_seen: dict[str, dict[str, int]] = {}
    for rnd in range(args.rounds):
        for v, extra in variants.items():
            t0 = time.time()
            res = run_variant(v, extra, names, args.repeats)
            record["variants"][v]["rounds"].append(res)
            for q, s in res["timings"].items():
                best[v][q] = min(best[v].get(q, float("inf")), s)
            # Row-count cross-check EVERY round (not only the first:
            # setdefault let later-round drift pass silently), and a
            # real exception rather than an assert that python -O
            # strips (ADVICE r8).
            if v in rows_seen and rows_seen[v] != res["rows"]:
                raise RuntimeError(
                    f"row-count drift in variant {v} round {rnd + 1}: "
                    f"{res['rows']} vs {rows_seen[v]}"
                )
            rows_seen[v] = res["rows"]
            print(
                f"# round {rnd + 1} {v}: job_ms={res['job_overhead_ms']} "
                f"sum={sum(res['timings'].values()):.2f}s "
                f"({time.time() - t0:.0f}s wall)",
                file=sys.stderr,
            )
    base_rows = next(iter(rows_seen.values()))
    for v, rr in rows_seen.items():
        if rr != base_rows:
            raise RuntimeError(
                f"row-count drift in variant {v}: {rr} vs {base_rows}"
            )
    record["best"] = best
    # Denominator variant: 'base' when present, else the FIRST listed
    # variant — and it is skipped in the summary either way (its own
    # all-1.0 ratio entry was a misleading artifact, ADVICE r8).
    base_name = "base" if "base" in best else next(iter(best))
    base = best[base_name]
    summary = {}
    for v in best:
        if v == base_name:
            continue
        ratios = {q: round(best[v][q] / base[q], 3) for q in base if base[q] > 0}
        gm = 1.0
        for r in ratios.values():
            gm *= r
        gm **= 1.0 / max(len(ratios), 1)
        summary[v] = {"geomean_vs_base": round(gm, 3), "ratios": ratios}
    record["summary"] = summary
    line = json.dumps({"metric": "config_ab", "summary": summary})
    print(line)
    if args.out:
        Path(args.out).write_text(json.dumps(record, indent=1) + "\n")
        print(f"# full record: {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
