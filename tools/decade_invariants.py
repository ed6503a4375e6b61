#!/usr/bin/env python
"""Closed-form scale-invariant verification for decade fixtures
beyond the SQL oracle's ceiling.

DuckDB OOMs on the dedup-family twins at sf10 and cannot touch sf100
at all (BASELINE.md "value-verification at sf10") — so past sf1 the
oracle stops being the verifier. But the derived decade fixtures
(tools/make_scaled_sf.py) have a property the real generator lacks:
each of the k copies is VALUE-identical to the sf0.1 base (keys
shifted, text perturbed — numeric payloads untouched), and copies
are mutually text-disjoint (verified: distinct-text count = exactly
k x base's). That gives many headline queries *closed-form expected
results* derivable from the cheap sf0.1 run:

* ``identity`` — global aggregates over unshifted dimensions are
  EXACTLY the sf0.1 result: per-gene mean over k replicas is the
  same rational number (genes = l_partkey, never shifted), so rows
  AND every column digest must match the sf0.1 run's.
* ``replica`` — per-entity results where the entity key is shifted
  per copy: copy i's sample/user rows are value-identical to the
  base entity's. The sweep digest (oracle_sweep._spark_digest) is a
  per-column SUM of md5 prefixes, i.e. additive over multiset union
  — so for every non-key column, digest(big) must equal EXACTLY
  k x digest(small), and rows(big) = k x rows(small). Shifted key
  columns (and content-hash columns over perturbed text) are
  excluded by name; everything else is asserted bit-for-bit at the
  digest's 6dp canonicalization.
* ``rows_factor`` — only the row count is closed-form (k x); value
  columns depend on cross-copy estimation internals.
* ``wall_only`` — no closed form (approximate/hash-randomized
  algorithms: per-copy MinHash signatures differ by construction);
  recorded for the scaling curve, nothing asserted.

Why this is a real verification and not a tautology: the big-side
run executes the full distributed plan — shuffles, AQE re-plans,
spills, codegen over k x the rows — and the invariant pins its
600M-row output against an independently computed expectation. Any
lost/duplicated row (shuffle fetch, retry, spill corruption), any
value drifting past 6dp (accumulation-order bugs, overflow), any
dropped group breaks an exact integer equality. What it does NOT
check: bugs that are themselves replica-equivariant (a wrong
constant applied uniformly per entity) — those are the oracle's job
at sf0.01..sf1, which every one of these queries already passes.

Usage::

    python tools/decade_invariants.py --big /root/repo/.scratch/sf1 --factor 10
    SPARK_GRAFT_DRIVER_MEM=100g python tools/decade_invariants.py \
        --big /root/repo/.scratch/sf100 --factor 1000

Prints one JSON line per query plus a summary; exit 1 on any failed
assertion.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# mode + excluded columns (shifted keys / perturbed-content hashes).
# Inclusion rationale per query lives in the assertions' comments.
CHECKS: dict[str, dict] = {
    # Genes (l_partkey) are an unshifted bounded dimension; the mean
    # over k value-identical replicas is the same rational number.
    "op_agg_01_per_gene_mean": {"mode": "identity"},
    # Quantile over the (identical) per-gene means — 1 row.
    "op_agg_03_scalar_quantile": {"mode": "identity"},
    # Per-sample q75/sum: each copy's sample rows are value-identical
    # to the base sample's, so factors replicate; sample_id shifts.
    "op_agg_04_uq_factor": {"mode": "replica", "exclude": ["sample_id"]},
    # Full UQ normalizer. History: through round 6 the registered
    # query used the RAW geomean, and the mean of 147M replicated
    # logs drifts from the mean of 147k in the last ulp — that
    # constant multiplies every output row, and at sf100 (k=1000) it
    # pushed 4 of 600,000 base rows across a 6dp rounding boundary
    # (a boundary_flips budget priced it). Round 7: the registered
    # twin adopted geomean_quantize=6 (floor-bucketed log-mean, same
    # contract shape as TMM's trim_quantize), which pins the
    # constant across aggregation orders — so the check is back to
    # STRICT digest equality; op_ml_01_uq_raw keeps the raw
    # reference semantics oracle-checked at small SF.
    "op_ml_01_upper_quartile": {
        "mode": "replica",
        "exclude": ["sample_id"],
    },
    # TMM: the gene-level reference is percentile_cont over the
    # POOLED samples, and an interpolated percentile of a
    # k-replicated multiset legitimately differs from the base's
    # (position p*(k*n-1) lands inside a repeated block; measured at
    # sf1: scaling_factor digest off by ~0.2%, i.e. a small fraction
    # of samples shift by one interpolation gap). Only the row count
    # (one factor per sample) is closed-form.
    "op_ml_02_tmm": {"mode": "rows_factor"},
    # Exact dedup groups: copies are mutually text-disjoint, so
    # groups never merge across copies; group sizes (n) replicate.
    # text_hash hashes perturbed text; keep_id shifts.
    "op_llm_01_exact_dedup": {
        "mode": "replica",
        "exclude": ["text_hash", "keep_id"],
    },
    # Per-user bounded-frame percentile: user series replicate.
    "op_win_05_rolling_p95": {
        "mode": "replica",
        "exclude": ["event_id", "user_id"],
    },
    # Per-user cumulative sum in event order: series replicate.
    "op_win_03_running_total": {
        "mode": "replica",
        "exclude": ["event_id", "user_id"],
    },
    # MinHash-LSH: per-copy signatures hash perturbed shingles, so
    # per-copy pair sets legitimately differ from the base's — no
    # closed form; recorded for the wall-clock curve only.
    "op_llm_02_minhash_lsh": {"mode": "wall_only"},
    # Maximal curation composite: the bigram-LM fluency gate is
    # FITTED on the (per-copy perturbed) corpus, so gate decisions
    # legitimately differ per copy — no closed form (measured at
    # sf1: 0 survivors at sf0.1, 3 at sf1). Wall-clock only.
    "op_llm_08_curation_max": {"mode": "wall_only"},
    # Continual-crawl admission composite: the corpus/batch split is
    # doc_id % 10 and key shifts are powers of ten (stride preserves
    # the residue); admission tests content-hash membership, which
    # never crosses copies (texts mutually disjoint) — so admitted
    # rows replicate. doc_id shifts; text_hash hashes perturbed text.
    "op_llm_08_incremental_ingest": {
        "mode": "replica",
        "exclude": ["doc_id", "text_hash"],
    },
}


def _stage_snapshot(spark) -> tuple[int, dict]:
    """(max stage id seen, {stageId: metrics}) from the live UI's
    status API. The engine session disables the UI (session.py); the
    decade runner re-enables it so each big-side run can be diffed
    for shuffle-write/spill bytes — the memory-curve numbers a 100 TB
    extrapolation needs (VERDICT r6 item 7). Returns (-1, {}) when
    the UI is off (telemetry then reads null, never crashes a run)."""
    import json as _json
    import urllib.request

    url = spark.sparkContext.uiWebUrl
    if not url:
        return -1, {}
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{app_id}/stages", timeout=10
        ) as r:
            stages = _json.load(r)
    except OSError:
        return -1, {}
    out = {}
    for s in stages:
        # key by (stageId, attemptId): the endpoint lists one entry
        # per stage ATTEMPT, and a retried stage's real bytes (both
        # attempts did real work) must not overwrite each other.
        out[(s["stageId"], s.get("attemptId", 0))] = {
            "shuffle_write_b": s.get("shuffleWriteBytes", 0),
            "shuffle_read_b": s.get("shuffleReadBytes", 0),
            "spill_mem_b": s.get("memoryBytesSpilled", 0),
            "spill_disk_b": s.get("diskBytesSpilled", 0),
            "input_b": s.get("inputBytes", 0),
        }
    return (max(k[0] for k in out) if out else -1), out


def _stage_delta(spark, prev_max: int) -> dict | None:
    """Sum stage metrics for stages submitted after ``prev_max``.
    Stage ids are monotone within an app, so id > prev_max is exactly
    the work of the bracketed query (UI retention default 1000 stages
    comfortably exceeds any single query here)."""
    cur_max, stages = _stage_snapshot(spark)
    if cur_max < 0 and not stages:
        return None
    mb = 1024.0 * 1024.0
    tot = {"shuffle_write_b": 0, "shuffle_read_b": 0, "spill_mem_b": 0,
           "spill_disk_b": 0, "input_b": 0}
    for (sid, _attempt), m in stages.items():
        if sid > prev_max:
            for k in tot:
                tot[k] += m[k]
    return {
        "shuffle_write_mb": round(tot["shuffle_write_b"] / mb, 1),
        "shuffle_read_mb": round(tot["shuffle_read_b"] / mb, 1),
        "spill_mem_mb": round(tot["spill_mem_b"] / mb, 1),
        "spill_disk_mb": round(tot["spill_disk_b"] / mb, 1),
        "input_mb": round(tot["input_b"] / mb, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", required=True)
    ap.add_argument("--factor", type=int, required=True)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma list; default = every query in CHECKS",
    )
    args = ap.parse_args()

    from oracle_sweep import _spark_digest

    import __spark_entry__ as entry
    from gexp_ml_dask_spark.session import get_spark

    spark = get_spark(
        app_name="decade_invariants",
        # UI on for this runner only: the stage status API is where
        # the per-query shuffle/spill telemetry comes from.
        extra_configs={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = args.queries.split(",") if args.queries else list(CHECKS)
    unknown = [n for n in names if n not in CHECKS or n not in qs]
    if unknown:  # a typo in a long --queries list → usable error, not a KeyError
        print(
            f"unknown query name(s): {', '.join(unknown)}; "
            f"choose from: {', '.join(sorted(CHECKS))}",
            file=sys.stderr,
        )
        return 2
    k = args.factor
    failures = 0
    out = {}
    for name in names:
        cfg = CHECKS[name]
        mode = cfg["mode"]
        excl = set(cfg.get("exclude", ()))
        prev_max, _ = _stage_snapshot(spark)
        t0 = time.time()
        big = _spark_digest(qs[name](spark, args.big))
        wall_big = time.time() - t0
        telemetry = _stage_delta(spark, prev_max)
        spark.catalog.clearCache()
        rec = {"mode": mode, "wall_big_s": round(wall_big, 1)}
        if telemetry is not None:
            rec["telemetry_big"] = telemetry
        if mode == "wall_only":
            rec["rows_big"] = big["__n"]
            rec["ok"] = True
        else:
            t0 = time.time()
            small = _spark_digest(qs[name](spark, args.small))
            rec["wall_small_s"] = round(time.time() - t0, 1)
            spark.catalog.clearCache()
            mult = 1 if mode == "identity" else k
            rec["rows_small"] = small["__n"]
            rec["rows_big"] = big["__n"]
            ok = big["__n"] == small["__n"] * mult
            diffs = {} if ok else {"__n": (big["__n"], small["__n"] * mult)}
            if mode in ("identity", "replica"):
                budget = cfg.get("boundary_flips", 0)
                for col, v in small.items():
                    if col == "__n" or col in excl:
                        continue
                    want = (v * mult) if v is not None else None
                    got = big.get(col)
                    if got == want:
                        continue
                    # A declared FP-boundary budget: each 6dp flip
                    # swaps one md5 prefix (< 2^32), so the digest
                    # drift bounds how many rows can have moved.
                    if (
                        budget
                        and got is not None
                        and want is not None
                        and abs(got - want) <= budget * (2**32 - 1)
                    ):
                        rec.setdefault("boundary_drift", {})[col] = {
                            "digest_diff": got - want,
                            "min_flipped_rows": int(
                                -(-abs(got - want) // (2**32 - 1))
                            ),
                            "budget_rows": budget,
                        }
                        continue
                    ok = False
                    diffs[col] = (got, want)
            rec["ok"] = ok
            if diffs:
                rec["diffs"] = {c: [g, w] for c, (g, w) in diffs.items()}
        out[name] = rec
        if not rec["ok"]:
            failures += 1
        print(json.dumps({name: rec}), flush=True)
    print(
        json.dumps(
            {
                "summary": {
                    "big": args.big,
                    "factor": k,
                    "checked": len(names),
                    "failed": failures,
                }
            }
        )
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
