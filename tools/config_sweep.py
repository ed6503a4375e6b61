"""Execution-shape perturbation battery over the full oracle registry.

The scale sweeps (sf1 -> sf10 -> sf100) kept finding contracts that
were accidentally SCALE-dependent (round 6: the streaming layout bug;
round 7: the rollup ULP and top-k tie boundary). This tool hunts the
sibling class: contracts that are accidentally CONFIG- or
LAYOUT-dependent — answers that change when the session is tuned the
way a different cluster would tune it. On one box that means running
the entire value-oracled registry (tools/oracle_sweep.py, vanilla
driver-style session) under each perturbed shape, in a FRESH JVM per
shape (subprocess, so confs can't bleed between shapes):

- ``codegen-off``    — wholeStage codegen disabled: every expression
  evaluates interpreted. Any answer change means a result depended on
  codegen-specific evaluation order (classic float-sum trap).
- ``arrow-tiny``     — Arrow batches capped at 7 records: every
  mapInPandas / applyInPandas / pandas_udf sees many tiny batches.
  Any change means a UDF assumed "one batch == one partition" — the
  exact assumption a real cluster breaks first.
- ``tz-newyork``     — session timezone America/New_York (DuckDB
  oracle stays fixed): any change means an answer is a function of
  the session clock, not the data. A fleet never shares a timezone.
- ``shuffle-1``      — ONE shuffle partition, AQE off: everything
  that shuffles lands in a single task. Flushes out contracts that
  only hold because keys happen to spread across 32 partitions
  (per-partition RNG, first-seen aggregates, partition-local ids).
- ``shuffle-7-noaqe``— 7 partitions (prime, != any fixture file
  count), AQE off: the round-3 regression shape, kept in the battery
  so it can't silently come back.
- ``local-cluster``  — real worker JVMs (local-cluster[2,4,4096]):
  every closure, broadcast, and Arrow batch crosses a genuine
  executor serialization boundary. The full-registry upgrade of the
  round-6 streaming smoke.

Every shape must report the registry bit-identical to the DuckDB
oracle. Exit 1 if any shape fails any query; per-shape logs land
next to the summary JSON.

Usage::

    python tools/config_sweep.py                      # full battery, sf0.01
    python tools/config_sweep.py --shapes tz-newyork,arrow-tiny
    python tools/config_sweep.py --only op_llm_05_tumbling_window
    python tools/config_sweep.py --out /tmp/config_sweep
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SHAPES: dict[str, list[str]] = {
    "codegen-off": ["--conf", "spark.sql.codegen.wholeStage=false"],
    "arrow-tiny": [
        "--conf",
        "spark.sql.execution.arrow.maxRecordsPerBatch=7",
    ],
    "tz-newyork": [
        "--conf",
        "spark.sql.session.timeZone=America/New_York",
    ],
    "shuffle-1": ["--shuffle-partitions", "1", "--no-aqe"],
    "shuffle-7-noaqe": ["--shuffle-partitions", "7", "--no-aqe"],
    "local-cluster": [
        "--master",
        "local-cluster[2,4,4096]",
        # worker JVMs are 4 GB; the driver heap still needs room for
        # the collected results + the 195-query session state
        "--driver-memory",
        "4g",
    ],
}

_LINE = re.compile(r"^(OK|FAIL|ERR)\s+(\S+)")


def run_shape(
    name: str, extra: list[str], sf: str, only: str | None, out_dir: Path
) -> dict:
    log_path = out_dir / f"{name}.log"
    cmd = [
        sys.executable,
        str(REPO / "tools" / "oracle_sweep.py"),
        "--sf",
        sf,
        *extra,
    ]
    if only:
        cmd += ["--only", only]
    t0 = time.time()
    with open(log_path, "w") as log:
        rc = subprocess.call(
            cmd, stdout=log, stderr=subprocess.STDOUT, cwd=str(REPO)
        )
    wall = round(time.time() - t0, 1)
    ok = fails = errs = 0
    failed: list[str] = []
    for line in log_path.read_text().splitlines():
        m = _LINE.match(line)
        if not m:
            continue
        tag, qname = m.group(1), m.group(2)
        if tag == "OK":
            ok += 1
        elif tag == "FAIL":
            fails += 1
            failed.append(qname)
        else:
            errs += 1
            failed.append(qname.rstrip(":"))
    return {
        "shape": name,
        "args": extra,
        "rc": rc,
        "wall_s": wall,
        "ok": ok,
        "fail": fails,
        "err": errs,
        "failed": failed,
        "log": str(log_path),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument(
        "--shapes",
        default=None,
        help=f"comma list; default = all of: {', '.join(SHAPES)}",
    )
    ap.add_argument("--only", default=None, help="forwarded to oracle_sweep")
    ap.add_argument("--out", default="/tmp/config_sweep")
    args = ap.parse_args()

    names = args.shapes.split(",") if args.shapes else list(SHAPES)
    unknown = [n for n in names if n not in SHAPES]
    if unknown:
        print(
            f"unknown shape(s): {', '.join(unknown)}; "
            f"choose from: {', '.join(SHAPES)}",
            file=sys.stderr,
        )
        return 2

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    results = []
    for name in names:
        print(f"== shape {name} ({' '.join(SHAPES[name])}) ==", flush=True)
        r = run_shape(name, SHAPES[name], args.sf, args.only, out_dir)
        print(
            f"   rc={r['rc']} ok={r['ok']} fail={r['fail']} err={r['err']} "
            f"wall={r['wall_s']}s"
            + (f" failed={r['failed']}" if r["failed"] else ""),
            flush=True,
        )
        results.append(r)

    summary = {
        "sf": args.sf,
        "shapes": results,
        "all_green": all(r["rc"] == 0 for r in results),
    }
    summary_path = out_dir / "summary.json"
    summary_path.write_text(json.dumps(summary, indent=2))
    print(f"summary: {summary_path}")
    print(json.dumps({r["shape"]: r["rc"] for r in results}))
    return 0 if summary["all_green"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
