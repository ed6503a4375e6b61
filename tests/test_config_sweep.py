"""Pin the execution-shape perturbation battery (tools/config_sweep.py).

The battery's evidence value rests on (a) the per-shape log parser
actually counting OK/FAIL/ERR lines — a regex rot would silently
report 0 failures on a failing sweep — and (b) the shapes staying
runnable end-to-end. (a) is pinned as pure unit checks; (b) by one
real subprocess run of the cheapest shape over a two-query slice at
sf0.001 (seconds, one JVM), asserting the summary JSON the judge
reads is written and green.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from config_sweep import _LINE, SHAPES  # noqa: E402


def test_line_regex_counts_every_tag():
    ok = _LINE.match("OK   op_agg_01_per_gene_mean rows=500 (1.2s)")
    assert ok and ok.group(1) == "OK"
    fail = _LINE.match("FAIL op_agg_11_rollup rows=36 (0.8s, digest)")
    assert fail and fail.group(2) == "op_agg_11_rollup"
    err = _LINE.match("ERR  op_llm_05_sessions: Py4JJavaError ...")
    assert err and err.group(1) == "ERR"
    # progress-bar junk and summary lines must NOT count
    assert _LINE.match("[Stage 12:=====>      (3 + 5) / 8]") is None
    assert _LINE.match("checked 197 | FAILS: []") is None


def test_every_shape_has_wellformed_args():
    valued = {"--conf", "--shuffle-partitions", "--master", "--driver-memory"}
    flags = {"--no-aqe"}
    for name, extra in SHAPES.items():
        assert extra, name
        i = 0
        while i < len(extra):
            tok = extra[i]
            assert tok in valued | flags, (name, tok)
            if tok in valued:
                assert i + 1 < len(extra) and not extra[i + 1].startswith(
                    "--"
                ), (name, tok)
                if tok == "--conf":
                    assert "=" in extra[i + 1], (name, extra[i + 1])
                i += 2
            else:
                i += 1


def test_battery_end_to_end_one_shape(tmp_path):
    out = str(tmp_path / "battery")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "config_sweep.py"),
            "--sf",
            "sf0.001",
            "--shapes",
            "shuffle-7-noaqe",
            "--only",
            "op_agg_01_per_gene_mean,op_fil_04_semi_join",
            "--out",
            out,
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["all_green"] is True
    (shape,) = summary["shapes"]
    assert shape["shape"] == "shuffle-7-noaqe"
    assert shape["ok"] == 2 and shape["fail"] == 0 and shape["err"] == 0


def test_unknown_shape_is_a_usable_error():
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "config_sweep.py"),
            "--shapes",
            "no-such-shape",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=60,
    )
    assert r.returncode == 2
    assert "no-such-shape" in r.stderr
