"""The scaler + closed-form-invariant pipeline, end-to-end at toy
scale.

The sf100 decade evidence (SCALING.md §2d) rests on two tools:
``tools/make_scaled_sf.py`` (k value-identical copies, shifted keys,
perturbed text) and ``tools/decade_invariants.py`` (identity /
exact-k-multiple digest assertions). This pins the whole pipeline on
a factor-2 fixture derived from sf0.001 in seconds, so a regression
in either tool (key-shift arithmetic, perturbation disjointness, the
digest-multiple math, the boundary-budget path) fails the default
suite instead of only surfacing in an hours-long big-fixture
session.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale") / "sf2x")
    env = dict(
        os.environ,
        SCALE_COPIES="2",
        SRC_SF_DIR=SRC_SF,
        OUT_SF_DIR=out,
        SPARK_GRAFT_CPUS="8",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_scaled_sf.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return out


def test_scaled_fixture_invariants_hold(scaled_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "decade_invariants.py"),
            "--small",
            SRC_SF,
            "--big",
            scaled_dir,
            "--factor",
            "2",
            "--queries",
            "op_agg_01_per_gene_mean,op_agg_04_uq_factor,"
            "op_llm_01_exact_dedup,op_win_03_running_total",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    lines = [json.loads(l) for l in r.stdout.strip().splitlines()]
    summary = lines[-1]["summary"]
    assert summary["checked"] == 4 and summary["failed"] == 0
    by_name = {k: v for d in lines[:-1] for k, v in d.items()}
    # identity: same rows; replica: exactly 2x rows
    assert (
        by_name["op_agg_01_per_gene_mean"]["rows_big"]
        == by_name["op_agg_01_per_gene_mean"]["rows_small"]
    )
    for q in (
        "op_agg_04_uq_factor",
        "op_llm_01_exact_dedup",
        "op_win_03_running_total",
    ):
        assert by_name[q]["rows_big"] == 2 * by_name[q]["rows_small"]


def test_scaled_fixture_detects_corruption(scaled_dir, tmp_path):
    """The invariant must actually FAIL on a corrupted fixture —
    otherwise the sf100 green means nothing. Copy the scaled events
    table, drop one row, and expect a nonzero exit."""
    import duckdb

    bad = str(tmp_path / "sf2x_bad")
    os.makedirs(bad)
    for t in os.listdir(scaled_dir):
        src = os.path.join(scaled_dir, t)
        dst = os.path.join(bad, t)
        if t == "events.parquet":
            os.makedirs(dst)
            duckdb.sql(
                f"COPY (SELECT * FROM '{src}/*.parquet' OFFSET 1) "
                f"TO '{dst}/part0.parquet' (FORMAT PARQUET)"
            )
        else:
            os.symlink(src, dst)
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "decade_invariants.py"),
            "--small",
            SRC_SF,
            "--big",
            bad,
            "--factor",
            "2",
            "--queries",
            "op_win_03_running_total",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert r.returncode == 1, (r.stdout[-2000:], r.stderr[-1000:])
    rec = json.loads(r.stdout.strip().splitlines()[0])
    assert rec["op_win_03_running_total"]["ok"] is False
