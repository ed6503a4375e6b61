"""The blocked-oracle pipeline (tools/blocked_oracle.py) at toy scale.

The sf1/sf10 value verification of the quadratic-oracle op_llm_02
family rests on block decomposition: per-copy doc_id blocks are
text-disjoint by fixture construction, so the full-corpus result
equals the union of per-block results and the per-block DuckDB
oracle is affordable. This pins the three load-bearing behaviors on
a seconds-sized SCALE_COPIES=2 fixture:

1. the verified path — engine per-block digests == per-block oracle
   digests on a genuinely multi-block fixture;
2. the decomposability GUARD — on a fixture with cross-block
   duplicate text the tool must refuse to compare (skip loudly),
   because the per-block oracle provably misses cross-block pairs;
3. unknown query names exit 2 with a usable message.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = "/root/testdata/sf0.001"
# sf0.001 doc_ids are 0..499 -> the scaler's stride (and our
# divisor) is 10^len(str(499)) = 1000
BLOCK_DIV = "1000"


def _run(args, timeout=900):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "blocked_oracle.py")]
        + args,
        env=dict(os.environ, SPARK_GRAFT_CPUS="8"),
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def scaled_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("blocked") / "sf2x")
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


def test_blocked_oracle_verifies_two_blocks(scaled_dir, tmp_path):
    out = str(tmp_path / "blocked.json")
    r = _run(
        [
            "--sf-dir",
            scaled_dir,
            "--block-div",
            BLOCK_DIV,
            "--workers",
            "4",
            "--queries",
            "op_llm_02_ngram_jaccard,op_llm_02_dup_clusters,"
            "op_llm_02_triangles,op_llm_02_decontaminate",
            "--out",
            out,
        ]
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    rec = json.load(open(out))
    assert rec["summary"]["n_blocks"] == 2
    assert rec["summary"]["fails"] == []
    assert set(rec["summary"]["verified"]) == {
        "op_llm_02_ngram_jaccard",
        "op_llm_02_dup_clusters",
        "op_llm_02_triangles",
        "op_llm_02_decontaminate",
    }
    # the guard actually measured, not defaulted
    pair = next(
        x
        for x in rec["results"]
        if x["name"] == "op_llm_02_ngram_jaccard"
    )
    assert pair["cross_block"] == 0


def test_blocked_oracle_guard_refuses_cross_block_dups(tmp_path):
    """Second copy with UNPERTURBED text: every doc has an exact
    cross-block duplicate, so the jaccard pair graph spans blocks and
    the tool must skip (refuse to verify) rather than compare."""
    import duckdb

    bad = str(tmp_path / "sf_dup")
    os.makedirs(bad)
    for t in os.listdir(SRC_SF):
        src = os.path.join(SRC_SF, t)
        dst = os.path.join(bad, t)
        if t == "documents.parquet":
            duckdb.sql(
                f"COPY (SELECT * FROM '{src}' UNION ALL "
                f"SELECT doc_id + 1000 AS doc_id, * EXCLUDE (doc_id) "
                f"FROM '{src}') TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            os.symlink(src, dst)
    r = _run(
        [
            "--sf-dir",
            bad,
            "--block-div",
            BLOCK_DIV,
            "--workers",
            "2",
            "--queries",
            "op_llm_02_ngram_jaccard,op_llm_02_decontaminate",
        ]
    )
    # skipped-by-guard is not a failure exit, but nothing verifies
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    summary = json.loads(r.stdout.strip().splitlines()[-1].split("SUMMARY ")[1])
    assert summary["verified"] == []
    assert "cross-block pairs" in summary["skipped"]["op_llm_02_ngram_jaccard"]
    assert "grams occur in >1 block" in summary["skipped"][
        "op_llm_02_decontaminate"
    ]


def test_blocked_oracle_unknown_query_is_usable_error():
    r = _run(["--sf-dir", SRC_SF, "--queries", "op_nope"], timeout=120)
    assert r.returncode == 2
    assert "op_nope" in r.stderr
