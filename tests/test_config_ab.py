"""Pin the session-config A/B harness (tools/config_ab.py).

The A/B's evidence value rests on (a) each variant's config dict
being a valid Spark conf mapping that ``get_spark(extra_configs=...)``
can apply verbatim, and (b) the harness staying runnable end-to-end
with its row-count cross-check intact (a silent variant crash would
report a hollow "no change" verdict). (a) is a pure unit check; (b)
is one real two-variant run over a two-query slice at sf0.001 —
two JVMs, seconds each — asserting the artifact the judge reads
(plans/r08/config_ab.json schema) is written with ratios and
identical row counts across variants.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from config_ab import DEFAULT_QUERIES, VARIANTS  # noqa: E402


def test_variants_are_wellformed_conf_maps():
    assert "base" in VARIANTS and VARIANTS["base"] == {}
    for name, conf in VARIANTS.items():
        for k, v in conf.items():
            assert k.startswith("spark."), (name, k)
            assert isinstance(v, str) and v, (name, k, v)


def test_default_queries_are_registered():
    sys.path.insert(0, REPO)
    from __spark_entry__ import queries

    reg = queries()
    for q in DEFAULT_QUERIES:
        assert q in reg, q


def test_ab_end_to_end_two_variants(tmp_path):
    out = str(tmp_path / "ab.json")
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "config_ab.py"),
            "--rounds",
            "1",
            "--repeats",
            "1",
            "--variants",
            "base,shj",
            "--queries",
            "op_agg_01_per_gene_mean,op_fil_04_semi_join",
            "--out",
            out,
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rec = json.load(open(out))
    assert set(rec["best"]) == {"base", "shj"}
    for v in rec["best"].values():
        assert set(v) == {"op_agg_01_per_gene_mean", "op_fil_04_semi_join"}
        assert all(s >= 0 for s in v.values())
    # row-count cross-check ran: identical rows recorded per variant
    rows = [rd["rows"] for vr in rec["variants"].values() for rd in vr["rounds"]]
    assert rows and all(rr == rows[0] for rr in rows)
    assert "shj" in rec["summary"]
    assert set(rec["summary"]["shj"]["ratios"]) == set(rec["best"]["base"])
    # compact stdout line for session logs
    assert any(
        line.startswith('{"metric": "config_ab"')
        for line in r.stdout.splitlines()
    )
