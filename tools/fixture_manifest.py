#!/usr/bin/env python
"""Content manifest for a testdata/scale-fixture directory.

Prints one JSON object: per table, the row count and the same
order-invariant per-column md5-prefix digest oracle_sweep uses for
big-result compares. This is how the derived decade fixtures
(.scratch/sf1, .scratch/sf10 — too large to commit) stay
re-verifiable: TESTDATA.md records the exact make_scaled_sf.py
invocations plus these manifests, so any future session can
regenerate and prove CONTENT identity (parquet file bytes may differ
by row-group layout; the multiset of rows may not).

Usage::

    python tools/fixture_manifest.py /root/repo/.scratch/sf1
    python tools/fixture_manifest.py /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> int:
    from oracle_sweep import _spark_digest

    from gexp_ml_dask_spark.session import get_spark

    sf_dir = sys.argv[1]
    spark = get_spark(app_name="fixture_manifest")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        d = _spark_digest(spark.read.parquet(p))
        out[t] = {"rows": d.pop("__n"), "col_digests": d}
    print(json.dumps({"dir": sf_dir, "tables": out}, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
