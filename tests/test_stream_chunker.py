"""Both stream_decade chunk builders honor one contract.

The streaming decade sweeps replay the events table as chronological
micro-batch files. Through sf10 the chunks are built by an in-memory
pyarrow sort; at sf100 a Spark range-partitioned sort takes over
(tools/stream_decade.py `_chunk_events`). The sweep's exactly-once
and watermark accounting only needs the shared contract — files in
lexicographic name order are chronologically non-overlapping and
together hold exactly the source multiset — so that is what this
pins, for both builders, on sf0.001.
"""

from __future__ import annotations

import glob
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
SRC_SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("chunker", ["arrow", "spark"])
def test_chunkers_share_the_chronological_contract(
    spark, tmp_path, chunker
):
    from stream_decade import _chunk_events

    out = str(tmp_path / chunker)
    os.makedirs(out)
    n = _chunk_events(SRC_SF, out, 4, spark=spark, chunker=chunker)
    assert n == 1000

    files = sorted(glob.glob(f"{out}/chunk-*.parquet"))
    assert 1 < len(files) <= 4

    con = duckdb.connect()
    # chronological: each file's max ts <= the next file's min ts
    bounds = [
        con.execute(
            f"SELECT min(ts), max(ts), count(*) FROM '{f}'"
        ).fetchone()
        for f in files
    ]
    assert sum(b[2] for b in bounds) == n
    for (_, hi, _), (lo, _, _) in zip(bounds, bounds[1:]):
        assert hi <= lo

    # lossless: union of chunks == the source multiset
    diff = con.execute(
        f"SELECT count(*) FROM "
        f"((SELECT * FROM '{out}/chunk-*.parquet' EXCEPT ALL "
        f"SELECT * FROM '{SRC_SF}/events.parquet') UNION ALL "
        f"(SELECT * FROM '{SRC_SF}/events.parquet' EXCEPT ALL "
        f"SELECT * FROM '{out}/chunk-*.parquet'))"
    ).fetchone()[0]
    assert diff == 0
