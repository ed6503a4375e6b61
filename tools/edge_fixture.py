"""Build an adversarial-data twin of sf0.001 for the edge sweep.

Third verification axis. The decade ladder perturbs SCALE, the config
battery perturbs EXECUTION SHAPE; this tool perturbs the DATA: it
copies every sf0.001 table and appends a fixed set of edge rows that
a real 100 TB corpus is guaranteed to contain but a synthetic
generator never emits —

- documents: empty / whitespace-only / single-char / NULL text,
  emoji + CJK + RTL unicode, regex metacharacters, embedded newline +
  tab + quotes (CSV sink roundtrip), a ~100 KB document, an exact
  text clone of an existing doc, punctuation-only, degenerate
  repetition, NULL lang. The n_chars == length(text) fixture
  invariant is preserved (computed, not guessed).
- embeddings: the zero vector (cosine denominator 0), 1e20 components
  (sum of squares overflows float32 — double accumulation or bust),
  1e-30 denormals, all-negative, a NaN component, a NULL embedding,
  a RAGGED length-3 vector, an exact clone of an existing vector.
- events: two events with the SAME (user, ts) — the as-of/window tie;
  epoch and year-2100 timestamps; NULL / NaN / +inf values; malformed
  + empty + NULL JSON props; NULL event_type.
- lineitem: zero quantity, 1e9 quantity, NULL quantity, empty-string
  returnflag, epoch shipdate, and an ORPHAN order key plus a
  single-row orphan gene (ddof=1 variance over one observation).
- orders: orphan custkey, NULL totalprice.

Everything is a fixed literal (no RNG, no clock) so the fixture is
bit-reproducible. Output keeps the driver's single-file-per-table
layout. Edge keys start at 10000 — far above every base fixture id —
so base-derived expectations (joins, decode formulas keyed on id)
are unaffected.

Run the sweep against it::

    python tools/edge_fixture.py --out /tmp/edge
    python tools/oracle_sweep.py --data-root /tmp/edge --sf sf0.001

A FAIL is one of: an engine bug (fix the operator), a cross-engine
semantics divergence (tighten the comparison contract on both
sides), or a real data-contract the operator needs (declare + gate
it). All three are findings; silence is the only wrong outcome.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

SRC = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# ~108 KB document, no RNG
_LONG = "lorem ipsum dolor sit amet " * 4000
_UNICODE = "héllo wörld \U0001f600 日本語テキスト العربية мир"
_REGEX = r"a.b*c(d)e[f]g|h\i$j^k?l+m{2}"


def _docs_sql(base: str) -> str:
    rows = [
        ("10000", "''", "'en'"),
        ("10001", "'a'", "'en'"),
        ("10002", "'   '", "'en'"),
        ("10003", f"'{_UNICODE}'", "'zh'"),
        ("10004", f"'{_REGEX}'", "'en'"),
        ("10005", "'say \"hi\"' || chr(10) || chr(9) || 'done'", "'en'"),
        ("10006", f"'{_LONG}'", "'en'"),
        # exact text clone of doc 42 (dedup family determinism)
        ("10007", f"(SELECT text FROM {base} WHERE doc_id = 42)", "'en'"),
        ("10008", "NULL", "'en'"),
        ("10009", "'!!!??? ::: ;;;'", "'en'"),
        ("10010", "'word word word word word word word word'", "'en'"),
        ("10011", "'null lang row'", "NULL"),
    ]
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS doc_id, {t} AS text, "
        f"CAST({lang} AS VARCHAR) AS lang, 'edge' AS source, "
        f"length({t}) AS n_chars"
        for i, t, lang in rows
    ]
    return " UNION ALL ".join([f"SELECT * FROM {base}"] + selects)


def _emb_sql(base: str) -> str:
    def vec(expr: str) -> str:
        return f"list_transform(range(64), x -> CAST({expr} AS FLOAT))"

    rows = [
        ("10000", vec("0.0")),
        ("10001", vec("1e20")),
        ("10002", vec("1e-30")),
        ("10003", vec("-1.0")),
        # NaN first component, 1.0 elsewhere
        (
            "10004",
            "list_transform(range(64), x -> CAST(CASE WHEN x = 0 "
            "THEN 'NaN'::FLOAT ELSE 1.0 END AS FLOAT))",
        ),
        ("10005", "NULL"),
        ("10006", "[1.0, 2.0, 3.0]::FLOAT[]"),  # ragged: length 3
        ("10007", f"(SELECT embedding FROM {base} WHERE vec_id = 7)"),
    ]
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS vec_id, {v} AS embedding, "
        "CAST(0 AS INTEGER) AS label"
        for i, v in rows
    ]
    return " UNION ALL ".join([f"SELECT * FROM {base}"] + selects)


def _events_sql(base: str) -> str:
    rows = [
        # same (user, ts) pair twice — the as-of / window tie
        ("10000", "'2024-01-15 12:00:00'", "1", "'click'", "1.0", "'{\"k\": 1}'"),
        ("10001", "'2024-01-15 12:00:00'", "1", "'click'", "2.0", "'{\"k\": 2}'"),
        ("10002", "'1970-01-01 00:00:00'", "2", "'view'", "3.0", "'{\"k\": 3}'"),
        ("10003", "'2100-01-01 00:00:00'", "3", "'view'", "4.0", "'{\"k\": 4}'"),
        ("10004", "'2024-01-16 01:00:00'", "4", "'click'", "NULL", "'{\"k\": 5}'"),
        ("10005", "'2024-01-16 02:00:00'", "5", "'click'", "'NaN'::DOUBLE", "'{\"k\": 6}'"),
        ("10006", "'2024-01-16 03:00:00'", "6", "'click'", "'inf'::DOUBLE", "'{\"k\": 7}'"),
        ("10007", "'2024-01-16 04:00:00'", "7", "'click'", "8.0", "'{bad json'"),
        ("10008", "'2024-01-16 05:00:00'", "8", "'click'", "9.0", "''"),
        ("10009", "'2024-01-16 06:00:00'", "9", "'click'", "10.0", "NULL"),
        ("10010", "'2024-01-16 07:00:00'", "10", "NULL", "11.0", "'{\"k\": 8}'"),
    ]
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS event_id, "
        f"CAST({ts} AS TIMESTAMP) AS ts, CAST({u} AS BIGINT) AS user_id, "
        f"CAST({et} AS VARCHAR) AS event_type, CAST({v} AS DOUBLE) AS value, "
        f"CAST({p} AS VARCHAR) AS props"
        for i, ts, u, et, v, p in rows
    ]
    return " UNION ALL ".join([f"SELECT * FROM {base}"] + selects)


def _lineitem_sql(base: str) -> str:
    # orphan order key 100000 (joins must drop it consistently);
    # orphan part key 999999 = a gene observed exactly once
    rows = [
        ("100000", "999999", "1", "1", "0.0", "0.0", "0.0", "0.0",
         "'N'", "'O'", "'2024-01-05 00:00:00'"),
        ("100000", "999999", "1", "2", "1e9", "1.0", "0.0", "0.0",
         "'N'", "'O'", "'2024-01-06 00:00:00'"),
        ("100001", "1", "1", "1", "NULL", "1.0", "0.0", "0.0",
         "'N'", "'O'", "'2024-01-07 00:00:00'"),
        ("100002", "2", "1", "1", "5.0", "1.0", "0.0", "0.0",
         "''", "'O'", "'1970-01-01 00:00:00'"),
    ]
    selects = [
        f"SELECT CAST({ok} AS BIGINT) AS l_orderkey, "
        f"CAST({pk} AS BIGINT) AS l_partkey, "
        f"CAST({sk} AS BIGINT) AS l_suppkey, "
        f"CAST({ln} AS INTEGER) AS l_linenumber, "
        f"CAST({q} AS DOUBLE) AS l_quantity, "
        f"CAST({ep} AS DOUBLE) AS l_extendedprice, "
        f"CAST({d} AS DOUBLE) AS l_discount, "
        f"CAST({tx} AS DOUBLE) AS l_tax, "
        f"CAST({rf} AS VARCHAR) AS l_returnflag, "
        f"CAST({ls} AS VARCHAR) AS l_linestatus, "
        f"CAST({sd} AS TIMESTAMP) AS l_shipdate"
        for ok, pk, sk, ln, q, ep, d, tx, rf, ls, sd in rows
    ]
    return " UNION ALL ".join([f"SELECT * FROM {base}"] + selects)


def _orders_sql(base: str) -> str:
    rows = [
        ("100000", "999999", "'O'", "1.0", "'2024-01-05 00:00:00'", "'1-URGENT'"),
        ("100001", "1", "'O'", "NULL", "'2024-01-06 00:00:00'", "'1-URGENT'"),
        ("100002", "2", "'O'", "2.0", "'2024-01-07 00:00:00'", "'1-URGENT'"),
    ]
    selects = [
        f"SELECT CAST({ok} AS BIGINT) AS o_orderkey, "
        f"CAST({ck} AS BIGINT) AS o_custkey, "
        f"CAST({st} AS VARCHAR) AS o_orderstatus, "
        f"CAST({tp} AS DOUBLE) AS o_totalprice, "
        f"CAST({od} AS TIMESTAMP) AS o_orderdate, "
        f"CAST({pr} AS VARCHAR) AS o_orderpriority"
        for ok, ck, st, tp, od, pr in rows
    ]
    return " UNION ALL ".join([f"SELECT * FROM {base}"] + selects)


EDGED = {
    "documents": _docs_sql,
    "embeddings": _emb_sql,
    "events": _events_sql,
    "lineitem": _lineitem_sql,
    "orders": _orders_sql,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/edge")
    ap.add_argument("--src", default=SRC)
    args = ap.parse_args()

    import duckdb

    out_dir = Path(args.out) / os.path.basename(args.src.rstrip("/"))
    out_dir.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{args.src}/{t}.parquet"
        base = f"read_parquet('{src}')"
        sql = EDGED[t](base) if t in EDGED else f"SELECT * FROM {base}"
        dst = out_dir / f"{t}.parquet"
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n_base = con.execute(f"SELECT count(*) FROM {base}").fetchone()[0]
        n_out = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{t}: {n_base} -> {n_out} rows")
    print(f"edge fixture: {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
