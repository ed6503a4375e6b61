"""Scale the driver-generated sf0.1 tables up 10x to an sf1-shaped
dataset for the scaling-curve decade point (BASELINE.md / SCALING.md).

The driver only materializes sf{0.001,0.01,0.1}; this derives an sf1
copy the way a larger generator run would look — MORE DISTINCT
entities, not replicas:

* every key column shifts by `i * stride` per copy (stride = a round
  power of ten above the max key), so joins/windows see 10x the key
  cardinality;
* `documents.text` is perturbed per copy (one vowel translated to a
  copy-specific digit) so cross-copy near-duplicate similarity
  collapses and the dedup workload keeps the sf0.1 per-corpus
  structure at 10x the corpus — plain replication would instead
  create 10-cliques of exact dups and an O(copies^2) pair blowup the
  real generator would never produce;
* `part.p_name` is perturbed the same way, so the fuzzy join's
  first-token block VOCABULARY grows with the copies while block
  sizes stay sf0.1-shaped (a constant copy-tag token would instead
  collapse each copy into one giant block);
* `lineitem.l_partkey` (the gene dimension) is NOT shifted: the gene
  vocabulary is a bounded dimension in the reference workload, so sf1
  means 10x samples over the same genes.

Output: /root/repo/.scratch/sf1/*.parquet (gitignored scratch).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

COPIES = 10

SHIFT_COLS = {
    "lineitem": ["l_orderkey"],  # l_partkey = bounded gene dim, unshifted
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": [],
    "nation": [],
    "region": [],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

VOWELS = "aeiou"


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from gexp_ml_dask_spark.session import get_spark

    src = os.environ.get("SRC_SF_DIR", "/root/testdata/sf0.1")
    out = os.environ.get("OUT_SF_DIR", "/root/repo/.scratch/sf1")
    spark = get_spark(app_name="make_sf1")
    os.makedirs(out, exist_ok=True)

    for table, keys in SHIFT_COLS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        if table in ("nation", "region", "supplier"):
            df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
            continue
        strides = {}
        if keys:
            maxes = df.agg(*[F.max(k).alias(k) for k in keys]).collect()[0]
            for k in keys:
                stride = 10 ** len(str(int(maxes[k])))
                strides[k] = stride
        parts = []
        for i in range(COPIES):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * strides[k]))
            if table == "documents" and i > 0:
                # perturb: one vowel -> copy digit, cross-copy
                # similarity collapses, within-copy structure intact
                c = c.withColumn(
                    "text", F.translate("text", VOWELS[i % 5], str(i % 10))
                )
            if table == "part" and i > 0:
                c = c.withColumn(
                    "p_name",
                    F.translate("p_name", VOWELS[i % 5], str(i % 10)),
                )
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        # many row groups out: downstream scans parallelize natively
        u.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
        print(f"{table}: {u.count()} rows", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
