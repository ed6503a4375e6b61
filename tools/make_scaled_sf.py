"""Scale the driver-generated sf0.1 tables up 10x to an sf1-shaped
dataset for the scaling-curve decade point (BASELINE.md / SCALING.md).

The driver only materializes sf{0.001,0.01,0.1}; this derives an sf1
copy the way a larger generator run would look — MORE DISTINCT
entities, not replicas:

* every key column shifts by `i * stride` per copy (stride = a round
  power of ten above the max key), so joins/windows see 10x the key
  cardinality;
* `documents.text` is perturbed per copy (ALL five vowels translated
  to a copy-unique character set) so virtually every shingle differs
  across copies: cross-copy similarity collapses to ~0 for exact
  Jaccard AND for MinHash banding, and the dedup workload keeps the
  sf0.1 per-corpus structure at 10x the corpus. Plain replication
  would create 10-cliques of exact dups and an O(copies^2) pair
  blowup; a single-vowel translate was measured to still leave
  enough shared shingles for cross-copy band collisions (minhash_lsh
  137 s at sf1 vs 2.8 s at sf0.1 — superlinear; the real generator's
  distinct documents would never collide like that);
* `part.p_name` is perturbed the same way, so the fuzzy join's
  first-token block VOCABULARY grows with the copies while block
  sizes stay sf0.1-shaped (a constant copy-tag token would instead
  collapse each copy into one giant block);
* `lineitem.l_partkey` (the gene dimension) is NOT shifted: the gene
  vocabulary is a bounded dimension in the reference workload, so sf1
  means 10x samples over the same genes.

Output: /root/repo/.scratch/sf1/*.parquet (gitignored scratch).

Second decade (sf10): run once more with ``SRC_SF_DIR=.scratch/sf1
OUT_SF_DIR=.scratch/sf10 PERTURB=rot`` — the rot scheme exists
because the vowel substitution is single-use (see ``_RING``).
Verified: sf10 distinct-text count = exactly 10x sf1's, i.e. all
100 underlying copies stay mutually disjoint while within-copy dup
structure scales linearly.

Third decade (sf100): ``SRC_SF_DIR=.scratch/sf10
OUT_SF_DIR=.scratch/sf100 PERTURB=perm`` — the rot scheme is itself
single-use (rotations compose: equal i+j sums would clone texts
across copies; see ``_perm``). Same build-time invariant: sf100
distinct-text count must equal exactly 10x sf10's.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

# Copies per pass — 10 for the real decade fixtures; overridable so
# the test suite can exercise the scaler+invariants pipeline on a
# seconds-sized factor-2 fixture (tests/test_decade_invariants.py).
COPIES = int(os.environ.get("SCALE_COPIES", "10"))

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
# 5 substitute characters per copy, disjoint across the 9 shifted
# copies (copy 0 keeps the original text): digits + uppercase +
# token-safe punctuation (texts split on single spaces only).
_SUBST = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ!@#$%^&*("


def _subst(i: int) -> str:
    out = _SUBST[(i - 1) * 5 : i * 5]
    # the vowel scheme has exactly 9 disjoint 5-char substitute sets;
    # past that the slice silently shrinks and F.translate would
    # DELETE vowels, cloning copies >=10 of each other and breaking
    # the cross-copy disjointness the decade invariants rely on
    # (ADVICE r6) — fail loudly instead. An if/raise, not an assert:
    # python -O strips asserts and would silently restore the
    # corruption this guard exists to prevent.
    if len(out) != 5:
        raise ValueError(
            f"vowel perturbation supports at most 10 copies (copy {i} "
            f"has no substitute set); use PERTURB=rot/perm or lower "
            "SCALE_COPIES"
        )
    return out


# Second-decade perturbation (PERTURB=rot, for scaling an already
# vowel-perturbed sf1 up to sf10): the vowel scheme is single-use —
# sf1 copies 1..9 contain no vowels, so a second vowel pass would
# leave them EXACT clones and fabricate 10-clique dup blowups. A
# full-ring rotation (Caesar over lowercase + the substitute charset;
# space stays out of the ring so tokenization is preserved) changes
# EVERY letter, so any two distinct rotations share zero shingles:
# all 100 underlying copies stay mutually dissimilar while each
# keeps the source corpus's exact length/shape statistics.
_RING = "abcdefghijklmnopqrstuvwxyz" + _SUBST


def _rot(i: int) -> str:
    s = (i * 7) % len(_RING)
    return _RING[s:] + _RING[:s]


# Third-decade perturbation (PERTURB=perm, for scaling an already
# rot-perturbed sf10 up to sf100): the rot scheme is ALSO single-use
# — rotations compose within the rotation group, so a second rot
# pass makes every (i, j) copy-of-copy with equal i+j an exact text
# clone of its partners (7*(i+j) mod 41 depends only on the sum),
# fabricating cross-copy dup cliques exactly like a repeated vowel
# pass would. A seeded full permutation of the ring per copy lives
# outside the rotation subgroup: the composed character maps
# P_k ∘ R_j ∘ V_i are pairwise distinct (asserted at build time via
# the distinct-text invariant: sf100 distinct texts == 10x sf10's).
def _perm(i: int) -> str:
    import random

    chars = list(_RING)
    random.Random(0xC0FFEE + i).shuffle(chars)
    return "".join(chars)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from gexp_ml_dask_spark.session import get_spark

    src = os.environ.get("SRC_SF_DIR", "/root/testdata/sf0.1")
    out = os.environ.get("OUT_SF_DIR", "/root/repo/.scratch/sf1")
    perturb = os.environ.get("PERTURB", "vowel")  # vowel | rot | perm
    # ONLY_TABLES=events (comma-list) scales a subset — the streaming
    # sf100 decade needs 100M events (~2 GB) without paying for the
    # 60 GB full-suite fixture chain
    only = {
        t for t in os.environ.get("ONLY_TABLES", "").split(",") if t
    }
    spark = get_spark(app_name="make_sf1")
    os.makedirs(out, exist_ok=True)

    def _perturbed(col: str, i: int):
        if perturb == "rot":
            return F.translate(col, _RING, _rot(i))
        if perturb == "perm":
            return F.translate(col, _RING, _perm(i))
        return F.translate(col, VOWELS, _subst(i))

    for table, keys in SHIFT_COLS.items():
        if only and table not in only:
            continue
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
                # perturb: cross-copy similarity collapses, within-copy
                # structure intact (scheme per PERTURB, see above)
                c = c.withColumn("text", _perturbed("text", i))
            if table == "part" and i > 0:
                c = c.withColumn("p_name", _perturbed("p_name", i))
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
