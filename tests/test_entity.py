"""Deletion-neighborhood fuzzy matching vs the naive quadratic definition.

The neighborhood join must be a LOSSLESS superset filter for lev<=1 —
these cases aim at the places it could silently lose pairs: edits at
every position class (first char, middle, last), length-(n, n-1)
insert/delete pairs, very short names, identical names, and cross-block
pairs that must NOT match. A second test pins the scale property: on a
corpus with a long shared constant prefix (where prefix/suffix
pigeonhole blocking degenerates quadratic), variant buckets stay tiny.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from formula_1_spark.operators.entity import deletion_neighborhood, fuzzy_pairs_lev1

ROWS = [
    # (key, name, block)
    (1, "ABCDEFGHIJKLMNOPQR", 0),   # len 18
    (2, "ABCDEFGHXJKLMNOPQR", 0),   # substitution at pos 9
    (3, "ABCDEFGHIXKLMNOPQR", 0),   # substitution at pos 10
    (4, "ABCDEFGHIJKLMNOPQ", 0),    # deletion of last char (len 17)
    (5, "BCDEFGHIJKLMNOPQR", 0),    # deletion of first char
    (6, "ABCDEFGHIJKLMNOPQRS", 0),  # insertion at end (len 19)
    (7, "ZBCDEFGHIJKLMNOPQR", 0),   # substitution at pos 1
    (8, "ABCDEFGHIJKLMNOPQZ", 0),   # substitution at pos 18
    (9, "ABCDEFGHIJKLMNOPQR", 1),   # identical name, DIFFERENT block
    (10, "short", 0),
    (11, "shirt", 0),               # lev 1 from "short"
    (12, "sho", 0),                 # lev 2 from "short" — must not match
    (13, "QRPONMLKJIHGFEDCBA", 0),  # unrelated, same block
    (14, "ABCDEFGH", 0),            # len 8
    (15, "ABCDEFGHI", 0),           # len 9: lev 1 from key 14
    (16, "ABCDEFGHIJKLMNOPQR", 0),  # exact duplicate of key 1, same block
    (17, "a", 0),                   # single char
    (18, "b", 0),                   # lev 1 from "a" (substitution)
    (19, "", 0),                    # empty string: lev 1 from "a"/"b"
]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_neighborhood_contents(spark):
    row = spark.range(1).select(
        deletion_neighborhood(F.lit("abca")).alias("v")
    ).head()
    # identity + 4 deletions, with the duplicate variant ('abc' appears
    # from deleting either trailing position? no — deleting pos 4 gives
    # 'abc', deleting pos 1 gives 'bca') — distinctness still applies
    # to repeated chars: 'aab' -> deleting pos 1 or 2 both give 'ab'.
    assert set(row.v) == {"abca", "bca", "aca", "aba", "abc"}
    row2 = spark.range(1).select(
        deletion_neighborhood(F.lit("aab")).alias("v")
    ).head()
    assert sorted(row2.v) == ["aab", "ab", "aa"][::-1] or set(row2.v) == {"aab", "ab", "aa"}
    assert len(row2.v) == 3  # duplicate deletion variant collapsed


def test_blocked_matches_bruteforce(spark):
    df = spark.createDataFrame(ROWS, ["k", "name", "blk"])
    got = {
        (r.key_a, r.key_b, r.edit_dist)
        for r in fuzzy_pairs_lev1(df, "k", "name", "blk").collect()
    }
    want = {
        (ka, kb, _lev(na, nb))
        for (ka, na, ba), (kb, nb, bb) in itertools.combinations(ROWS, 2)
        if ba == bb and _lev(na, nb) <= 1
    }
    assert got == want
    keys_hit = {k for ka, kb, _ in want for k in (ka, kb)}
    # the adversarial cases actually exercise the paths they target
    assert {1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 14, 15, 16, 17, 18, 19} <= keys_hit
    assert 9 not in keys_hit and 12 not in keys_hit and 13 not in keys_hit


def test_variant_buckets_stay_tiny_on_shared_prefix_corpus(spark):
    """Scale property: on 'Customer#%09d' names (long shared prefix),
    the variant-bucket occupancy — which bounds candidate-join fan-out —
    stays tiny, while any prefix-based or nation-based block would hold
    all n rows (quadratic candidates)."""
    n = 400
    rows = [(i, f"Customer#{i:09d}", 0) for i in range(n)]
    df = spark.createDataFrame(rows, ["k", "name", "blk"])
    occ = (
        df.select(F.explode(deletion_neighborhood(F.col("name"))).alias("v"))
        .groupBy("v")
        .count()
        .agg(F.max("count").alias("mx"), F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("cand"))
        .head()
    )
    # Worst bucket: digit-deletion collisions ("Customer#00000000" is hit
    # by ~22 names), not n. Candidates ~24n vs the quadratic block's
    # n(n-1)/2 = 79800.
    assert occ.mx <= 30
    assert occ.cand < n * 30
    out = fuzzy_pairs_lev1(df, "k", "name", "blk").count()
    brute = sum(
        1
        for (ka, na, _), (kb, nb, _) in itertools.combinations(rows, 2)
        if _lev(na, nb) <= 1
    )
    assert out == brute


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
