"""Blocked fuzzy entity resolution via deletion-neighborhood join
(FastSS / SymSpell family).

Exact lev<=1 pair finding without a quadratic within-block self-join.
Every name emits its deletion neighborhood — the name itself plus each
single-character-deletion variant (L+1 keys for a length-L name). Two
strings at edit distance <= 1 ALWAYS share a variant:

* substitution at position p: deleting p from both yields equal strings;
* insert/delete: the shorter string is itself a deletion-variant of the
  longer, and every string's identity is in its own neighborhood;
* identical strings share the identity variant.

So an equi-join on (block, variant) is a provably lossless candidate
superset, verified afterwards with the JVM ``levenshtein`` codegen
expression. Unlike prefix/suffix pigeonhole blocking (which degenerates
to the quadratic block when names share a long constant prefix — e.g.
``Customer#0000…``), deletion-variant buckets hold only true
near-duplicates, so candidate generation stays near-linear in corpus
size at the cost of an (L+1)-way row fan-out — the standard FastSS
trade. A bucket only goes quadratic when the OUTPUT itself is quadratic
(a group of identical names), which no exact algorithm avoids.

All expressions are codegen (`transform`/`sequence`/`explode`); no
Python in the loop.

No analogue in the reference (uwe-uffuchs/formula-1) — extension
operator in SURVEY.md §2's "beyond the reference" family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_neighborhood(name: F.Column) -> F.Column:
    """Array of the string plus each single-char-deletion variant,
    de-duplicated (adjacent repeated characters collapse to the same
    variant)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(name)),
        lambda i: F.concat(
            F.substring(name, F.lit(1), i - 1),
            # substring(pos, len): everything after the deleted position.
            F.substring(name, i + 1, F.length(name)),
        ),
    )
    return F.array_distinct(F.concat(F.array(name), dels))


def fuzzy_pairs_lev1(
    df: DataFrame,
    key_col: str,
    name_col: str,
    block_col: str,
) -> DataFrame:
    """All pairs (key_a < key_b) within `block_col` whose `name_col`
    values are at edit distance <= 1, via the deletion-neighborhood
    equi-join. Returns columns: key_a, key_b, name_a, name_b,
    <block_col>, edit_dist. Equivalent to (but asymptotically cheaper
    than) the naive quadratic self-join filtered on levenshtein <= 1."""
    sides = df.select(
        F.col(key_col).alias("_k"),
        F.col(name_col).alias("_n"),
        F.col(block_col).alias("_b"),
        F.explode(deletion_neighborhood(F.col(name_col))).alias("_v"),
    )
    a, b = sides.alias("a"), sides.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a._v") == F.col("b._v"))
            & (F.col("a._b") == F.col("b._b"))
            & (F.col("a._k") < F.col("b._k")),
        )
        .select(
            F.col("a._k").alias("key_a"),
            F.col("b._k").alias("key_b"),
            F.col("a._n").alias("name_a"),
            F.col("b._n").alias("name_b"),
            F.col("a._b").alias(block_col),
        )
        .dropDuplicates(["key_a", "key_b"])
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return candidates.filter(dist <= 1).withColumn("edit_dist", dist)
