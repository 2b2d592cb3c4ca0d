"""Join operators (SURVEY.md §2.3, J1–J6).

The reference's entire join surface is AND-ed equi inner joins:

* J1–J3 — fact ⋈ small dimension on a single ref key
  (``Transform Silver Data.py:101-103``). Dimensions are broadcast
  (explicit ``F.broadcast`` hint) so the fact side never shuffles.
* J4 — fact ⋈ pre-aggregate on a compound key
  (``Transform Silver Data.py:104``). Deliberately INNER: the reference's
  lossy-join quirk (#3 in SURVEY §2.12) silently drops fact rows with no
  match in the aggregate. Parity keeps inner; ``how='left'`` gives the
  corrected variant.
* J6 — join a base table to a ranked subquery then filter rank <= k
  (``Data Visualization.sql:121-124``) — the top-k-filter pattern, built
  from rank_standings + join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner", hint_broadcast: bool = True
) -> DataFrame:
    """J1–J3: fact ⋈ dimension equi join with an explicit broadcast hint.

    At 100 TB the fact side must not shuffle for dimension lookups;
    broadcasting every dim keeps the join map-side. Catalyst would often
    choose this itself under the size threshold, but statistics are
    unreliable after transformations — the hint makes it deterministic.
    """
    if hint_broadcast:
        dim = F.broadcast(dim)
    return fact.join(dim, on, how)


def compound_key_join(
    left: DataFrame, right: DataFrame, keys: Sequence[str], how: str = "inner"
) -> DataFrame:
    """J4: multi-column equi join on AND-ed key equality.

    Using the list-of-names form de-duplicates the join columns in the
    output (one copy of each key), which keeps downstream projections
    unambiguous. Shuffles both sides on the compound key unless one side
    is broadcastable — at scale, co-partition (bucket) both sides on the
    leading key to eliminate the shuffle.
    """
    return left.join(right, on=list(keys), how=how)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi join: the skewed side gets a random salt in
    [0, n_salts); the small side is replicated n_salts times; the join
    runs on (key, salt), spreading each hot key across n_salts reducers.

    AQE's skew-join splitting handles most cases at runtime; explicit
    salting is for the pathological single-key hotspots AQE can't split
    (e.g. one key = 30% of a 100 TB fact). The salt column is internal
    and dropped from the output.
    """
    salted_left = skewed.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return salted_left.join(replicated, on=[key, "__salt"], how=how).drop("__salt")
