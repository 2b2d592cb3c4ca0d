"""Cogrouped Arrow processing (``groupBy().cogroup().applyInPandas``) —
the two-sided sibling of the mapInPandas media kernel: both sides of a
key are delivered to one Python kernel as aligned pandas frames.

Use case here: order-book reconciliation. Each order's header total is
checked against the sequential fold of its line items — the kind of
two-relation, per-key, order-sensitive computation (sequence alignment,
ledger matching, diff-style comparison) that motivates cogroup when plain
join+agg can't express the per-key procedure.

Scale design — the part that matters at 100 TB:

* **Cogroup on a BUCKET key, not the natural key.** `applyInPandas`
  invokes the Python kernel once per group; cogrouping 150 M orders on
  o_orderkey would mean 150 M kernel calls (per-call pandas overhead
  dwarfs the work). Bucketing to ``o_orderkey % n_buckets`` gives
  n_buckets kernel calls with thousands of orders vectorized inside
  each — per-group overhead amortizes, Arrow batches stay large, and
  n_buckets scales with the cluster, independent of row count.
* Both sides shuffle ONCE on the bucket key (co-partitioned delivery is
  the operator's contract); no further shuffle downstream.
* The fold is explicitly sequential in l_linenumber order, so the DuckDB
  oracle replicates it bit-for-bit with an ordered ``list_reduce`` —
  same discipline as the flat-vector dot products (see PERF.md).

Reference scope note: the reference has no two-relation procedural
kernels (its notebooks are join+agg only); this extends the declared
Arrow surface (SURVEY.md §2.10) beyond mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "o_orderkey bigint, o_orderpriority string, o_totalprice double, "
    "line_total double, n_lines bigint"
)


def order_reconciliation(
    orders: DataFrame, lineitem: DataFrame, n_buckets: int = 64
) -> DataFrame:
    """(o_orderkey, o_orderpriority, o_totalprice, line_total, n_lines)
    per order, where ``line_total`` is the sequential (l_linenumber-ordered)
    fold of ``extendedprice * (1 - discount) * (1 + tax)`` — computed in a
    cogrouped Arrow kernel. Orders with no lines get (0.0, 0)."""

    def recon(odf, ldf):
        import pandas as pd

        if len(ldf):
            ldf = ldf.sort_values(["l_orderkey", "l_linenumber"])
            # Elementwise IEEE double ops (numpy) — identical to the SQL
            # expression; the ACCUMULATION is a per-order sequential
            # Python-float fold, matching the oracle's ordered
            # list_reduce exactly.
            terms = (
                ldf["l_extendedprice"].to_numpy()
                * (1.0 - ldf["l_discount"].to_numpy())
                * (1.0 + ldf["l_tax"].to_numpy())
            )
            keys = ldf["l_orderkey"].to_numpy()
            totals: dict[int, float] = {}
            counts: dict[int, int] = {}
            for k, t in zip(keys, terms):
                totals[k] = totals.get(k, 0.0) + float(t)
                counts[k] = counts.get(k, 0) + 1
        else:
            totals, counts = {}, {}
        return pd.DataFrame(
            {
                "o_orderkey": odf["o_orderkey"],
                "o_orderpriority": odf["o_orderpriority"],
                "o_totalprice": odf["o_totalprice"],
                "line_total": [totals.get(k, 0.0) for k in odf["o_orderkey"]],
                "n_lines": [counts.get(k, 0) for k in odf["o_orderkey"]],
            }
        )

    left = orders.select(
        (F.col("o_orderkey") % n_buckets).alias("bucket"),
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
    )
    right = lineitem.select(
        (F.col("l_orderkey") % n_buckets).alias("bucket"),
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    )
    return (
        left.groupBy("bucket")
        .cogroup(right.groupBy("bucket"))
        .applyInPandas(recon, _OUT_SCHEMA)
    )
