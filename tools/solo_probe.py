"""Solo min-of-N probe: time named queries (noop sink), min over N runs.

Usage: python tools/solo_probe.py name1,name2 [N] [sf_dir]

Mirrors bench.py methodology (same session conf, warm tables, per-query
fn + noop write) so numbers are comparable with BENCH_FULL entries.
Family memos are built by a throwaway first invocation when the query
uses one, so the min reflects the warm per-query cost the bench's
first-toucher billing obscures; the FIRST run's time is also printed
(cold, memo-build included).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from formula_1_spark.queries.registry import load_all
from formula_1_spark.session import get_spark
from formula_1_spark.sources.tables import TABLE_NAMES, load_table


def main() -> None:
    names = sys.argv[1].split(",")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="solo_probe")
    reg = load_all()
    for t in TABLE_NAMES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass
    try:
        spark.range(64).repartition(32).mapInPandas(
            lambda it: it, "id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    for name in names:
        spec = reg[name]
        times = []
        for i in range(n):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(times):.2f}s cold={times[0]:.2f}s "
            f"all={[round(t, 2) for t in times]}"
        )


if __name__ == "__main__":
    main()
