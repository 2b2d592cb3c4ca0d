"""Dump `.explain("formatted")` for named queries to plans/r12/.

Usage: python tools/dump_plan_r12.py name1,name2 before|after [sf_dir]

Writes plans/r12/<name>_<tag>.txt. Plans are captured at sf0.1 (the bench
scale) by default so Exchange counts / join strategies match what the
bench actually executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from formula_1_spark.queries.registry import load_all
from formula_1_spark.session import get_spark


def main() -> None:
    names = sys.argv[1].split(",")
    tag = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plan_r12")
    reg = load_all()
    for n in names:
        df = reg[n].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{n}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
