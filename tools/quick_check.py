"""Ad-hoc oracle-parity check for a comma-separated query list.

Usage: python tools/quick_check.py name1,name2 [sf_dir]
Mirrors tests/test_oracle_parity.py (check_query) without pytest startup.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from formula_1_spark.queries.registry import load_all
from formula_1_spark.session import get_spark
from formula_1_spark.testing import check_query


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quick_check")
    reg = load_all()
    failed = False
    for n in names:
        t0 = time.perf_counter()
        try:
            report = check_query(spark, reg[n], sf_dir)
        except Exception as e:  # noqa: BLE001 - surface and continue
            print(f"{n}: ERROR {type(e).__name__}: {e}")
            failed = True
            continue
        ok = report.get("oracle") is None or report["close_only_rows"] == 0
        status = "OK" if ok else f"MISMATCH {report}"
        print(f"{n}: {status} rows={report['rows']} "
              f"({time.perf_counter() - t0:.1f}s)")
        failed = failed or not ok
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
