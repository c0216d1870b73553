"""Ad-hoc differential smoke runner: `python tests/smoke_ops.py op1 op2 ...`

Runs the driver-style oracle comparison for the named ops at sf0.01
(override with DS_SMOKE_SF). Development aid only — the real coverage
is tests/test_oracle.py's parameterization over every registered oracle.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deltasink_spark import registry
from deltasink_spark.session import get_spark

registry.load_all()

from diffcheck import compare, compare_driver_style  # noqa: E402


def main() -> None:
    sf = os.environ.get("DS_SMOKE_SF", "/root/testdata/sf0.01")
    spark = get_spark(app_name="smoke", cores=8, shuffle_partitions=8)
    ops = sys.argv[1:]
    for op in ops:
        fn = registry.QUERIES[op]
        sql = registry.ORACLES.get(op)
        if sql is None:
            n = fn(spark, sf).count()
            print(f"{op}: rows-only, {n} rows")
            continue
        compare(spark, sf, fn, sql, op)
        compare_driver_style(spark, sf, fn, sql, op)
        print(f"{op}: OK")


if __name__ == "__main__":
    main()
