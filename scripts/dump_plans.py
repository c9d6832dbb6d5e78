"""Dump .explain("formatted") for every declared query to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix from SPARK_GRAFT_PLAN_SUFFIX,
default "before"). The judge checks plan claims against these files.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry

    from entity_resolver_spark.session import get_spark

    spark = get_spark("dump-plans", master="local[8]", shuffle_partitions=8)
    qs = entry.queries()
    wanted = sys.argv[2:] or list(qs)
    for name in wanted:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}")


if __name__ == "__main__":
    main()
