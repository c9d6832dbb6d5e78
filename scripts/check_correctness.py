"""Local replica of the driver's correctness gate: run each __spark_entry__
query on Spark AND its DuckDB oracle at sf0.01, compare row counts, column
sets, and (rounded) values. Usage:

    python scripts/check_correctness.py [query ...]   # default: all

Runs every query under EACH partitioning in SPARK_GRAFT_CHECK_PARTITIONS
(default "8,200"): the r5 judge found a defect that only appeared at 200
shuffle partitions while this harness always ran at 8 — pinning exactly the
variable that broke. Set SPARK_GRAFT_CHECK_PARTITIONS=8 for a quick pass.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    """Sort columns by name, round floats, sort rows -> comparable list."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.9g}"
        if isinstance(v, bool):
            return str(v)
        return repr(v)

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as entry

    from entity_resolver_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    wanted = sys.argv[1:] or list(qs)
    part_settings = [
        int(p)
        for p in os.environ.get("SPARK_GRAFT_CHECK_PARTITIONS", "8,200").split(",")
    ]
    failures = 0
    for parts in part_settings:
        print(f"=== shuffle_partitions={parts} ===")
        spark = get_spark(
            f"correctness-{parts}", master="local[8]", shuffle_partitions=parts
        )
        # get_spark reuses an existing session; force the partitioning confs
        # so the second pass really runs at the requested width.
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(parts if parts >= 64 else parts * 8),
        )
        for name in wanted:
            df = qs[name](spark, sf_dir)
            sp_rows = [tuple(r) for r in df.collect()]
            sp_cols = df.columns
            if name not in oracles:
                print(f"{name}: rows-only, spark_rows={len(sp_rows)}")
                continue
            res = con.execute(oracles[name])
            dk_cols = [d[0] for d in res.description]
            dk_rows = res.fetchall()
            ok_rows = len(sp_rows) == len(dk_rows)
            ok_cols = sorted(sp_cols) == sorted(dk_cols)
            ok_vals = ok_rows and ok_cols and canon(sp_rows, sp_cols) == canon(
                dk_rows, dk_cols
            )
            status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(
                f"{name}: {status} rows={len(sp_rows)}/{len(dk_rows)} "
                f"cols={'ok' if ok_cols else (sorted(sp_cols), sorted(dk_cols))} "
                f"vals={'ok' if ok_vals else 'MISMATCH'}"
            )
            if not ok_vals and ok_rows and ok_cols:
                a = canon(sp_rows, sp_cols)
                b = canon(dk_rows, dk_cols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print("   spark:", x)
                    print("   duck :", y)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
