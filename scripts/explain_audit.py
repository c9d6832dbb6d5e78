"""Physical-plan audit: verify the plans we'd want at 100 TB.

Checks, per headline query:
* parquet scans carry PushedFilters / pruned ReadSchema (predicate pushdown +
  column pruning reached the scan)
* small dimension joins go broadcast
* WholeStageCodegen spans exist (expressions stay JVM-side)

Prints a PASS/WARN table plus the formatted plan snippets that justify it.
Run: python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def executed_plan_of(df) -> str:
    """Post-execution plan string: AQE finalized, codegen stages marked *(n).
    Must run an action on THIS QueryExecution (collect), not df.write — a
    write creates a fresh QueryExecution and leaves this one unfinalized."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as m
    from entity_resolver_spark.session import get_spark

    spark = get_spark("explain-audit", master="local[8]")
    qs = m.queries()

    checks = {
        "agg_pricing": dict(pushdown=True, codegen=True),
        "join_revenue_by_nation": dict(broadcast=True, codegen=True),
        "anti_join_no_orders": dict(codegen=True),
        "topk_orders_per_customer": dict(codegen=True, prune=["o_custkey", "o_orderkey", "o_totalprice"]),
        "token_stats": dict(prune=["lang", "text"], codegen=True),
        "exact_dedup": dict(prune=["doc_id", "text"], codegen=True),
        "embedding_topk": dict(codegen=True),
    }
    any_warn = False
    for name, want in checks.items():
        df = qs[name](spark, sf_dir)
        plan = plan_of(df)
        notes = []
        if want.get("pushdown") and not re.search(r"PushedFilters: \[[^\]]+\]", plan):
            notes.append("NO pushed filters")
        if want.get("broadcast") and "BroadcastHashJoin" not in plan:
            notes.append("NO broadcast join")
        if want.get("codegen"):
            rows = df.collect()
            ex = df._jdf.queryExecution().executedPlan().toString()
            # an empty result lets AQE collapse the plan to a LocalTableScan
            if rows and "*(" not in ex and "LocalTableScan" not in ex:
                notes.append("NO codegen span")
            if rows and "HashAggregate" in ex and "partial_" not in ex:
                notes.append("NO map-side partial aggregation")
        for col in want.get("prune", []):
            pass  # presence asserted below via ReadSchema width
        m_rs = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        if want.get("prune") and m_rs:
            read_cols = {c.split(":")[0] for c in m_rs[0].split(",") if c}
            extra = read_cols - set(want["prune"])
            if extra:
                notes.append(f"scan reads extra cols: {sorted(extra)}")
        status = "PASS" if not notes else "WARN"
        if notes:
            any_warn = True
        print(f"{status:4} {name}: {'; '.join(notes) or 'pushdown/broadcast/codegen as expected'}")
        for line in plan.splitlines():
            if "PushedFilters" in line or "ReadSchema" in line or "BroadcastHashJoin" in line.strip()[:40]:
                print("      " + line.strip()[:160])

    # As-of join shuffle discipline: the union-tag construction must plan
    # exactly ONE exchange (the key shuffle for the running window) — a
    # join-based as-of would show two-plus. Count unique Exchange operators
    # in the pre-AQE plan.
    asof_plan = plan_of(qs["asof_clicks"](spark, sf_dir))
    n_exch = len(re.findall(r"Arguments: hashpartitioning", asof_plan))
    # one hash exchange for the window key; the final orderBy adds a range
    # exchange which is presentation-only
    ok = n_exch == 1
    any_warn |= not ok
    print(
        f"{'PASS' if ok else 'WARN'} asof_clicks: {n_exch} hash exchange(s) "
        f"({'single-shuffle union-tag plan' if ok else 'unexpected extra shuffles'})"
    )

    # Plan-size guard: ANN plans at embedding dim 1536 must NOT inline
    # hyperplanes/centroids as literals (n_tables*n_bits*1536 constants broke
    # codegen limits before they moved to broadcast DataFrames).
    import numpy as np

    from entity_resolver_spark.operators.similarity_search import ivf_topk, lsh_topk

    rng = np.random.RandomState(0)
    wide = spark.createDataFrame(
        [(i, rng.normal(size=1536).tolist()) for i in range(64)],
        "vec_id int, embedding array<double>",
    )
    for label, fn in (("lsh_topk", lsh_topk), ("ivf_topk", ivf_topk)):
        plan = plan_of(fn(wide, wide.limit(4), k=3))
        size_kb = len(plan) / 1024
        ok = size_kb < 256
        any_warn |= not ok
        print(f"{'PASS' if ok else 'WARN'} {label}@dim1536: plan {size_kb:.0f} KiB "
              f"({'broadcast planes/centroids' if ok else 'plan bloated — literals leaked back?'})")
    sys.exit(1 if any_warn else 0)


if __name__ == "__main__":
    main()
