"""Scaling-efficiency evidence: run bench.py at N=8 and 4N=32 local cores on
identical input and report both throughputs + efficiency into BENCH/BASELINE.md.

(The north_rule asks for N vs 4N *executors*; this sandbox has no cluster, so
parallelism level stands in for executor count — same job, same input, two
parallelism levels, per the task instructions.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    r8 = run(8, sf_dir)
    r32 = run(32, sf_dir)
    tp8 = r8["pairs_scored_per_sec"]
    tp32 = r32["pairs_scored_per_sec"]
    # scaling efficiency: speedup achieved / speedup available (4x)
    eff = (tp32 / tp8) / 4.0
    wall_eff = (r8["value"] / r32["value"]) / 4.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = datetime.now(timezone.utc).isoformat()
    with open(path, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — throughput & N->4N scaling evidence

Generated {stamp} by `python scripts/run_scaling.py` on `{sf_dir}`
(local mode; parallelism level stands in for executor count — no real
cluster in this sandbox).

| parallelism | end-to-end wall (s) | candidate pairs | pairs scored/sec |
|---|---|---|---|
| local[8]  (N)  | {r8['value']} | {r8['er_candidate_pairs']} | {tp8} |
| local[32] (4N) | {r32['value']} | {r32['er_candidate_pairs']} | {tp32} |

- **Pair-scoring throughput scaling efficiency (N->4N): {eff:.3f}**
  (= (tp_4N / tp_N) / 4; target >= 0.8 per BASELINE.json — note local-mode
  fixed costs (JVM startup, plan compilation, Python worker spin-up) do not
  parallelize, so this under-states true multi-executor scaling)
- End-to-end wall scaling efficiency: {wall_eff:.3f}
- Reference throughput baseline: >50 records/sec classification
  (/root/reference/OPTIMIZATION_GUIDE.md:107); this engine scores
  {tp32} candidate pairs/sec at local[32].

Raw bench lines:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
        )
    print(f"wrote {path}; efficiency={eff:.3f}")


if __name__ == "__main__":
    main()
