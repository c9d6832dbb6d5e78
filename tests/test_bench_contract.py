"""bench.py driver contract: exits 0 and prints ONE JSON line with the keys
the per-round harness and the scaling protocol read. The benchmark is the
repo's feedback loop — a broken import or a renamed key costs a whole round,
so the contract is pinned at the smallest corpus that exercises every stage.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REQUIRED_TOP = {
    "metric", "value", "unit", "queries", "sf",
    "er_records", "er_candidate_pairs", "er_clusters", "er_f1_strict",
    "pairs_scored_per_sec", "noise_ctl_s",
}
# every stage the scaling protocol or the round ledger reads by name
REQUIRED_QUERIES = {
    "agg_pricing", "exact_dedup", "token_stats", "sessionize",
    "er_normalize", "er_blocking", "er_vectors", "er_pair_inputs",
    "er_score_cold", "er_score", "er_cluster", "corpus_load",
}


def test_bench_one_json_line_contract():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_ENTITIES="200",
        SPARK_GRAFT_TPUT_ENTITIES="0",   # skip the work-bound segment
        SPARK_GRAFT_SKIP_ALT_JOIN="1",   # skip the side A/B
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    json_lines = [
        l for l in out.stdout.strip().splitlines() if l.startswith("{")
    ]
    assert len(json_lines) == 1, out.stdout[-2000:]
    row = json.loads(json_lines[0])
    assert REQUIRED_TOP <= row.keys(), sorted(REQUIRED_TOP - row.keys())
    assert REQUIRED_QUERIES <= row["queries"].keys(), sorted(
        REQUIRED_QUERIES - row["queries"].keys()
    )
    assert row["metric"] == "end_to_end_wall" and row["unit"] == "sec"
    assert row["value"] > 0 and row["er_records"] > 0
    assert row["er_candidate_pairs"] > 0 and row["er_clusters"] > 0
    # tiny corpus still resolves cleanly: the F1 gate proper runs at 2k+ in
    # the default bench; here it only needs to be a sane probability
    assert 0.9 <= row["er_f1_strict"] <= 1.0
