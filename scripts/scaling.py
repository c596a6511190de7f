"""Scaling-efficiency evidence (north_rule: ≥0.8 from N to 4N parallelism).

No multi-node cluster exists in this sandbox, so per the driver instruction
we run the SAME job on the SAME input at local[8] and local[32] in separate
JVMs and report throughput at both plus efficiency = (T_32/T_8)/4.

Usage: python scripts/scaling.py [n_docs]   (default 40000)
Appends results to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cores: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/scaling_workload.py"), str(cores), str(n_docs)],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    r8 = run(8, n_docs)
    print(json.dumps(r8))
    r32 = run(32, n_docs)
    print(json.dumps(r32))
    build_eff = (r32["files_per_sec"] / r8["files_per_sec"]) / 4.0
    qps_eff = (r32["qps_batched"] / r8["qps_batched"]) / 4.0
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    md = f"""
## Scaling run {stamp} (n_docs={n_docs}, same input, local[8] vs local[32], JIT-warmed)

| cores | build_sec | files/sec | batch qps | query p50 (s) |
|---|---|---|---|---|
| 8  | {r8['build_sec']} | {r8['files_per_sec']} | {r8['qps_batched']} | {r8['query_p50_sec']} |
| 32 | {r32['build_sec']} | {r32['files_per_sec']} | {r32['qps_batched']} | {r32['query_p50_sec']} |

**Build (indexing) scaling efficiency 8→32 cores: {build_eff:.3f}** (target ≥ 0.8)
**Query-batch throughput scaling efficiency 8→32 cores: {qps_eff:.3f}**
Per-stage seconds at 8: {r8['stats_sec']}/{r8['segments_sec']}/{r8['term_stats_sec']} \
(doc-stats/segments/term-dict, fused single-shuffle build); \
at 32: {r32['stats_sec']}/{r32['segments_sec']}/{r32['term_stats_sec']}.
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
