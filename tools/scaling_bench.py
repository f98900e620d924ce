"""Two-parallelism scaling run (sandbox stand-in for N vs 4N executors).

Runs bench.py twice in fresh JVMs — local[N] and local[4N] — on identical
input, and reports throughput at both plus scaling efficiency:

    efficiency = (T_small / T_big) / (big_cores / small_cores)

per the north rule (target >= 0.8).  Results are appended to BENCH.md and
BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [small_cores] [big_cores] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_MODE=os.environ.get("SPARK_GRAFT_BENCH_MODE", "synth"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    r_small = run_once(small, sf_dir)
    r_big = run_once(big, sf_dir)

    t_small = r_small["queries"]["kg_build_full"]
    t_big = r_big["queries"]["kg_build_full"]
    tps_small = r_small["triples_per_sec"]
    tps_big = r_big["triples_per_sec"]
    speedup = t_small / t_big
    efficiency = speedup / (big / small)

    report = {
        "sf_dir": sf_dir,
        "small_cores": small,
        "big_cores": big,
        "t_small_sec": t_small,
        "t_big_sec": t_big,
        "triples": r_big["triples"],
        "triples_per_sec_small": tps_small,
        "triples_per_sec_big": tps_big,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(report))

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    md = f"""
## Scaling run {stamp}

Same job (full-mode KG build over the FIXTURES.md synthetic page corpus,
{r_big.get('docs','?')} docs: enqueue -> token-window chunking 256/32 ->
mock-LLM extraction + reference parser with 1 gleaning pass -> salted
two-phase merge x16 -> graph tables with degrees) on identical input at two
parallelism levels (fresh JVM each — sandbox stand-in for N vs 4N
executors):

| cores | wall sec | triples/sec |
|---|---|---|
| local[{small}] | {t_small} | {tps_small} |
| local[{big}] | {t_big} | {tps_big} |

speedup {small}->{big} cores: **{report['speedup']}x** over a {big/small:.0f}x
core increase => scaling efficiency **{report['scaling_efficiency']}**
(north-rule target >= 0.8). Triples emitted: {r_big['triples']}.

Raw: `{json.dumps(r_small)}`
Raw: `{json.dumps(r_big)}`
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    for path in (os.path.join(REPO, "BENCH.md"), os.path.join(REPO, "BENCH", "BASELINE.md")):
        with open(path, "a") as f:
            f.write(md)


if __name__ == "__main__":
    main()
