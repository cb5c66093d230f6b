"""Hardware scaling ceiling probes for the N-vs-4N evidence.

Two micro-workloads, each run as P identical pinned processes
(P=8 on cores 0-7, P=32 on cores 0-31 — the same stand-ins
scripts/scaling_bench.py uses), reporting aggregate throughput and the
8->32 scaling efficiency thr_32 / (4 * thr_8):

* mem  — STREAM-triad-style numpy pass (a = b + s*c over ~256 MB/proc):
         pure memory bandwidth, the resource parquet scan/shuffle/write
         pressure most.
* cpu  — sha256 over a cache-resident 64 KiB buffer: pure ALU work with
         negligible DRAM traffic.

If the *machine itself* scales memory bandwidth at e < 1 from 8 to 32
cores, no bandwidth-bound stage of any job can beat e — that ceiling is
what BENCH/BASELINE.md quotes next to the pipeline's own efficiency.

Usage: python scripts/hw_probe.py [mem|cpu|all]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "3"))


def _worker_mem() -> float:
    import numpy as np

    n = 32 * 1024 * 1024  # 3 arrays x 256 MB working set per process
    b = np.random.default_rng(1).random(n)
    c = np.random.default_rng(2).random(n)
    a = np.empty_like(b)
    iters = 8
    t0 = time.monotonic()
    for _ in range(iters):
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)
    dt = time.monotonic() - t0
    # bytes touched per iter: read b, read c, write a (+RFO) ~ 4 arrays
    return iters * 4 * n * 8 / dt  # bytes/sec


def _worker_cpu() -> float:
    import hashlib

    buf = os.urandom(65536)
    iters = 3000
    t0 = time.monotonic()
    for _ in range(iters):
        hashlib.sha256(buf).digest()
    dt = time.monotonic() - t0
    return iters * len(buf) / dt  # bytes hashed/sec


def worker(kind: str) -> None:
    fn = _worker_mem if kind == "mem" else _worker_cpu
    print(json.dumps({"thr": fn()}))


def run_level(kind: str, nproc: int, pin: str) -> float:
    procs = [
        subprocess.Popen(
            ["taskset", "-c", pin, sys.executable, __file__, "--worker", kind],
            stdout=subprocess.PIPE, text=True,
        )
        for _ in range(nproc)
    ]
    total = 0.0
    for p in procs:
        out, _ = p.communicate()
        total += json.loads(out.strip().splitlines()[-1])["thr"]
    return total


def main() -> int:
    if "--worker" in sys.argv:
        worker(sys.argv[sys.argv.index("--worker") + 1])
        return 0
    kinds = [a for a in sys.argv[1:] if a in ("mem", "cpu")] or ["mem", "cpu"]
    out = {}
    for kind in kinds:
        best8 = best32 = 0.0
        for _ in range(REPS):  # interleave, keep max (min-noise) per level
            best32 = max(best32, run_level(kind, 32, "0-31"))
            best8 = max(best8, run_level(kind, 8, "0-7"))
        out[kind] = {
            "thr8": round(best8 / 1e9, 2),
            "thr32": round(best32 / 1e9, 2),
            "eff": round(best32 / (4 * best8), 3),
            "unit": "GB/s aggregate",
        }
    if len(kinds) == 2:  # full run: persist for scaling_bench's report
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        os.makedirs(f"{repo}/BENCH", exist_ok=True)
        with open(f"{repo}/BENCH/hw_probe.json", "w") as f:
            json.dump(out, f)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
