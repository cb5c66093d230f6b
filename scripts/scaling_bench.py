"""Scaling-efficiency evidence: run the SAME KG-pipeline job at two
parallelism levels (local[8] vs local[32]) on the SAME pre-generated
input, report throughput at both and eff = thr_32 / (4 * thr_8).

This is the sandbox stand-in for the north rule's N vs 4N executor
clusters (no real cluster available).  Each level runs in a fresh
subprocess (fresh JVM) via spark-submit so nothing is cached across runs.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def generate_input(n_convs: int, workdir: str) -> tuple[str, str, int]:
    from logset_spark.session import get_spark
    from logset_spark.sources import synth

    spark = get_spark("gen", cpus=8)
    tr, dc = f"{workdir}/transcripts", f"{workdir}/dictionary"
    # Write MANY files: each synth file is a single parquet row group, and
    # a row group is the atomic scan split — 8 fat files would cap every
    # scan-rooted stage at 8 tasks no matter the core count (exactly the
    # small-file/full-table layout question a 100 TB table answers with
    # thousands of files).  128 files keeps both local[8] and local[32]
    # fully fed.
    (synth.transcripts_df(spark, n_convs=n_convs)
     .repartition(128, "conv_id")
     .write.mode("overwrite").parquet(tr))
    synth.dictionary_df(spark).write.mode("overwrite").parquet(dc)
    n = spark.read.parquet(tr).count()
    spark.stop()
    return tr, dc, n


def run_level(cpus: int, tr: str, dc: str, out: str) -> dict:
    env = dict(os.environ)
    zip_path = f"{out}_pkg.zip"
    subprocess.run(
        ["zip", "-qr", zip_path, "logset_spark"], cwd=REPO, check=True
    )
    t0 = time.monotonic()
    # --driver-memory must be on the submit command line: by the time
    # session.py's conf runs, the (single, local-mode) JVM already exists
    # and spark.driver.memory is ignored -> 1g default -> OOM at local[32].
    mem = os.environ.get("SPARK_DRIVER_MEMORY", "48g")
    proc = subprocess.run(
        [
            "spark-submit", "--master", f"local[{cpus}]",
            "--driver-memory", mem,
            "--py-files", zip_path,
            f"{REPO}/jobs/build_graph.py",
            "--input", tr, "--dict", dc, "--out", out,
            "--run-id", f"scale{cpus}", "--cpus", str(cpus),
        ],
        capture_output=True, text=True, env=env,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"spark-submit local[{cpus}] failed rc={proc.returncode}")
    wall = time.monotonic() - t0
    last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    res = json.loads(last)
    res["submit_wall_s"] = round(wall, 1)
    res["cpus"] = cpus
    return res


def main() -> int:
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "120000"))
    workdir = tempfile.mkdtemp(prefix="logset_scaling_")
    tr, dc, n_turns = generate_input(n_convs, workdir)

    r8 = run_level(8, tr, dc, f"{workdir}/wh8")
    r32 = run_level(32, tr, dc, f"{workdir}/wh32")

    thr8 = n_turns / (r8["wall_ms"] / 1000)
    thr32 = n_turns / (r32["wall_ms"] / 1000)
    tps8 = r8["triples"] / (r8["wall_ms"] / 1000)
    tps32 = r32["triples"] / (r32["wall_ms"] / 1000)
    eff = thr32 / (4 * thr8)

    md = f"""# BENCH — measured scaling results (sandbox evidence for N vs 4N)

Same job (`jobs/build_graph.py`, full extract+link+canonicalize+materialize),
same pre-generated input ({n_turns} turns, {n_convs} convs, seed=42), fresh
JVM per run via `spark-submit --py-files`.  local[8] stands in for the
N-executor cluster, local[32] for 4N (no real cluster in this sandbox; see
BASELINE.md).

| run | parallelism | input turns | wall s | triples | turns/sec | triples/sec |
| --- | --- | --- | --- | --- | --- | --- |
| bench-N  | local[8]  | {n_turns} | {r8['wall_ms']/1000:.1f} | {r8['triples']} | {thr8:.0f} | {tps8:.0f} |
| bench-4N | local[32] | {n_turns} | {r32['wall_ms']/1000:.1f} | {r32['triples']} | {thr32:.0f} | {tps32:.0f} |

**Scaling efficiency thr_4N / (4 x thr_N) = {eff:.3f}** (target >= 0.8 per
BASELINE.json; values near 0.25 would mean no parallel speedup at all, 1.0
is perfect linear scaling).
"""
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps({
        "turns": n_turns, "wall8_s": r8["wall_ms"] / 1000,
        "wall32_s": r32["wall_ms"] / 1000, "thr8": round(thr8, 1),
        "thr32": round(thr32, 1), "triples_per_sec_32": round(tps32, 1),
        "scaling_eff": round(eff, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
