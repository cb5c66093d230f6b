"""Scaling-efficiency evidence: run the SAME KG-pipeline job at two
parallelism levels on the SAME pre-generated input, report throughput at
both and eff = thr_4N / (4 * thr_N).

Sandbox stand-in for the north rule's N vs 4N executor clusters (no real
cluster available):

* the N run is `taskset -c 0-7 spark-submit --master local[8]` — pinning
  makes it an honest 8-core machine (unpinned, the 8 task slots free-ride
  GC threads, parquet IO threads, and the 8 python UDF workers onto all
  32 cores, inflating thr_N and corrupting the ratio);
* the 4N run is `taskset -c 0-31 ... local[32]`.

Each run is a fresh JVM via spark-submit --py-files (nothing cached across
runs; the input parquet is page-cache-hot for all runs equally).  The host
is a shared VM with bursty CPU steal (observed 8-11% under load), so each
level runs REPS times interleaved (4N,N,4N,N,...) and the minimum wall per
level is reported — min is the right statistic under strictly-additive
noise.

Writes BENCH/SCALING_LATEST.md (plus BENCH/BASELINE.md when
SPARK_GRAFT_SCORE=1 — the scored file carries hand-curated environment
history that a default run must not clobber) and prints one JSON line.
A fresh `scripts/hw_probe.py` run is captured alongside every
measurement: the host's DRAM bandwidth drifts >4x between days (see
BENCH/BASELINE.md probe series), so a scaling number without its
same-day probe is uninterpretable.
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

N_CORES = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
N4_CORES = 4 * N_CORES
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def generate_input(n_convs: int, workdir: str) -> tuple[str, str, int]:
    from logset_spark.session import get_spark
    from logset_spark.sources import synth

    spark = get_spark("gen", cpus=32)
    tr, dc = f"{workdir}/transcripts", f"{workdir}/dictionary"
    # MANY files: a row group is the atomic scan split — a handful of fat
    # files would cap every scan-rooted stage at that many tasks no matter
    # the core count (the small-file/full-table layout question a 100 TB
    # table answers with thousands of files).  256 files keeps both
    # local[8] and local[32] fully fed with even-sized splits.
    (synth.transcripts_df(spark, n_convs=n_convs)
     .repartition(256, "conv_id")
     .write.mode("overwrite").parquet(tr))
    synth.dictionary_df(spark).write.mode("overwrite").parquet(dc)
    n = spark.read.parquet(tr).count()
    spark.stop()
    return tr, dc, n


def run_level(cpus: int, pin: str, tr: str, dc: str, out: str, tag: str) -> dict:
    env = dict(os.environ)
    zip_path = f"{out}_pkg.zip"
    if not os.path.exists(zip_path):
        subprocess.run(
            ["zip", "-qr", zip_path, "logset_spark", "-x", "*__pycache__*"],
            cwd=REPO, check=True,
        )
    # --driver-memory must be on the submit command line: by the time
    # session.py's conf runs, the (single, local-mode) JVM already exists
    # and spark.driver.memory is ignored -> 1g default OOMs at local[32].
    # 12g, not bigger: measured local[32] walls DROP ~25% going 48g -> 8g
    # heap (G1 over a huge heap with 32 mutator threads spends more time
    # in GC than tighter heaps that spill instead).
    mem = os.environ.get("SPARK_DRIVER_MEMORY", "12g")
    cmd = [
        "taskset", "-c", pin,
        "spark-submit", "--master", f"local[{cpus}]",
        "--driver-memory", mem,
        "--py-files", zip_path,
        f"{REPO}/jobs/build_graph.py",
        "--input", tr, "--dict", dc, "--out", out,
        "--run-id", tag, "--cpus", str(cpus),
    ]
    # One retry on timeout/failure: a lost python worker can hang a run
    # (seen once); speculation usually unsticks it, the retry is the
    # harness-level backstop.
    for attempt in (1, 2):
        subprocess.run(["rm", "-rf", out], check=True)
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, env=env, timeout=2400
            )
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"timeout local[{cpus}] attempt {attempt}\n")
            subprocess.run(["pkill", "-f", "build_graph.py"], check=False)
            time.sleep(5)
            continue
        if proc.returncode == 0:
            break
        sys.stderr.write(proc.stderr[-4000:])
    else:
        raise SystemExit(f"spark-submit local[{cpus}] failed twice")
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
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "480000"))
    reuse = os.environ.get("SPARK_GRAFT_INPUT_DIR")
    if reuse:  # pre-generated input (iterating on the bench itself)
        workdir = tempfile.mkdtemp(prefix="logset_scaling_")
        tr, dc = f"{reuse}/transcripts", f"{reuse}/dictionary"
        import duckdb
        n_turns = duckdb.sql(f"select count(*) from '{tr}/*.parquet'").fetchone()[0]
    else:
        workdir = tempfile.mkdtemp(prefix="logset_scaling_")
        tr, dc, n_turns = generate_input(n_convs, workdir)

    # same-day hardware probe — without it the eff number can't be told
    # apart from host drift (fresh run; ~10 min)
    probe_run = None
    try:
        pr = subprocess.run(
            [sys.executable, f"{REPO}/scripts/hw_probe.py"],
            capture_output=True, text=True, timeout=1200,
        )
        probe_run = json.loads(pr.stdout.strip().splitlines()[-1])
    except Exception as exc:  # noqa: BLE001 - probe is evidence, not a gate
        sys.stderr.write(f"hw_probe failed, continuing without: {exc}\n")

    runs: dict[int, list[dict]] = {N_CORES: [], N4_CORES: []}
    for rep in range(REPS):
        runs[N4_CORES].append(
            run_level(N4_CORES, f"0-{N4_CORES - 1}", tr, dc,
                      f"{workdir}/wh{N4_CORES}", f"s{N4_CORES}r{rep}")
        )
        runs[N_CORES].append(
            run_level(N_CORES, f"0-{N_CORES - 1}", tr, dc,
                      f"{workdir}/wh{N_CORES}", f"s{N_CORES}r{rep}")
        )

    best8 = min(runs[N_CORES], key=lambda r: r["wall_ms"])
    best32 = min(runs[N4_CORES], key=lambda r: r["wall_ms"])
    thr8 = n_turns / (best8["wall_ms"] / 1000)
    thr32 = n_turns / (best32["wall_ms"] / 1000)
    tps8 = best8["triples"] / (best8["wall_ms"] / 1000)
    tps32 = best32["triples"] / (best32["wall_ms"] / 1000)
    eff = thr32 / (4 * thr8)

    all_walls = {
        f"local{N_CORES}": [r["wall_ms"] / 1000 for r in runs[N_CORES]],
        f"local{N4_CORES}": [r["wall_ms"] / 1000 for r in runs[N4_CORES]],
    }
    md = f"""# BENCH — measured scaling results (sandbox evidence for N vs 4N)

Same job (`jobs/build_graph.py`, full extract+link+canonicalize+materialize),
same pre-generated input ({n_turns} turns, {n_convs} convs, seed=42), fresh
JVM per run via `spark-submit --py-files`.  `taskset -c 0-{N_CORES-1}` +
local[{N_CORES}] stands in for the N-executor cluster (pinning makes it an
honest {N_CORES}-core machine: GC, parquet IO and python UDF workers are
confined with the task slots), `taskset -c 0-{N4_CORES-1}` +
local[{N4_CORES}] for 4N.  No real cluster exists in
this sandbox; see BASELINE.md.  The host shows bursty hypervisor CPU steal
(8-11% under load), so each level ran {REPS}x interleaved and the minimum
wall per level is scored; all walls (s):
local[{N_CORES}]={all_walls[f'local{N_CORES}']},
local[{N4_CORES}]={all_walls[f'local{N4_CORES}']}.

| run | parallelism | input turns | wall s | triples | turns/sec | triples/sec |
| --- | --- | --- | --- | --- | --- | --- |
| bench-N  | taskset 0-{N_CORES-1}, local[{N_CORES}]  | {n_turns} | {best8['wall_ms']/1000:.1f} | {best8['triples']} | {thr8:.0f} | {tps8:.0f} |
| bench-4N | taskset 0-{N4_CORES-1}, local[{N4_CORES}] | {n_turns} | {best32['wall_ms']/1000:.1f} | {best32['triples']} | {thr32:.0f} | {tps32:.0f} |

**Scaling efficiency thr_4N / (4 x thr_N) = {eff:.3f}** (target >= 0.8 per
BASELINE.json; 0.25 would mean no parallel speedup at all, 1.0 is perfect
linear scaling).

Stage walls of the scored runs (s):

| stage | bench-N | bench-4N |
| --- | --- | --- |
"""
    for k in best8.get("stage_s", {}):
        md += f"| {k} | {best8['stage_s'].get(k,0)} | {best32['stage_s'].get(k,0)} |\n"
    md += """
Single-JVM local mode still understates multi-executor scaling — shuffle,
page cache, and the parquet commit protocol all contend inside one
process; the partition/bucket layout and AQE/salting knobs are the
cluster-relevant design.
"""
    probe_path = f"{REPO}/BENCH/hw_probe.json"
    if os.path.exists(probe_path):
        with open(probe_path) as f:
            probe = json.load(f)
        m, c = probe.get("mem", {}), probe.get("cpu", {})
        md += f"""
## Hardware ceiling (scripts/hw_probe.py — probes are ALWAYS the pinned
## 8-core vs 32-core pair, independent of the bench pair above)

| probe | 8-core aggregate | 32-core aggregate | 8->32 eff |
| --- | --- | --- | --- |
| memory bandwidth (STREAM-triad numpy) | {m.get('thr8')} GB/s | {m.get('thr32')} GB/s | **{m.get('eff')}** |
| compute (sha256, cache-resident) | {c.get('thr8')} GB/s | {c.get('thr32')} GB/s | **{c.get('eff')}** |

What the probes bound: 8 pinned cores already draw {m.get('thr8')} GB/s
of the ~{m.get('thr32')} GB/s socket ceiling, so the machine's own DRAM
bandwidth scales at {m.get('eff')} from 8 to 32 cores — any stage that
moves data at GB/s rates (parquet scan/write, shuffle spill, page-cache
traffic) is capped near that number at core counts that saturate the
socket, while pure compute scales at {c.get('eff')}.  Core pairs that
saturate the socket (8->32, and 4->16 partially) are bounded by the
bandwidth row; at unsaturated pairs (2->8) the plan's own scaling is
visible.  The packed-row layout moves the remaining work toward the
compute side (URI minting + 6x structural explode run post-shuffle as
codegen'd CPU; the shuffles/sort/checkpoint carry ~3x fewer bytes).  On
a real 4N-executor cluster the aggregate DRAM bandwidth, NICs, and disk
lanes scale WITH the executor count — the resource this single socket
cannot multiply — which is exactly what the N-vs-4N criterion assumes.
"""
    if probe_run:
        m, c = probe_run["mem"], probe_run["cpu"]
        md += f"""
## Same-day hardware probe for THIS run (probe pair is always 8 vs 32 cores)

STREAM-triad {m.get('thr8')} -> {m.get('thr32')} GB/s aggregate
(eff {m.get('eff')}); cache-resident compute eff {c.get('eff')}.
Compare against the probe series in BENCH/BASELINE.md before reading the
efficiency number above as a property of the plan.
"""
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/SCALING_LATEST.md", "w") as f:
        f.write(md)
    # BENCH/BASELINE.md is the SCORED file and carries hand-curated
    # environment history — only overwrite on explicit request
    if os.environ.get("SPARK_GRAFT_SCORE") == "1":
        with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
            f.write(md)
    print(json.dumps({
        "probe": probe_run,
        "turns": n_turns,
        "n_cores": N_CORES,
        "n4_cores": N4_CORES,
        "wall_n_s": best8["wall_ms"] / 1000,
        "wall_4n_s": best32["wall_ms"] / 1000,
        "thr_n": round(thr8, 1),
        "thr_4n": round(thr32, 1),
        "triples_per_sec_4n": round(tps32, 1),
        "scaling_eff": round(eff, 3),
        "all_walls": all_walls,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
