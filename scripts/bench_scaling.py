"""Scaling-efficiency evidence: the same job at N and 4N cores.

The north rule requires triple-emission throughput scaling efficiency
≥ 0.8 from N to 4N executors; this sandbox has no cluster, so (per the
driver instruction) we evidence it by running the same job at two
parallelism levels on the same input:

    efficiency = throughput(4N) / (4 × throughput(N))

throughput = triples_emitted / (assemble + fused split/extract wall sec)
— the triple-emitting phase the metric is defined over.

Measurement protocol (every deviation forced by the sandbox, documented
in BENCH.md):
  * each width runs CPU-pinned (``taskset -c 0..w-1``): local[N] otherwise
    uses ~2N cores (JVM task threads + Python UDF workers overlap), which
    inflates the small-width baseline and understates scaling;
  * the host exposes 32 vCPUs but sustains only ~5-6 cores of aggregate
    compute over minute-scale windows (hypervisor throttling: a 16-core
    pinned run achieves 4.2 effective cores).  Widths whose demand exceeds
    that budget cannot scale no matter the software, so the headline N→4N
    pair is **1→4**; 2→8 is reported as supplementary;
  * sf3 input (~8.7M turns): small inputs are fixed-overhead-bound and
    carry no parallelism signal;
  * best-of-R per width (neighbor-load variance is 2-3×), widths
    interleaved so a load spike cannot bias one width across all repeats.

Writes BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_bench(cpus: int, sf_dir: str, pin: bool) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_SKIP_RESOLVE="1",
        BENCH_SKIP_RELATIONAL="1",
    )
    cmd = [sys.executable, str(REPO / "bench.py")]
    if pin and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SCALING_SF_DIR", "/root/testdata/sf3")
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    pin = os.environ.get("SCALING_PIN", "1") == "1"

    # materialize the fixture once, outside the timed runs
    from neo4j_graphrag_python_spark import transcripts as tr

    tr.ensure_transcripts(sf_dir)

    widths = [1, 4, 2, 8]
    best: dict[int, dict] = {}
    for rep in range(repeats):
        for w in widths:  # interleaved: a load spike hurts one width once
            r = run_bench(w, sf_dir, pin)
            tput = r["triples_per_sec"]
            if w not in best or tput > best[w]["triples_per_sec"]:
                best[w] = r
            print(
                f"rep={rep} cpus={w:2d} triples/sec={tput:10.1f} "
                f"emit={r['queries']['kg_emit_fused']:7.2f}s",
                file=sys.stderr,
            )

    def eff(n: int, n4: int) -> float:
        return round(
            best[n4]["triples_per_sec"] / (4 * best[n]["triples_per_sec"]), 3
        )

    result = {
        "metric": "scaling_efficiency_1_to_4",
        "value": eff(1, 4),
        "unit": "ratio",
        "sf": best[1]["sf"],
        "throughput": {str(w): best[w]["triples_per_sec"] for w in widths},
        "efficiency_2_to_8": eff(2, 8),
        "pinned": pin,
    }
    print(json.dumps(result))

    md = f"""# BENCH — measured numbers (local sandbox)

## Triple-emission throughput scaling (north-rule evidence)

Input: deterministic synthetic transcripts at sf={best[1]['sf']}
({best[1]['triples_emitted']:,} emitted triples per run).  Measured
phase: document assembly + fused splitting/schema-guided extraction in one
mapInPandas pass (the triple-emitting operators).  Each width runs
CPU-pinned (`taskset -c 0..w-1`) in a fresh JVM; best of {repeats},
widths interleaved.

### Why this protocol (sandbox constraints, all measured)

* **Pinning**: unpinned `local[N]` consumes ~2N cores (N JVM task threads
  + N Python UDF workers overlap), silently inflating the small-width
  baseline — the opposite of a real cluster where an executor's cores are
  fixed.  `taskset` emulates fixed-size executors.
* **Why N=1 → 4N=4**: the host advertises 32 vCPUs but sustains only ~5-6
  cores of aggregate compute over minute-scale windows (measured on this
  exact job: 16 pinned cores → 4.2 effective; 8 pinned cores → 2.3-5.7
  depending on the minute).  Above that budget *no* workload can
  demonstrate scaling here.  1→4 keeps both widths inside the sustained
  budget; 2→8 brushes against it and is reported as supplementary.
* **Why sf3**: at sf0.1 the whole extraction is a few CPU-seconds —
  fixed-overhead-bound at every width, no parallelism signal.

| parallelism (pinned cores) | triples emitted/sec |
|---|---|
""" + "".join(
        f"| {w} | {best[w]['triples_per_sec']:,.1f} |\n" for w in sorted(best)
    ) + f"""
| pair | scaling efficiency = throughput@4N / (4 × throughput@N) |
|---|---|
| **1 → 4 cores** | **{eff(1,4)}** (target ≥ 0.8) |
| 2 → 8 cores (brushes the host's ~6-core sustained budget) | {eff(2,8)} |

Generated by scripts/bench_scaling.py.
"""
    # splice: replace ONLY the scaling section (start of file through the
    # "Generated by" marker line) and keep every later hand-written
    # section (pipeline wall times, ANN curve, size scaling, round notes)
    bench_path = REPO / "BENCH.md"
    marker = "Generated by scripts/bench_scaling.py.\n"
    if bench_path.exists():
        old = bench_path.read_text()
        idx = old.find(marker)
        if idx < 0:
            # refuse to guess: a missing marker would silently wipe every
            # hand-written section after the splice point
            raise SystemExit(
                f"BENCH.md exists but lacks the splice marker {marker!r}; "
                "refusing to overwrite hand-written sections — restore the "
                "marker line or remove BENCH.md."
            )
        tail = old[idx + len(marker) :]
    else:
        tail = ""
    bench_path.write_text(md + tail)
    print("wrote BENCH.md (scaling section spliced)", file=sys.stderr)


if __name__ == "__main__":
    main()
