"""Measured reference-binary throughput on this host (VERDICT r2 item 4).

BASELINE.md's protocol is "match or beat the reference on its own
workload"; this pins the denominator.  The harness `fer` mode reproduces
CSimulate::Run end-to-end (modulate -> AWGN -> demod -> 4-bit quantize
-> decode -> statistics) with the reference's own compiled AVX objects,
and the reference's production parallelism is one fully independent
pipeline per hardware thread joined each round (main.cpp:19,31,164-182)
- so the full-node figure is N independent harness processes, which if
anything *over*-credits the reference (no join barrier, no shared-LLC
contention from a parent process).

Throughput accounting matches bench.py: info bits / wall second
(frames * 14592).  Each timed run re-measures, never reuses, the
stopping-rule runs behind docs/refcheck_fer.json.

Usage: python scripts/refcheck/bench_ref.py [--rounds 400]
       -> docs/refcheck_cpu_bench.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parents[2]
BUILD = REPO / ".refbuild"
sys.path.insert(0, str(REPO / "scripts/refcheck"))
from common import write_profile  # noqa: E402

N_INFO = 14592
RATE = 14592.0 / 17664.0
FRAMES_PER_ROUND = 32


def sigma_at(snr_db: float, mod_type: int = 2) -> float:
    extra = 2.0 if mod_type == 1 else 1.0
    return 1.0 / math.sqrt(extra * RATE * mod_type * 10 ** (snr_db / 10))


def run_one(wd, method, snr, rounds, seed, nproc=1):
    """Time `nproc` concurrent harness processes; returns (frames, dt)."""
    sigma = sigma_at(snr)
    cmd = [str(BUILD / "refharness"), "fer", str(method), "6",
           f"{sigma:.9f}", "13", str(rounds), None, "2"]
    t0 = time.monotonic()
    procs = []
    for i in range(nproc):
        c = list(cmd)
        c[7] = str(seed + 7919 * i)
        procs.append(subprocess.Popen(c, cwd=wd, stdout=subprocess.DEVNULL))
    for p in procs:
        assert p.wait() == 0
    dt = time.monotonic() - t0
    return nproc * rounds * FRAMES_PER_ROUND, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=400)
    ap.add_argument("--method", type=int, default=2)   # FAID+DTBF
    ap.add_argument("--seed", type=int, default=20260818)
    ap.add_argument("--out",
                    default=str(REPO / "docs/refcheck_cpu_bench.json"))
    args = ap.parse_args()

    if not (BUILD / "refharness").exists():
        subprocess.run(["bash", str(REPO / "scripts/refcheck/build.sh")],
                       check=True)
    ncores = os.cpu_count()

    rows = []
    with tempfile.TemporaryDirectory() as td:
        wd = pathlib.Path(td)
        write_profile(wd, args.method, 1, 6)
        for snr in (3.8, 4.0):
            for nproc in (1, ncores):
                # warm-up (page cache, turbo settle) then timed run
                run_one(wd, args.method, snr, max(args.rounds // 8, 10),
                        args.seed, nproc)
                frames, dt = run_one(wd, args.method, snr, args.rounds,
                                     args.seed, nproc)
                mbps = frames * N_INFO / dt / 1e6
                rows.append({"snr_db": snr, "processes": nproc,
                             "frames": frames, "seconds": round(dt, 2),
                             "info_mbit_per_s": round(mbps, 1)})
                print(f"snr={snr} nproc={nproc}: {frames} frames "
                      f"in {dt:.1f}s = {mbps:.1f} Mbit/s", flush=True)

    model = "unknown"
    for line in pathlib.Path("/proc/cpuinfo").read_text().splitlines():
        if line.startswith("model name"):
            model = line.split(":", 1)[1].strip()
            break
    out = {
        "host": {"cpu": model + " (AVX-512)", "cores": ncores},
        "workload": "FAID+DTBF method2, QPSK, scale 13, 6 MP iters, "
                    "fer-mode full pipeline (harness.cpp)",
        "parallel_model": "one independent harness process per core == "
                          "the reference's per-thread CSimulate "
                          "(main.cpp:31,166-182), minus its join barrier",
        "rows": rows,
    }
    pathlib.Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
