"""Reference-binary FER curve generation (VERDICT round 1, item 1b).

Runs the compiled reference decoders through a full Monte-Carlo chain
(FakeEncoder all-zero codeword -> QPSK -> AWGN -> reference demod ->
reference 4-bit quantizer -> reference decoder -> reference
CalculateErrors) via scripts/refcheck/harness.cpp `fer` mode, and writes
docs/refcheck_fer.json.

The RNG is std::mt19937 (the documented deviation: statistical
equivalence, not MKL stream parity); everything downstream of the noise
draw is the reference's own code.  Compare with faid_tpu's measured FER
(scripts/fer_validation.py --stop-mode group) using
scripts/refcheck/compare_fer.py.

Usage: python scripts/refcheck/run_fer.py [--snrs 3.6,3.8]
         [--min-errors 50] [--max-rounds 40000] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import math
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parents[2]
BUILD = REPO / ".refbuild"
RATE = 0.8444444

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from common import write_profile  # noqa: E402  (shared Profile template)


METHOD_NAMES = ["NMS", "OMS", "FAID_DTBF", "OMS_BF", "OMS_DTBF",
                "FAID_2B1C"]


def sigma_at(snr_db: float, mod_type: int = 2) -> float:
    return 1.0 / math.sqrt(RATE * mod_type * 10 ** (snr_db / 10))


def run_point(wd, method, f1, f2, snr, min_errors, max_rounds, seed,
              chunk=500):
    write_profile(wd, method, f1, f2)
    sigma = sigma_at(snr)
    frames = errors = bits = lt3 = 0
    t0 = time.monotonic()
    rounds_done = 0
    while (errors < min_errors and rounds_done < max_rounds):
        r = subprocess.run(
            [str(BUILD / "refharness"), "fer", str(method), "6",
             f"{sigma:.9f}", "13", str(chunk),
             str(seed + rounds_done), "2"],
            cwd=wd, check=True, capture_output=True, text=True)
        out = json.loads(r.stdout)
        frames += out["test_frames"]
        errors += out["error_frames"]
        bits += out["error_bits"]
        lt3 += out["lt3_frames"]
        rounds_done += chunk
    dt = time.monotonic() - t0
    return {
        "method": METHOD_NAMES[method], "snr_db": snr,
        "factor_1": f1, "factor_2": f2,
        "frames": frames, "error_frames": errors,
        "fer": errors / max(frames, 1),
        "ber": bits / max(frames, 1) / 14592,
        "lt3_frames": lt3, "seconds": round(dt, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snrs", default="3.6,3.8")
    ap.add_argument("--methods", default="0,1,2,3,4,5")
    ap.add_argument("--min-errors", type=int, default=50)
    ap.add_argument("--max-rounds", type=int, default=40000)
    ap.add_argument("--seed", type=int, default=424242)
    ap.add_argument("--out", default=str(REPO / "docs/refcheck_fer.json"))
    args = ap.parse_args()

    if not (BUILD / "refharness").exists():
        subprocess.run(["bash", str(REPO / "scripts/refcheck/build.sh")],
                       check=True)

    snrs = [float(s) for s in args.snrs.split(",")]
    methods = [int(m) for m in args.methods.split(",")]
    rows = []
    with tempfile.TemporaryDirectory() as td:
        wd = pathlib.Path(td)
        for m in methods:
            # NMS with the shared Profile factors 1/6 degenerates
            # ((min*factor)>>5 == 0, FER 1.0); run it at its own 26/32
            # as well so a meaningful NMS point is validated.
            factor_sets = [(26, 32), (1, 6)] if m == 0 else [(1, 6)]
            for f1, f2 in factor_sets:
                for snr in snrs:
                    row = run_point(wd, m, f1, f2, snr, args.min_errors,
                                    args.max_rounds, args.seed)
                    rows.append(row)
                    print(f"{row['method']:10s} {snr:.1f} dB f={f1}/{f2}  "
                          f"FER {row['fer']:.3e} "
                          f"({row['error_frames']}/{row['frames']}) "
                          f"{row['seconds']}s", flush=True)
    pathlib.Path(args.out).write_text(json.dumps(rows, indent=1) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.exit(main())
