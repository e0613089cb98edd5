#!/usr/bin/env python
"""Headline benchmark: decoded info-bit throughput (Mbit/s/chip) of the
full Monte-Carlo pipeline (encode -> QPSK -> AWGN -> demap -> 4-bit
quantize -> FAID+DTBF decode -> stats) on the 50G-PON code, i.e. the
reference's default Profile.txt configuration (QPSK, DecodeMethod 2,
6 MP iterations) measured mid-waterfall at 4.0 dB.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mbit/s", "vs_baseline": N}

vs_baseline is measured against bench_baseline.json (this framework's
first recorded TPU number; the reference repo publishes no throughput -
see BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048,
                    help="frames per step (per chip)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--snr", type=float, default=4.0)
    ap.add_argument("--method", type=int, default=2)
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from faid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from faid_tpu.code.qc_matrix import load_code
    from faid_tpu.config import DecodeMethod, SimConfig
    from faid_tpu.sim.pipeline import build_sim_step

    code = load_code("50gpon")
    cfg = SimConfig(decode_method=DecodeMethod(args.method),
                    max_iteration=6, mod_type=2,
                    batch_per_device=args.batch, seed=0)
    step = jax.jit(build_sim_step(code, cfg))
    sigma = jnp.float32(cfg.sigma_at(args.snr))

    keys = [jax.random.fold_in(jax.random.key(0), i)
            for i in range(args.warmup + args.steps)]
    for i in range(args.warmup):
        jax.block_until_ready(step(keys[i], sigma))

    t0 = time.perf_counter()
    outs = []
    for i in range(args.warmup, args.warmup + args.steps):
        outs.append(step(keys[i], sigma))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    frames = args.batch * args.steps
    mbit_s = frames * code.n_info / dt / 1e6

    base_path = Path(__file__).parent / "bench_baseline.json"
    if base_path.exists():
        baseline = json.loads(base_path.read_text())["value"]
    else:
        baseline = mbit_s
    if args.update_baseline or not base_path.exists():
        base_path.write_text(json.dumps(
            {"value": mbit_s, "unit": "Mbit/s",
             "config": "QPSK FAID+DTBF 6it batch=%d snr=%.1f" % (
                 args.batch, args.snr)}))

    print(json.dumps({
        "metric": "decoded_info_throughput_faid_dtbf_qpsk_4dB",
        "value": round(mbit_s, 3),
        "unit": "Mbit/s",
        "vs_baseline": round(mbit_s / baseline, 4),
    }))


if __name__ == "__main__":
    main()
