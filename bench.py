#!/usr/bin/env python
"""Headline benchmark: decoded info-bit throughput (Mbit/s/chip) of the
full Monte-Carlo pipeline (encode -> QPSK -> AWGN -> demap -> 4-bit
quantize -> FAID+DTBF decode -> stats) on the 50G-PON code - the
reference's default Profile.txt configuration (QPSK, DecodeMethod 2,
6 MP iterations) measured mid-waterfall at 4.0 dB.

Timing is honest by construction: ``rounds`` Monte-Carlo rounds run
inside ONE on-device ``lax.fori_loop`` with the counters as a data
dependency, so async dispatch through the device tunnel cannot fake it.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mbit/s", "vs_baseline": N}

vs_baseline compares against bench_baseline.json (this framework's first
recorded TPU number; the reference repo publishes no throughput numbers -
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
                    help="frames per round (per chip)")
    ap.add_argument("--rounds", type=int, default=25,
                    help="rounds per on-device loop call (amortizes the "
                         "~26 ms per-dispatch tunnel overhead, exactly as "
                         "the reference amortizes with 50 rounds per "
                         "pthread dispatch; see docs/ROOFLINE.md)")
    ap.add_argument("--calls", type=int, default=8,
                    help="pipelined loop dispatches (all queued "
                         "asynchronously, one device_get at the end)")
    ap.add_argument("--snr", type=float, default=4.0)
    ap.add_argument("--method", type=int, default=2)
    ap.add_argument("--backend", type=str, default="auto")
    ap.add_argument("--channel", type=str, default="fused",
                    choices=["xla", "fused"],
                    help="channel backend (fused = quantile-sampling "
                         "kernel, statistically validated vs the float "
                         "chain: tests/test_pallas_channel.py + "
                         "docs/channel_parity.json)")
    ap.add_argument("--stop-mode", default="group",
                    choices=["frame", "group"],
                    help="early-stop granularity (default 'group' = the "
                         "reference's 32-frame-word semantics, which is "
                         "also the faster fused path; 'frame' = per-frame "
                         "freeze)")
    ap.add_argument("--encode", default="fake",
                    choices=["fake", "random"],
                    help="'fake' (default) = all-zero codeword, the "
                         "reference's own default run path (FAKE_ENCODE, "
                         "CSimulate.cpp:4,103) and what the CPU baseline "
                         "measured; 'random' = random messages through "
                         "the GF(2) encoder (a harder workload the "
                         "reference cannot run - its GenMatrix blobs are "
                         "missing)")
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from faid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from faid_tpu.code.qc_matrix import load_code
    from faid_tpu.config import DecodeMethod, SimConfig
    from faid_tpu.sim.pipeline import build_sim_loop

    code = load_code("50gpon")
    cfg = SimConfig(decode_method=DecodeMethod(args.method),
                    max_iteration=6, mod_type=2,
                    batch_per_device=args.batch, seed=0,
                    stop_mode=args.stop_mode,
                    fake_encode=args.encode == "fake",
                    channel_backend=args.channel)
    loop = jax.jit(build_sim_loop(code, cfg, args.rounds,
                                  backend=args.backend))
    sigma = jnp.float32(cfg.sigma_at(args.snr))
    key = jax.random.key(0)

    # Sync with device_get of the counters: block_until_ready through the
    # tunnel can return before a fresh dispatch executed (docs/ROOFLINE.md
    # "Measurement methodology").
    jax.device_get(loop(key, sigma, jnp.int32(0)))  # compile+warm

    # Pipeline the dispatches: every call gets a distinct round offset
    # (distinct inputs -> the tunnel cannot memoize), all are queued
    # asynchronously, and ONE device_get at the end forces every result.
    # The ~26 ms per-dispatch tunnel round trip then overlaps the
    # previous call's on-device compute instead of serializing with it -
    # the same amortization the reference gets from issuing 50 rounds
    # per pthread dispatch (CSimulate.cpp:117).  Honesty is preserved:
    # each call's counters are a data-dependent fori_loop reduction and
    # device_get of all of them cannot return before they are computed.
    t0 = time.perf_counter()
    outs = [loop(key, sigma, jnp.int32((c + 1) * args.rounds))
            for c in range(args.calls)]
    outs = jax.device_get(outs)
    dt = time.perf_counter() - t0
    out = jax.tree.map(lambda *xs: sum(xs), *outs)  # counters over all calls

    frames = args.batch * args.rounds * args.calls
    mbit_s = frames * code.n_info / dt / 1e6
    stats = {k: (v.tolist() if getattr(v, "ndim", 0) else int(v))
             for k, v in out.items()}

    # Baselines are keyed per encode mode so vs_baseline always compares
    # identical workloads (round-4 correction: the random-encode series
    # and the fake-encode headline are different workloads; docs/BENCH.md).
    base_path = Path(__file__).parent / "bench_baseline.json"
    base = json.loads(base_path.read_text()) if base_path.exists() else {
        "unit": "Mbit/s", "baselines": {}}
    entry = base.get("baselines", {}).get(args.encode)
    baseline = entry["value"] if entry else mbit_s
    if args.update_baseline or entry is None:
        base.setdefault("baselines", {})[args.encode] = {
            "value": mbit_s,
            "recorded": f"batch={args.batch} snr={args.snr} "
                        f"backend={args.backend}"}
        base_path.write_text(json.dumps(base, indent=2) + "\n")

    print(json.dumps({
        "metric": "decoded_info_throughput_faid_dtbf_qpsk_4dB",
        "value": round(mbit_s, 3),
        "unit": "Mbit/s",
        "vs_baseline": round(mbit_s / baseline, 4),
        "encode": args.encode,
        "baseline_same_workload": round(baseline, 3),
    }))
    # Context for humans (stderr-style extras kept off the JSON line).
    import sys
    from faid_tpu.sim.pipeline import _resolve_fused_sim
    fused_sim = (_resolve_fused_sim(code, cfg, args.backend, False)
                 is not None)
    print(f"# channel={args.channel} stop_mode={args.stop_mode} "
          f"backend={args.backend} encode={args.encode} "
          f"fused_sim_kernel={fused_sim} "
          f"frames={frames} wall={dt:.2f}s "
          f"fer={stats['error_frames']}"
          f"/{stats['test_frames']} avg_it="
          f"{stats['mp_iters']/max(stats['test_frames'],1):.2f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
