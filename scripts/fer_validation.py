"""FER validation sweep: run every decode method on real TPU hardware at a
few SNR points and write a markdown results table.

The reference publishes no numbers (BASELINE.md), so the validation
contract is (a) bit-exactness of the datapath vs the golden model - the
test suite - plus (b) physically-sane FER waterfalls per method on
hardware, recorded here for cross-round comparison.

Usage: python scripts/fer_validation.py [--out docs/VALIDATION.md]
       [--snrs 3.6,3.8,4.0] [--methods 0,1,2,3,4,5] [--min-errors 30]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="docs/VALIDATION.md")
    ap.add_argument("--json-out", type=str, default="docs/validation.json")
    ap.add_argument("--snrs", type=str, default="3.6,3.8,4.0")
    ap.add_argument("--methods", type=str, default="0,1,2,3,4,5")
    ap.add_argument("--min-errors", type=int, default=30)
    ap.add_argument("--min-frames", type=int, default=2048)
    ap.add_argument("--max-rounds", type=int, default=400)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--stop-mode", choices=["frame", "group"],
                    default="frame",
                    help="early-stop granularity; 'group' = reference "
                         "32-frame-word emulation")
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--factors", type=str, default="1,6",
                    help="Factor_1,Factor_2 (reference Profile defaults)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from faid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from faid_tpu.code.qc_matrix import load_code
    from faid_tpu.config import DecodeMethod, SimConfig
    from faid_tpu.sim.pipeline import build_sim_loop

    code = load_code("50gpon")
    snrs = [float(s) for s in args.snrs.split(",")]
    methods = [int(m) for m in args.methods.split(",")]
    f1, f2 = (int(x) for x in args.factors.split(","))
    rounds = 4

    rows = []
    for m in methods:
        method = DecodeMethod(m)
        cfg = SimConfig(decode_method=method, max_iteration=6, mod_type=2,
                        batch_per_device=args.batch, seed=args.seed,
                        factor_1=f1, factor_2=f2,
                        stop_mode=args.stop_mode, backend=args.backend,
                        fake_encode=True)
        loop = jax.jit(build_sim_loop(code, cfg, rounds,
                                      backend=cfg.backend))
        for si, snr in enumerate(snrs):
            sigma = jnp.float32(cfg.sigma_at(snr))
            # Distinct noise stream per (method, SNR) point: the round
            # index is folded in by build_sim_loop, so the base key only
            # needs to separate points.  (Round 1 reused one stream for
            # every SNR of a method - common random numbers - and let the
            # first row absorb compile time; both fixed here.)
            key = jax.random.fold_in(
                jax.random.key(args.seed), m * 1000 + si)
            c = {"test_frames": 0, "error_frames": 0, "error_bits": 0,
                 "lt3_frames": 0, "mp_iters": 0, "bf_rounds": 0}
            # Warm-up call compiles (and is discarded) so Mbit/s and the
            # counters measure steady state only.  device_get, not
            # block_until_ready: the latter can return before the fresh
            # dispatch executed (docs/ROOFLINE.md), bleeding warm-up
            # work into the timed region.
            jax.device_get(
                loop(jax.random.fold_in(key, 0xFFFFFFFF), sigma,
                     jnp.int32(1 << 20)))
            t0 = time.monotonic()
            rnd = 0
            while ((c["test_frames"] < args.min_frames
                    or c["error_frames"] < args.min_errors)
                   and rnd < args.max_rounds):
                out = loop(key, sigma, jnp.int32(rnd))
                out = jax.device_get(out)
                for k in c:
                    c[k] += int(out[k])
                rnd += rounds
            dt = time.monotonic() - t0
            tf = max(c["test_frames"], 1)
            row = {
                "method": method.name, "snr_db": snr,
                "frames": c["test_frames"],
                "error_frames": c["error_frames"],
                "fer": c["error_frames"] / tf,
                "ber": c["error_bits"] / (tf * code.n_info),
                "avg_mp_iters": c["mp_iters"] / tf,
                "avg_bf_rounds": c["bf_rounds"] / tf,
                "mbit_s": tf * code.n_info / dt / 1e6,
                "seconds": dt,
            }
            rows.append(row)
            print(f"{method.name:10s} {snr:4.1f} dB  FER {row['fer']:.3e}  "
                  f"BER {row['ber']:.3e}  frames {tf}  "
                  f"{row['mbit_s']:.0f} Mbit/s  {dt:.1f}s", flush=True)

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    lines = [
        "# FER validation (real TPU v5e, QPSK, 6 MP iterations, "
        "all-zero codeword, scale 13, 4-bit channel LLRs)\n\n",
        "Generated by scripts/fer_validation.py. Decoders are bit-exact "
        "vs the scalar golden model (tests/test_decoders.py); this table "
        "records the hardware FER waterfall per method.\n\n",
        "| method | SNR(dB) | frames | errFrames | FER | BER | "
        "avg MP it | avg BF rounds | Mbit/s |\n",
        "|---|---|---|---|---|---|---|---|---|\n",
    ]
    for r in rows:
        lines.append(
            f"| {r['method']} | {r['snr_db']:.1f} | {r['frames']} | "
            f"{r['error_frames']} | {r['fer']:.3e} | {r['ber']:.3e} | "
            f"{r['avg_mp_iters']:.2f} | {r['avg_bf_rounds']:.2f} | "
            f"{r['mbit_s']:.0f} |\n")
    out_path.write_text("".join(lines))
    Path(args.json_out).write_text(json.dumps(rows, indent=1))
    print(f"wrote {out_path} and {args.json_out}")


if __name__ == "__main__":
    main()
