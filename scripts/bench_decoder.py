"""Compare decoder backends on the current default device (TPU).

Usage: python scripts/bench_decoder.py [--batch 512] [--method 2]
       [--iters 6] [--snr 4.0] [--backends xla,pallas] [--bt 32]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--method", type=int, default=2)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--snr", type=float, default=4.0)
    ap.add_argument("--sigma", type=float, default=None)
    ap.add_argument("--backends", type=str, default="xla,pallas")
    ap.add_argument("--bt", type=int, default=32)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--stop-mode", default="frame",
                    choices=["frame", "group"])
    ap.add_argument("--check", action="store_true",
                    help="compare backend outputs for equality")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from faid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from faid_tpu.code.qc_matrix import load_code
    from faid_tpu.config import DecodeMethod, DecoderConfig, SimConfig
    from faid_tpu.decoders.core import build_decoder

    code = load_code("50gpon")
    dcfg = DecoderConfig.for_method(DecodeMethod(args.method),
                                    max_iter=args.iters,
                                    stop_mode=args.stop_mode)
    scfg = SimConfig(snr_start=args.snr)
    sigma = args.sigma if args.sigma is not None else scfg.sigma_at(args.snr)

    rng = np.random.default_rng(0)
    # Distinct input per rep: repeated identical dispatches can be served
    # from caches in the execution path and fake the timing.
    llrs = []
    for _ in range(args.reps):
        y = -1.0 + sigma * rng.standard_normal((args.batch, code.n_var))
        llrs.append(jnp.asarray(
            np.clip(np.trunc(y * 13.0), -7, 7).astype(np.int8)))
    llr = llrs[0]

    outs = {}
    for backend in args.backends.split(","):
        dec = jax.jit(build_decoder(code, dcfg, backend=backend,
                                    pallas_bt=args.bt))
        t0 = time.perf_counter()
        out = dec(llr)
        jax.device_get(out["mp_iters"])
        compile_s = time.perf_counter() - t0
        # Per-dispatch device_get timing: indicative only (includes the
        # ~26 ms tunnel round trip per rep); rigorous per-decode numbers
        # come from the chained slope method in scripts/roofline.py.
        times = []
        for x in llrs:
            t0 = time.perf_counter()
            jax.device_get(dec(x)["mp_iters"])
            times.append(time.perf_counter() - t0)
        dt = min(times)
        mbps = args.batch * code.n_info / dt / 1e6
        fer = float(np.asarray(out["hard"]).any(axis=1).mean())
        print(f"{backend:8s} compile {compile_s:6.1f}s  step {dt*1e3:8.2f}ms"
              f"  {mbps:9.1f} Mbit/s  FER~{fer:.3f}  "
              f"avg_it {float(np.asarray(out['mp_iters']).mean()):.2f}")
        outs[backend] = jax.tree.map(np.asarray, out)

    if args.check and len(outs) == 2:
        a, b = outs.values()
        for k in ("hard", "mp_iters", "bf_rounds"):
            same = np.array_equal(a[k], b[k])
            print(f"  {k}: {'MATCH' if same else 'MISMATCH'}")


if __name__ == "__main__":
    main()
