"""Per-round backend parity artifact: XLA vs Pallas on the FULL 50G-PON
code for all six decode methods, on whatever the current default device
is (real TPU in production; CPU runs use interpret mode and are only a
smoke test).

Round 1 ran this check manually for method 2 only; this script makes the
four-way lockstep rule (CLAUDE.md) a recorded artifact: writes
docs/backend_parity.json with per-method MATCH for hard bits, mp_iters
and bf_rounds on mixed-SNR inputs.

Usage: python scripts/backend_parity.py [--batch 128] [--words 2]
         [--out docs/backend_parity.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--words", type=int, default=2,
                    help="input batches per method (mixed SNRs)")
    ap.add_argument("--methods", type=str, default="0,1,2,3,4,5")
    ap.add_argument("--bt", type=int, default=32)
    ap.add_argument("--seed", type=int, default=20260817)
    ap.add_argument("--out", type=str,
                    default=str(Path(__file__).resolve().parent.parent
                                / "docs/backend_parity.json"))
    args = ap.parse_args()

    from faid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from faid_tpu.code.qc_matrix import load_code
    from faid_tpu.config import DecodeMethod, DecoderConfig
    from faid_tpu.decoders.core import build_decoder

    platform = jax.devices()[0].platform
    interpret = platform != "tpu"
    code = load_code("50gpon")
    rng = np.random.default_rng(args.seed)

    def inputs(w):
        snr = [3.3, 3.7, 4.1][w % 3]
        sigma = 1.0 / np.sqrt(0.8444444 * 2 * 10 ** (snr / 10))
        y = -1.0 + sigma * rng.standard_normal((args.batch, code.n_var))
        return jnp.asarray(np.clip(np.round(y * 13.0), -7, 7).astype(np.int8))

    rows, ok_all = [], True
    for m in (int(x) for x in args.methods.split(",")):
        method = DecodeMethod(m)
        f1, f2 = (26, 32) if method == DecodeMethod.NMS else (1, 6)
        dcfg = DecoderConfig.for_method(method, max_iter=6,
                                        factor_1=f1, factor_2=f2)
        t0 = time.monotonic()
        dec_x = jax.jit(build_decoder(code, dcfg, backend="xla"))
        dec_p = jax.jit(build_decoder(code, dcfg, backend="pallas",
                                      interpret=interpret,
                                      pallas_bt=args.bt))
        mism = {k: 0 for k in ("hard", "mp_iters", "bf_rounds")}
        frames = 0
        for w in range(args.words):
            llr = inputs(w)
            a = jax.tree.map(np.asarray, dec_x(llr))
            b = jax.tree.map(np.asarray, dec_p(llr))
            frames += args.batch
            for k in mism:
                mism[k] += int((a[k] != b[k]).sum())
        row = {"method": method.name, "frames": frames,
               "mismatches": mism,
               "match": all(v == 0 for v in mism.values()),
               "seconds": round(time.monotonic() - t0, 1)}
        ok_all &= row["match"]
        rows.append(row)
        print(f"{method.name:10s} {'MATCH' if row['match'] else 'MISMATCH'} "
              f"({frames} frames, {row['seconds']}s)", flush=True)

    rec = {"platform": platform, "interpret": interpret,
           "batch": args.batch, "bt": args.bt, "all_match": ok_all,
           "rows": rows}
    Path(args.out).write_text(json.dumps(rec, indent=1) + "\n")
    print(f"wrote {args.out}; all_match={ok_all}")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
