"""FER consistency of the fused quantile channel vs the float channel,
measured on real TPU hardware (companion to docs/refcheck_fer_compare):
same config, same SNR points, independent random streams; the two FERs
must agree within Monte-Carlo error (two-proportion z-test).

    python scripts/channel_parity.py            # -> docs/channel_parity.json

Validates the end-to-end claim in ops/pallas_channel.py: identical
output *marginals* imply identical FER statistics, so a significant z
would mean a threshold bug or a hardware-PRNG defect.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SNRS = [3.6, 3.7]
MIN_ERRORS = 60
MAX_ROUNDS = 600
BATCH = 2048
ROUNDS_PER_CALL = 25
Z_THRESHOLD = 4.0


def main():
    from faid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from faid_tpu.code.qc_matrix import load_code
    from faid_tpu.config import DecodeMethod, SimConfig
    from faid_tpu.sim.pipeline import build_sim_loop

    code = load_code("50gpon")
    results = {}
    for chan in ("xla", "fused"):
        cfg = SimConfig(decode_method=DecodeMethod.FAID_DTBF,
                        max_iteration=6, mod_type=2,
                        batch_per_device=BATCH, seed=0,
                        channel_backend=chan)
        loop = jax.jit(build_sim_loop(code, cfg, ROUNDS_PER_CALL))
        for snr in SNRS:
            sigma = jnp.float32(cfg.sigma_at(snr))
            key = jax.random.fold_in(jax.random.key(cfg.seed),
                                     hash(chan) & 0x7FFFFFFF)
            frames = errors = rounds = 0
            t0 = time.perf_counter()
            while errors < MIN_ERRORS and rounds < MAX_ROUNDS:
                out = jax.device_get(loop(key, sigma, jnp.int32(rounds)))
                rounds += ROUNDS_PER_CALL
                frames += int(out["test_frames"])
                errors += int(out["error_frames"])
            results[(chan, snr)] = (frames, errors)
            print(f"{chan:5s} {snr} dB: {errors}/{frames} "
                  f"FER={errors / max(frames, 1):.3e} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

    points = []
    all_ok = True
    for snr in SNRS:
        fx, ex = results[("xla", snr)]
        ff, ef = results[("fused", snr)]
        p = (ex + ef) / (fx + ff)
        se = math.sqrt(p * (1 - p) * (1 / fx + 1 / ff)) if p > 0 else 0.0
        z = ((ex / fx) - (ef / ff)) / se if se else 0.0
        ok = abs(z) <= Z_THRESHOLD
        all_ok &= ok
        points.append({
            "snr_db": snr,
            "xla": {"frames": fx, "errors": ex, "fer": ex / fx},
            "fused": {"frames": ff, "errors": ef, "fer": ef / ff},
            "z": round(z, 3), "consistent": ok,
        })
        print(f"{snr} dB: z = {z:+.2f} ({'ok' if ok else 'FAIL'})")

    out_path = REPO / "docs" / "channel_parity.json"
    out_path.write_text(json.dumps({
        "config": f"QPSK method2 batch={BATCH} real-codeword",
        "z_threshold": Z_THRESHOLD,
        "points": points,
        "all_consistent": all_ok,
    }, indent=1))
    print(f"wrote {out_path}; all_consistent={all_ok}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
