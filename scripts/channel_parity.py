"""Fused-channel validation on real TPU hardware, two independent ways:

1. FER consistency vs the float channel (companion to
   docs/refcheck_fer_compare): same config, same SNR points, independent
   random streams; the two FERs must agree within Monte-Carlo error
   (two-proportion z-test).  Rows cover QPSK waterfall, BPSK (its own
   sigma convention), and a 4.0 dB floor-region sigma (with a weakened
   2-iteration decoder so frame errors stay countable - the channel
   thresholds being validated depend only on sigma/scale, not on the
   decoder strength).

2. LLR-histogram law check: the staircase outputs of the TPU kernel,
   histogrammed over ~1e9 draws, vs the float64-erfc analytic
   probabilities of each quantizer bin (an oracle independent of the
   float32-ndtr threshold construction in ops/pallas_channel.py).  This
   pins the deep-tail steps (|q|=7 wrong-sign at 4.0 dB has p ~ 1e-7)
   that FER statistics cannot resolve - exactly the regime the
   strict-compare threshold fix (round-3) changed.

    python scripts/channel_parity.py            # -> docs/channel_parity.json
"""

from __future__ import annotations

import json
import math
import sys
import time
import zlib
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

MIN_ERRORS = 60
MAX_ROUNDS = 600
BATCH = 2048
ROUNDS_PER_CALL = 25
Z_THRESHOLD = 4.0
# (label, mod_type, snr_db, max_iteration)
FER_ROWS = [
    ("qpsk", 2, 3.6, 6),
    ("qpsk", 2, 3.7, 6),
    ("bpsk", 1, 3.6, 6),
    ("qpsk-floor-sigma", 2, 4.0, 2),   # weak decoder: countable FER
]
HIST_ROWS = [("qpsk", 2, 3.6), ("qpsk", 2, 4.0), ("bpsk", 1, 4.0)]
HIST_ROUNDS = 30            # x BATCH x n_var draws ~ 1.1e9 per row


def stream_id(*parts) -> int:
    """PYTHONHASHSEED-independent stream separator."""
    return zlib.crc32("/".join(str(p) for p in parts).encode()) & 0x7FFFFFFF


def analytic_bin_probs(cfg, sigma):
    """float64 P(q = m) for a transmitted 0-bit, m in [lo, hi]; the
    truncating quantizer law q = clip(trunc(scale*(-a + s_rail*z)), lo,
    hi) evaluated with math.erfc - independent of the float32 kernel
    threshold path."""
    from faid_tpu.ops.fixed_point import _QUANT_LIMITS
    from faid_tpu.ops.pallas_channel import _AMPLITUDE

    lo, hi = _QUANT_LIMITS[cfg.quant_bits]
    a = _AMPLITUDE[cfg.mod_type]
    srail = sigma / math.sqrt(2.0) if cfg.mod_type == 2 else sigma

    def p_soft_ge(x):            # P(-a + srail*z >= x)
        return 0.5 * math.erfc((x + a) / srail / math.sqrt(2.0))

    probs = {}
    for m in range(lo, hi + 1):
        # q >= m  <=>  soft >= m (m >= 1);  q <= m  <=>  soft <= m (m <= -1)
        if m > 0:
            probs[m] = (p_soft_ge(m / cfg.scale)
                        - (p_soft_ge((m + 1) / cfg.scale) if m < hi else 0.0))
        elif m < 0:
            lo_edge = 1.0 - p_soft_ge(m / cfg.scale)
            hi_edge = 1.0 - p_soft_ge((m - 1) / cfg.scale) if m > lo else 0.0
            probs[m] = lo_edge - hi_edge
        else:
            probs[m] = (p_soft_ge(-1.0 / cfg.scale)
                        - p_soft_ge(1.0 / cfg.scale))
    return probs


def run_hist_row(code, label, mod, snr):
    import jax
    import jax.numpy as jnp

    from faid_tpu.config import SimConfig
    from faid_tpu.ops.pallas_channel import build_fused_channel

    cfg = SimConfig(mod_type=mod, batch_per_device=BATCH,
                    channel_backend="fused")
    chan = build_fused_channel(code, cfg)
    sigma = jnp.float32(cfg.sigma_at(snr))
    cw = jnp.zeros((BATCH, code.n_var), jnp.int8)

    @jax.jit
    def hist_step(key):
        llr, _ = chan(cw, key, sigma)
        return jnp.bincount(llr.astype(jnp.int32).reshape(-1) + 8,
                            length=16)

    key = jax.random.key(stream_id("hist", label, snr))
    counts = None
    for r in range(HIST_ROUNDS):
        h = jax.device_get(hist_step(jax.random.fold_in(key, r)))
        counts = h if counts is None else counts + h
    total = int(counts.sum())
    probs = analytic_bin_probs(cfg, float(sigma))
    bins, max_z, chi2, ndof = [], 0.0, 0.0, 0
    for m, p in sorted(probs.items()):
        obs = int(counts[m + 8])
        exp = p * total
        z = (obs - exp) / math.sqrt(max(exp * (1 - p), 1e-30)) if exp else 0.0
        ok_for_z = exp >= 25          # normal approx validity
        if ok_for_z:
            max_z = max(max_z, abs(z))
            chi2 += z * z
            ndof += 1
        bins.append({"q": m, "observed": obs, "expected": round(exp, 3),
                     "z": round(z, 2) if ok_for_z else None})
    return {"label": label, "mod_type": mod, "snr_db": snr,
            "draws": total, "bins": bins, "max_abs_z": round(max_z, 2),
            "chi2": round(chi2, 1), "ndof": ndof,
            "consistent": max_z <= 5.0}


def main():
    from faid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from faid_tpu.code.qc_matrix import load_code
    from faid_tpu.config import DecodeMethod, SimConfig
    from faid_tpu.sim.pipeline import build_sim_loop

    code = load_code("50gpon")
    points = []
    all_ok = True

    for label, mod, snr, max_it in FER_ROWS:
        res = {}
        for chan in ("xla", "fused"):
            cfg = SimConfig(decode_method=DecodeMethod.FAID_DTBF,
                            max_iteration=max_it, mod_type=mod,
                            batch_per_device=BATCH, seed=0,
                            channel_backend=chan)
            loop = jax.jit(build_sim_loop(code, cfg, ROUNDS_PER_CALL))
            sigma = jnp.float32(cfg.sigma_at(snr))
            key = jax.random.fold_in(jax.random.key(cfg.seed),
                                     stream_id(chan, label, snr))
            frames = errors = mbits = rounds = 0
            t0 = time.perf_counter()
            while errors < MIN_ERRORS and rounds < MAX_ROUNDS:
                out = jax.device_get(loop(key, sigma, jnp.int32(rounds)))
                rounds += ROUNDS_PER_CALL
                frames += int(out["test_frames"])
                errors += int(out["error_frames"])
                mbits += int(out["mod_error_bits"])
            res[chan] = (frames, errors, mbits)
            print(f"{label:16s} {chan:5s} {snr} dB: {errors}/{frames} "
                  f"FER={errors / max(frames, 1):.3e} modBER-bits={mbits} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

        fx, ex, mx = res["xla"]
        ff, ef, mf = res["fused"]
        p = (ex + ef) / (fx + ff) if (ex + ef) else 0.0
        se = math.sqrt(p * (1 - p) * (1 / fx + 1 / ff)) if p > 0 else 0.0
        z = ((ex / fx) - (ef / ff)) / se if se else 0.0
        # modBER z: pre-decoder hard-decision errors, iid per info bit -
        # a high-statistics direct check of the channel law.
        nb_x, nb_f = fx * code.n_info, ff * code.n_info
        pm = (mx + mf) / (nb_x + nb_f)
        sem = math.sqrt(pm * (1 - pm) * (1 / nb_x + 1 / nb_f)) if pm else 0.0
        zm = ((mx / nb_x) - (mf / nb_f)) / sem if sem else 0.0
        ok = abs(z) <= Z_THRESHOLD and abs(zm) <= Z_THRESHOLD
        all_ok &= ok
        points.append({
            "label": label, "mod_type": mod, "snr_db": snr,
            "max_iteration": max_it,
            "xla": {"frames": fx, "errors": ex, "fer": ex / fx,
                    "mod_error_bits": mx},
            "fused": {"frames": ff, "errors": ef, "fer": ef / ff,
                      "mod_error_bits": mf},
            "z_fer": round(z, 3), "z_mod_ber": round(zm, 3),
            "consistent": ok,
        })
        print(f"{label} {snr} dB: z_fer = {z:+.2f}  z_modber = {zm:+.2f} "
              f"({'ok' if ok else 'FAIL'})", flush=True)

    hists = []
    for label, mod, snr in HIST_ROWS:
        h = run_hist_row(code, label, mod, snr)
        all_ok &= h["consistent"]
        hists.append(h)
        print(f"hist {label} {snr} dB: {h['draws']} draws, "
              f"max|z|={h['max_abs_z']} chi2={h['chi2']}/{h['ndof']} "
              f"({'ok' if h['consistent'] else 'FAIL'})", flush=True)

    out_path = REPO / "docs" / "channel_parity.json"
    out_path.write_text(json.dumps({
        "config": f"method2 batch={BATCH} real-codeword; "
                  f"hist rows all-zero cw",
        "z_threshold": Z_THRESHOLD,
        "points": points,
        "histograms": hists,
        "all_consistent": all_ok,
    }, indent=1))
    print(f"wrote {out_path}; all_consistent={all_ok}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
