"""Roofline / utilization measurement for the fused Pallas decoder
(VERDICT round 1, item 2).

Separates the three levels the headline Mbit/s number mixes together:

1. kernel-only MP iteration rate - the MP kernel run with a fixed
   iteration count (early stop off, no BF tail), so every frame does
   exactly ``max_iter`` full sweeps of constant work.  This is the
   number to put against the VPU roofline: the kernel is pure VPU int32
   vector work (no MXU, state resident in VMEM, HBM traffic only the
   [C,B,Z] int8 in/out).
2. full production decode (early stop + fused BF) at an operating SNR -
   what Monte-Carlo actually pays per frame (most frames converge at
   the first or second iteration top).
3. the end-to-end pipeline (bench.py workload) - adds encode, modem,
   channel, quantizer, stats.

The analytic op count per edge update is derived from the kernel source
(ops on [bt, z] int32 vectors; one vector op = bt*z lane-ops).  Round 4
removed the provably-dead int8 pack-saturation clips from pass 1/pass 2
(ops/pallas_decoder._msg_bound) and hoisted the per-edge hard-decision
compare of the syndrome sweeps to one compare per block column, so the
itemized model (_CROSS_MODEL below) drops from r3's 36.2 to ~32.2
ops/edge for the fixed-iteration FAID kernel, plus ~2.6/edge for the
early-stop sweep (roll + xor per edge, cmp+widen amortized per column).

Peak VPU lane-op rate (v5e, one TensorCore): 8 sublanes x 128 lanes x
4 ALUs x ~0.94 GHz ~= 3.85e12 lane-ops/s.  Utilization = measured
lane-ops/s / peak.  The op count is good to maybe +-30% (fusion,
multi-op ALU slots), which is enough to tell 8% from 80%.

Writes docs/roofline.json; optionally captures a jax.profiler trace.

Usage: python scripts/roofline.py [--batch 2048] [--reps 5]
         [--snr 4.0] [--trace-dir /tmp/roofline_trace]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

def hashn(s: str) -> int:
    """Tiny deterministic name -> int (PYTHONHASHSEED-independent)."""
    return sum(s.encode()) & 0xFF


# Early-stop syndrome sweep, per edge: roll + xor, plus the per-column
# hard-decision cmp+widen amortized over the column degree (~12 edges
# per column: 2*69/275) and the count accumulation (11 adds + 1 lane
# reduction per sweep, amortized ~0.05).
OPS_PER_EDGE_SWEEP = 2.6
VPU_PEAK_LANE_OPS = 8 * 128 * 4 * 0.94e9   # v5e TensorCore VPU

# Per-style op model for the --cross-check mode: the same hand count as
# OPS_PER_EDGE, itemized per decoder style for the FIXED-ITERATION
# kernel (stop_early=False: no syndrome sweep, no active masking).  The
# three styles share pass-1/min-recurrence/pass-2 structure but differ
# in the V2C magnitude path (nms: abs; oms: abs+clip; faid: 9-op packed
# LUT chain) and the sign path (faid sign-backtrack adds eq+select) -
# so if the measured per-iteration times of the three kernels sit in
# the model's ratios, the hand count is consistent at the level of
# those differences, which bounds the +-30% systematic doubt on the
# utilization claim far tighter than one absolute number can.
#   shared: pass1 roll+sub+widen+satmax                    = 4
#           parity xor                                     = 1
#           min1/min2 recurrence min+max+min               = 3
#           pass2 eq+sel+signxor(2)+neg+sel+en add
#                 /sat(2)+cast+roll                        = 11
#   per-style extras (per edge):
#           nms : mag abs(1)                  + negs cmp(1)      = 2
#           oms : mag abs+clip(2)             + negs cmp(1)      = 3
#           faid: satmin(1) + nibble lut(5)   + backtrack(3)     = 9
#   per-row (amortized over mean degree 22.67):
#           nms : 2x(mul+min) = 4             oms/faid: 2x(sub+min) = 4
#   (r4 model changes: the int8 pack-saturation clips - 2 in pass 1,
#    2 in pass 2, 4 in the NMS normalize - are elided as provably dead,
#    ops/pallas_decoder._msg_bound; the FAID LUT row packs into ONE
#    nibble-packed int32, so the lookup is abs+min+shl+shr+and = 5 ops
#    instead of the 9-op two-word byte chain)
_CROSS_MODEL = {
    "nms": 4 + 1 + 3 + 11 + 2 + 4 / 22.67,
    "oms": 4 + 1 + 3 + 11 + 3 + 4 / 22.67,
    "faid": 4 + 1 + 3 + 11 + 9 + 4 / 22.67,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--snr", type=float, default=4.0)
    ap.add_argument("--max-iter", type=int, default=6)
    ap.add_argument("--bt", type=int, default=32)
    ap.add_argument("--trace-dir", type=str, default=None)
    ap.add_argument("--out", type=str,
                    default=str(REPO / "docs/roofline.json"))
    args = ap.parse_args()

    from faid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from faid_tpu.code.qc_matrix import load_code
    from faid_tpu.config import (BFConfig, DecodeMethod,
                                 DecoderConfig, SimConfig)
    from faid_tpu.decoders.core import build_decoder
    from faid_tpu.sim.pipeline import build_sim_loop

    code = load_code("50gpon")
    dev = jax.devices()[0]
    cfg = SimConfig(decode_method=DecodeMethod.FAID_DTBF,
                    max_iteration=args.max_iter, mod_type=2,
                    batch_per_device=args.batch, seed=0)
    sigma = float(cfg.sigma_at(args.snr))

    n_edges = int(code.degrees_np.sum())
    z = code.z
    results = {"device": str(dev), "batch": args.batch, "bt": args.bt,
               "snr_db": args.snr, "max_iter": args.max_iter,
               "n_edges": n_edges, "z": z,
               "ops_per_edge_est": _CROSS_MODEL["faid"] + OPS_PER_EDGE_SWEEP,
               "vpu_peak_lane_ops": VPU_PEAK_LANE_OPS}
    # Timing methodology (calibrated by scripts/timing_audit.py):
    #   * the axon tunnel memoizes identical (executable, input)
    #     dispatches AND block_until_ready can return before a fresh
    #     dispatch actually executed - both directions of lying.  The
    #     only trustworthy sync is jax.device_get of computed VALUES.
    #   * all decode inputs are generated ON DEVICE (jax.random) so no
    #     host->device transfer of ~40 MB arrays lands in a timed region.
    #   * N decodes are chained inside one jit via lax.scan with a data
    #     dependency between steps, then timed at two chain lengths; the
    #     SLOPE is the per-decode cost (the intercept is the per-dispatch
    #     tunnel round-trip, reported separately as dispatch_overhead_s).
    def llr_stack(key, length):
        y = -1.0 + sigma * jax.random.normal(
            key, (length, args.batch, code.n_var))
        return jnp.clip(jnp.round(y * 13.0), -7, 7).astype(jnp.int8)

    mk_stack = jax.jit(llr_stack, static_argnums=1)

    def chain(decode, perturb, length):
        """`length` decodes run sequentially inside one jit; each step's
        input depends on the previous step's output so XLA cannot drop,
        reorder, or overlap them."""

        def body(carry, llr_i):
            out = decode(llr_i ^ carry)
            s = out["mp_iters"].sum() + out["hard"].sum()
            if perturb:
                # fixed-work decode: feed the (content-irrelevant) hard
                # bits forward as the dependency
                nxt = out["hard"].astype(jnp.int8)
            else:
                # realistic-content decode: dependency must not change
                # the input - use the sign bit of a non-negative sum
                # (always 0, but data-dependent at compile time)
                nxt = jnp.broadcast_to(
                    (s >> 31).astype(jnp.int8), llr_i.shape)
            return nxt, s

        def run(stacked):
            z0 = jnp.zeros(stacked.shape[1:], jnp.int8)
            _, sums = jax.lax.scan(body, z0, stacked)
            return sums

        return jax.jit(run)

    L_SHORT, L_LONG = 2, 2 + args.reps

    def timed(decode, perturb, seed):
        """Per-decode seconds via the two-length slope + the intercept."""
        t_at = {}
        for L in (L_SHORT, L_LONG):
            f = chain(decode, perturb, L)
            key = jax.random.fold_in(jax.random.key(seed), L)
            x = mk_stack(key, L)
            jax.device_get(x[0, 0, :8])          # ensure x is materialized
            jax.device_get(f(x))                 # compile + warm
            trials = []
            for tr in (1, 2):                    # distinct content per trial
                xt = mk_stack(jax.random.fold_in(key, tr), L)
                jax.device_get(xt[0, 0, :8])
                t0 = time.perf_counter()
                jax.device_get(f(xt))
                trials.append(time.perf_counter() - t0)
            t_at[L] = min(trials)
        per_decode = (t_at[L_LONG] - t_at[L_SHORT]) / (L_LONG - L_SHORT)
        overhead = t_at[L_SHORT] - L_SHORT * per_decode
        return per_decode, overhead, t_at

    # ---- 1. kernel-only, fixed iterations (no early stop, no BF) -------
    dcfg_fixed = dataclasses.replace(cfg.decoder(), stop_early=False,
                                     bf=BFConfig())
    dec_fixed = jax.jit(build_decoder(code, dcfg_fixed, backend="pallas",
                                      pallas_bt=args.bt))
    dt, ovh, raw = timed(dec_fixed, perturb=True, seed=11)
    iters = args.batch * args.max_iter
    # no early stop -> no syndrome sweep: the fixed-kernel FAID model
    lane_ops = iters * n_edges * _CROSS_MODEL["faid"] * z
    results["fixed"] = {
        "per_decode_s": dt,
        "dispatch_overhead_s": ovh,
        "raw_chain_s": raw,
        "frames_per_s": args.batch / dt,
        "mp_iters_per_s": iters / dt,
        "edge_msgs_per_s": iters * n_edges * z / dt,
        "est_lane_ops_per_s": lane_ops / dt,
        "est_vpu_utilization": lane_ops / dt / VPU_PEAK_LANE_OPS,
        "info_mbit_s": args.batch * code.n_info / dt / 1e6,
    }

    # ---- 1b. op-model cross-check: NMS / OMS / FAID fixed kernels ------
    # Three kernels, same skeleton, different magnitude/sign paths with
    # analytically different op counts (_CROSS_MODEL).  If the measured
    # per-iteration slopes sit in the model's ratios, the hand count is
    # validated at the level of the inter-style differences (the LUT
    # chain and backtrack are the riskiest entries in the 33-op model).
    cross = {"model_ops_per_edge": dict(_CROSS_MODEL)}
    styles = {
        "nms": DecoderConfig.for_method(
            DecodeMethod.NMS, max_iter=args.max_iter,
            factor_1=26, factor_2=32),
        "oms": dataclasses.replace(
            DecoderConfig.for_method(DecodeMethod.OMS,
                                     max_iter=args.max_iter),
            oms_mode=0, stop_early=False, bf=BFConfig()),
        "faid": dcfg_fixed,
    }
    for sname, sdcfg in styles.items():
        sdec = jax.jit(build_decoder(code, sdcfg, backend="pallas",
                                     pallas_bt=args.bt))
        sdt, sovh, sraw = timed(sdec, perturb=True, seed=55 + hashn(sname))
        cross[sname] = {
            "per_decode_s": sdt,
            "per_iter_edge_ns": sdt / (args.max_iter * n_edges) * 1e9,
            "model_ops": _CROSS_MODEL[sname],
        }
    base = cross["nms"]
    for sname in ("nms", "oms", "faid"):
        c = cross[sname]
        c["measured_ratio_vs_nms"] = c["per_decode_s"] / base["per_decode_s"]
        c["model_ratio_vs_nms"] = (
            _CROSS_MODEL[sname] / _CROSS_MODEL["nms"])
        c["ratio_error_pct"] = 100 * (
            c["measured_ratio_vs_nms"] / c["model_ratio_vs_nms"] - 1)
    results["cross_check"] = cross

    # ---- 2. production decoder (early stop + fused DTBF) ---------------
    dec = jax.jit(build_decoder(code, cfg.decoder(), backend="pallas",
                                pallas_bt=args.bt))
    dt_es, ovh_es, raw_es = timed(dec, perturb=False, seed=22)
    avg_iters = float(np.asarray(jax.device_get(
        dec(mk_stack(jax.random.key(33), 1)[0])["mp_iters"])).mean())
    results["early_stop"] = {
        "per_decode_s": dt_es,
        "dispatch_overhead_s": ovh_es,
        "raw_chain_s": raw_es,
        "frames_per_s": args.batch / dt_es,
        "avg_mp_iters": avg_iters,
        "info_mbit_s": args.batch * code.n_info / dt_es / 1e6,
        "speedup_vs_fixed": dt / dt_es,
    }

    # ---- 3. end-to-end pipeline loop (bench.py workload) ---------------
    rounds = 5
    loop = jax.jit(build_sim_loop(code, cfg, rounds))
    key = jax.random.key(0)
    sig = jnp.float32(sigma)
    jax.device_get(loop(key, sig, jnp.int32(0)))     # compile + warm
    times = []
    for c in range(args.reps):
        t0 = time.perf_counter()
        jax.device_get(loop(key, sig, jnp.int32((c + 1) * rounds)))
        times.append(time.perf_counter() - t0)
    dt_pipe = min(times)
    pframes = args.batch * rounds
    results["pipeline"] = {
        "per_call_s_min": dt_pipe,
        "per_call_s_all": times,
        "frames_per_s": pframes / dt_pipe,
        "info_mbit_s": pframes * code.n_info / dt_pipe / 1e6,
    }

    if args.trace_dir:
        xa = mk_stack(jax.random.key(44), 2)
        with jax.profiler.trace(args.trace_dir):
            jax.device_get([dec_fixed(xa[0])["mp_iters"],
                            dec(xa[1])["mp_iters"]])
        results["trace_dir"] = args.trace_dir

    Path(args.out).write_text(json.dumps(results, indent=1) + "\n")
    f = results["fixed"]
    print(json.dumps(results, indent=1))
    print(f"\nkernel-only: {f['mp_iters_per_s']:.3e} MP iters/s, "
          f"{f['edge_msgs_per_s']:.3e} edge msgs/s, "
          f"est VPU util {100 * f['est_vpu_utilization']:.1f}%",
          file=sys.stderr)


if __name__ == "__main__":
    main()
