"""Timing-honesty audit for the axon tunnel (one-off diagnostic).

Measures the fused decoder and the pipeline loop with the only sync
primitive that cannot return early - jax.device_get of the computed
values - and checks scan-length linearity.  Used to calibrate which of
the repo's benchmark patterns report real wall-clock.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    from faid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from faid_tpu.code.qc_matrix import load_code
    from faid_tpu.config import BFConfig, DecodeMethod, SimConfig
    from faid_tpu.decoders.core import build_decoder
    from faid_tpu.sim.pipeline import build_sim_loop

    code = load_code("50gpon")
    batch = 2048
    cfg = SimConfig(decode_method=DecodeMethod.FAID_DTBF, max_iteration=6,
                    mod_type=2, batch_per_device=batch, seed=0)
    rng = np.random.default_rng(0)

    def make_llr(snr):
        sig = cfg.sigma_at(snr)
        y = -1.0 + sig * rng.standard_normal((batch, code.n_var))
        return jnp.asarray(np.clip(np.round(y * 13.0), -7, 7).astype(np.int8))

    def chain(decode, perturb, length):
        def body(carry, llr_i):
            out = decode(llr_i ^ carry)
            s = out["mp_iters"].sum() + out["hard"].sum()
            nxt = (out["hard"].astype(jnp.int8) if perturb
                   else jnp.broadcast_to((s >> 31).astype(jnp.int8),
                                         llr_i.shape))
            return nxt, s

        def run(stacked):
            _, sums = jax.lax.scan(body, jnp.zeros(stacked.shape[1:],
                                                   jnp.int8), stacked)
            return sums
        return jax.jit(run)

    def t_devget(f, x):
        t0 = time.perf_counter()
        v = jax.device_get(f(x))
        return time.perf_counter() - t0, v

    report = {}

    # fixed-work decode (no early stop, no BF)
    dfx = dataclasses.replace(cfg.decoder(), stop_early=False, bf=BFConfig())
    dec_fx = build_decoder(code, dfx, backend="pallas")
    for L in (2, 6):
        f = chain(dec_fx, True, L)
        x = jnp.stack([make_llr(4.0) for _ in range(L)])
        t_w, _ = t_devget(f, x)                       # compile+run
        t1, _ = t_devget(f, x ^ jnp.int8(1))
        t2, _ = t_devget(f, x ^ jnp.int8(2))
        report[f"fixed_L{L}"] = {"warm_s": t_w, "t1_s": t1, "t2_s": t2,
                                 "per_decode_ms": 1e3 * min(t1, t2) / L}
        print(f"fixed L={L}: warm {t_w:.3f}s t1 {t1:.4f}s t2 {t2:.4f}s "
              f"-> {1e3*min(t1,t2)/L:.2f} ms/decode", flush=True)

    # production decode (early stop + fused DTBF), realistic content
    dec_es = build_decoder(code, cfg.decoder(), backend="pallas")
    for snr in (3.6, 4.0, 4.4):
        L = 6
        f = chain(dec_es, False, L)
        x = jnp.stack([make_llr(snr) for _ in range(L)])
        t_w, _ = t_devget(f, x)
        t1, v = t_devget(f, x)                        # same input again!
        t2, _ = t_devget(f, jnp.stack([make_llr(snr) for _ in range(L)]))
        avg_it = float(np.asarray(
            jax.device_get(dec_es(x[0])["mp_iters"])).mean())
        report[f"es_{snr}"] = {"warm_s": t_w, "repeat_s": t1,
                               "fresh_s": t2, "avg_mp_iters": avg_it,
                               "per_decode_ms": 1e3 * t2 / L}
        print(f"early-stop snr={snr}: warm {t_w:.3f}s repeat {t1:.4f}s "
              f"fresh {t2:.4f}s avg_it {avg_it:.2f} "
              f"-> {1e3*t2/L:.2f} ms/decode", flush=True)

    # pipeline loop, device_get per call
    rounds = 5
    loop = jax.jit(build_sim_loop(code, cfg, rounds))
    sig = jnp.float32(cfg.sigma_at(4.0))
    key = jax.random.key(0)
    t_w, _ = t_devget(lambda r: loop(key, sig, r), jnp.int32(0))
    times = []
    for c in range(1, 5):
        t, v = t_devget(lambda r: loop(key, sig, r),
                        jnp.int32(c * rounds))
        times.append(t)
    per_call = min(times)
    report["pipeline"] = {
        "warm_s": t_w, "per_call_s_min": per_call,
        "per_call_s_all": times,
        "mbit_s": batch * rounds * code.n_info / per_call / 1e6}
    print(f"pipeline: warm {t_w:.3f}s per-call(min) {per_call:.4f}s "
          f"-> {report['pipeline']['mbit_s']:.0f} Mbit/s", flush=True)

    Path("/tmp/timing_audit.json").write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
