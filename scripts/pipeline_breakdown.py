"""Pipeline cost breakdown on TPU (one-off diagnostic for ROOFLINE.md).

Times each stage of the Monte-Carlo round at batch 2048 with the
device_get + chain-slope methodology calibrated by timing_audit.py:
noise generation (threefry vs rbg), modem+quantize, stats, decode.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    from faid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from faid_tpu.code.qc_matrix import load_code
    from faid_tpu.config import DecodeMethod, SimConfig
    from faid_tpu.ops import modem
    from faid_tpu.ops import fixed_point as fp

    code = load_code("50gpon")
    batch = 2048
    cfg = SimConfig(decode_method=DecodeMethod.FAID_DTBF, max_iteration=6,
                    mod_type=2, batch_per_device=batch, seed=0)
    sigma = jnp.float32(cfg.sigma_at(4.0))
    nsym = code.n_var // 2

    def slope(fn, n_short=2, n_long=12):
        """fn(key, i) -> small array; chains n iterations with fold_in
        keys (distinct work per step, serialized by accumulator dep)."""
        def chain(n):
            def run(key):
                def body(i, acc):
                    return acc + fn(jax.random.fold_in(key, i), acc)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return jax.jit(run)

        t = {}
        for n in (n_short, n_long):
            f = chain(n)
            jax.device_get(f(jax.random.key(99)))    # compile+warm
            trials = []
            for tr in (1, 2):
                t0 = time.perf_counter()
                jax.device_get(f(jax.random.key(tr)))
                trials.append(time.perf_counter() - t0)
            t[n] = min(trials)
        return (t[n_long] - t[n_short]) / (n_long - n_short)

    report = {}

    # 1. noise generation alone, threefry vs rbg
    def noise_threefry(key, acc):
        n = jax.random.normal(key, (batch, nsym, 2), jnp.float32)
        return n.sum() * 1e-9

    def noise_rbg(key, acc):
        kd = jax.random.key_data(key)
        kr = jax.random.wrap_key_data(jnp.concatenate([kd, kd]),
                                      impl="rbg")
        n = jax.random.normal(kr, (batch, nsym, 2), jnp.float32)
        return n.sum() * 1e-9

    report["noise_threefry_s"] = slope(noise_threefry)
    print(f"noise threefry: {1e3 * report['noise_threefry_s']:.2f} ms",
          flush=True)
    report["noise_rbg_s"] = slope(noise_rbg)
    print(f"noise rbg:      {1e3 * report['noise_rbg_s']:.2f} ms",
          flush=True)

    # 2. TX + channel + demod + quantize + mod stats (no decode)
    def front_end(key, acc):
        cw = jnp.zeros((batch, code.n_var), jnp.int8)
        sym = modem.modulate_qam(cw, 2)
        n = jax.random.normal(key, sym.shape, jnp.float32)
        rx = sym + (sigma / jnp.sqrt(2.0)) * n
        soft = modem.demodulate_qam(rx, 2)
        llr = fp.quantize_llr(soft, cfg.scale, cfg.quant_bits)
        mod_err = (soft[:, :code.n_info] > 0).sum()
        return (llr.astype(jnp.int32).sum() + mod_err).astype(jnp.float32) * 1e-9

    report["front_end_s"] = slope(front_end)
    print(f"front end (mod+awgn+demap+quant): "
          f"{1e3 * report['front_end_s']:.2f} ms", flush=True)

    # 3. full sim step (front end + decode + stats) - what the pipeline
    # loop runs per round; difference vs front_end + decode = stats +
    # ingest/relayout cost.
    from faid_tpu.sim.pipeline import build_sim_step
    step = build_sim_step(code, cfg)

    def full_step(key, acc):
        out = step(key, sigma)
        return (out["error_bits"] + out["mp_iters"]).astype(jnp.float32) * 1e-9

    report["full_step_s"] = slope(full_step, 2, 8)
    print(f"full sim step:  {1e3 * report['full_step_s']:.2f} ms",
          flush=True)

    # 4. stats tail alone (bincounts + reductions) on fake decoder output
    def stats_tail(key, acc):
        hard = jax.random.bernoulli(key, 0.001, (batch, code.n_var))
        err = hard[:, :code.n_info]
        err_bits = err.sum(axis=1).astype(jnp.int32)
        mp = jax.random.randint(key, (batch,), 0, 7)
        bf = jax.random.randint(key, (batch,), 0, 11)
        h1 = jnp.bincount(jnp.clip(mp, 0, 6), length=7)
        h2 = jnp.bincount(jnp.clip(bf, 0, 10), length=11)
        return (err_bits.sum() + h1.sum() + h2.sum()).astype(jnp.float32) * 1e-9

    report["stats_tail_s"] = slope(stats_tail)
    print(f"stats tail:     {1e3 * report['stats_tail_s']:.2f} ms",
          flush=True)

    Path("/tmp/pipeline_breakdown.json").write_text(
        json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
