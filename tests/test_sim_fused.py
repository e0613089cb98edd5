"""Fully-fused sim kernel (channel + decode + stats in one pallas_call)
vs the composed path: the emit twin regenerates the identical PRNG
stream, so decode(ingest(emit(...))) must reproduce the fused kernel's
counters bit-for-bit (interpret mode on CPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from faid_tpu.code.toy import toy_code
from faid_tpu.config import DecodeMethod, SimConfig
from faid_tpu.decoders.core import build_stats_decoder
from faid_tpu.ops import pallas_channel, pallas_decoder as pk
from faid_tpu.sim import pipeline


def sim_cfg(fake=True, mod=2, method=DecodeMethod.FAID_DTBF, batch=64,
            quant=4):
    return SimConfig(decode_method=method, mod_type=mod,
                     batch_per_device=batch, fake_encode=fake,
                     channel_backend="fused", stop_mode="group",
                     backend="pallas", seed=7, quant_bits=quant)


@pytest.mark.parametrize("fake,mod,method,quant", [
    (True, 2, DecodeMethod.FAID_DTBF, 4),
    (False, 2, DecodeMethod.FAID_DTBF, 4),
    (True, 1, DecodeMethod.FAID_DTBF, 4),
    (False, 1, DecodeMethod.FAID_DTBF, 4),
    (True, 2, DecodeMethod.OMS, 4),     # bf kind none: en>0 stats path
    (True, 2, DecodeMethod.OMS_DTBF, 4),
    # NB_BITS_VARIABLES=6 ingest (round-half-even staircase, +-31).
    (False, 2, DecodeMethod.FAID_DTBF, 6),
])
def test_fused_sim_ties_to_emit_plus_stats_decoder(rng, fake, mod, method,
                                                   quant):
    code = toy_code()
    cfg = sim_cfg(fake=fake, mod=mod, method=method, quant=quant)
    assert pk.supports_sim(code, cfg)
    sim = pk.build_fused_sim(code, cfg, interpret=True)
    emit = pk.build_fused_sim_emit(code, cfg, interpret=True)
    st = build_stats_decoder(code, cfg.decoder(), backend="pallas",
                             interpret=True)

    key = jax.random.key(123)
    sigma = jnp.float32(cfg.sigma_at(4.0))
    cw = None
    ref_bits = None
    if not fake:
        cw = jnp.asarray(
            rng.integers(0, 2, size=(cfg.batch_per_device, code.n_var))
            .astype(np.int8))
        ref_bits = cw[:, :code.n_info]

    got = jax.tree.map(np.asarray, jax.jit(sim)(cw, key, sigma))

    llr, err_map = jax.jit(emit)(cw, key, sigma)
    want_bits, want_syms = pallas_channel.reduce_mod_stats(
        jnp.asarray(np.asarray(err_map)), code.n_info, mod)
    dec = jax.tree.map(np.asarray, jax.jit(st)(llr, ref_bits))

    np.testing.assert_array_equal(got["err_bits"], dec["err_bits"])
    np.testing.assert_array_equal(got["mp_iters"], dec["mp_iters"])
    np.testing.assert_array_equal(got["bf_rounds"], dec["bf_rounds"])
    np.testing.assert_array_equal(got["mod_error_bits"],
                                  np.asarray(want_bits))
    np.testing.assert_array_equal(got["mod_error_symbols"],
                                  np.asarray(want_syms))


def test_sim_step_uses_fused_kernel_and_matches_composition(rng):
    """Pipeline-level: build_sim_step(interpret=True) must route through
    the fused sim kernel and its scalar counters must equal the
    composition computed from the emit twin."""
    code = toy_code()
    cfg = sim_cfg(fake=True)
    assert pipeline._resolve_fused_sim(code, cfg, "auto", True) is not None

    step = jax.jit(pipeline.build_sim_step(code, cfg, backend="auto",
                                           interpret=True))
    key = jax.random.key(5)
    sigma = jnp.float32(cfg.sigma_at(3.5))
    got = jax.tree.map(np.asarray, step(key, sigma))

    _, k_noise = jax.random.split(key)
    emit = pk.build_fused_sim_emit(code, cfg, interpret=True)
    st = build_stats_decoder(code, cfg.decoder(), backend="pallas",
                             interpret=True)
    llr, err_map = jax.jit(emit)(None, k_noise, sigma)
    dec = jax.tree.map(np.asarray, jax.jit(st)(llr))
    bits, syms = pallas_channel.reduce_mod_stats(
        jnp.asarray(np.asarray(err_map)), code.n_info, cfg.mod_type)

    assert got["test_frames"] == cfg.batch_per_device
    assert got["error_bits"] == dec["err_bits"].sum()
    assert got["error_frames"] == (dec["err_bits"] > 0).sum()
    assert got["mp_iters"] == dec["mp_iters"].sum()
    assert got["bf_rounds"] == dec["bf_rounds"].sum()
    assert got["mod_error_bits"] == int(np.asarray(bits).sum())
    assert got["mod_error_symbols"] == int(np.asarray(syms).sum())
    assert got["mod_error_frames"] == int((np.asarray(bits) > 0).sum())


def test_debug_step_replays_fused_sim_stream(monkeypatch):
    """build_debug_step must regenerate the exact LLRs the fused sim
    kernel decoded (forensic exact-replay contract)."""
    code = toy_code()
    cfg = sim_cfg(fake=True)
    # Force the debug step down the emit path (it gates on the same
    # predicate the sim step uses, which requires tpu-or-interpret).
    orig_emit = pk.build_fused_sim_emit
    monkeypatch.setattr(
        pipeline, "_resolve_fused_sim",
        lambda c, s, b, interpret=False: pk.build_fused_sim(
            c, s, interpret=True))
    monkeypatch.setattr(
        pk, "build_fused_sim_emit",
        lambda c, s, interpret=False: orig_emit(c, s, interpret=True))
    dbg = pipeline.build_debug_step(code, cfg, backend="xla")
    key = jax.random.key(5)
    sigma = jnp.float32(cfg.sigma_at(3.5))
    out = dbg(key, sigma)

    _, k_noise = jax.random.split(key)
    emit = orig_emit(code, cfg, interpret=True)
    llr, _ = jax.jit(emit)(None, k_noise, sigma)
    np.testing.assert_array_equal(np.asarray(out["llr"]), np.asarray(llr))


def test_supports_sim_gates():
    code = toy_code()
    assert pk.supports_sim(code, sim_cfg())
    assert pk.supports_sim(          # bf kind none: en>0 stats epilogue
        code, dataclasses.replace(sim_cfg(), decode_method=DecodeMethod.OMS))
    assert not pk.supports_sim(
        code, dataclasses.replace(sim_cfg(), mod_type=4))
    assert not pk.supports_sim(
        code, dataclasses.replace(sim_cfg(), batch_per_device=48))
