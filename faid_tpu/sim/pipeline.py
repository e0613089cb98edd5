"""One jitted Monte-Carlo step: encode -> modulate -> AWGN -> demodulate ->
quantize -> decode -> count errors, batched over frames.

This is the TPU-native re-design of the reference's per-thread worker loop
``CSimulate::Run`` (reference CSimulate.cpp:92-180): the reference runs one
32-frame SIMD group x 50 rounds per pthread; here one ``sim_step`` call
processes an arbitrary frame batch, and both the SIMD-lane axis and the
thread axis become the leading batch dimension (shardable over a device
mesh, see parallel/mesh.py).

Statistics reproduce ``CalculateErrors`` (reference CLDPC.cpp:4819-4995)
and the pre-decoder ``ModCalErr`` counter (CModulate.cpp:382-491):
  error_bits       decoded info-bit errors (first NmoinsK bits)
  error_frames     frames with >= 1 info-bit error
  lt3_frames       error frames with < 3 bit errors (error-floor events)
  mod_error_bits/symbols/frames   hard-decision errors *before* decoding
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..code.encoder import make_encode_fn
from ..code.qc_matrix import QCCode
from ..config import SimConfig
from ..decoders.core import build_decoder
from ..ops import channel, modem
from ..ops import fixed_point as fp


def build_sim_step(code: QCCode, cfg: SimConfig) -> Callable:
    """Returns step(key, sigma) -> dict of int32 scalar counters.

    ``key`` is a jax PRNG key; ``sigma`` is the traced noise std-dev so one
    compiled executable serves the whole SNR sweep.
    """
    dcfg = cfg.decoder()
    decoder = build_decoder(code, dcfg)
    encode = None if cfg.fake_encode else make_encode_fn(code)
    batch = cfg.batch_per_device
    n_info = code.n_info
    mod = cfg.mod_type

    def step(key: jax.Array, sigma: jax.Array) -> dict:
        k_msg, k_noise = jax.random.split(key)

        # --- TX -----------------------------------------------------------
        if cfg.fake_encode:
            # All-zero codeword path (reference FakeEncoder, CLDPC.cpp:163).
            cw = jnp.zeros((batch, code.n_var), jnp.int8)
        else:
            u = jax.random.bernoulli(k_msg, 0.5, (batch, n_info))
            cw = encode(u.astype(jnp.int8))

        tx_bits = modem.interleave(cw, cfg.interleave_depth)

        # --- channel ------------------------------------------------------
        if mod == 1:
            sym = modem.modulate_bpsk(tx_bits)
            rx = channel.awgn_real(k_noise, sym, sigma)
            soft = modem.demodulate_bpsk(rx)
        else:
            sym = modem.modulate_qam(tx_bits, mod)
            # Complex noise: sigma/sqrt(2) per rail (reference
            # CSimulate.cpp:126).
            rx = channel.awgn_complex(k_noise, sym, sigma / jnp.sqrt(2.0))
            soft = modem.demodulate_qam(rx, mod)

        soft = modem.deinterleave(soft, cfg.interleave_depth)

        # --- pre-decoder hard-decision stats (ModCalErr) ------------------
        mod_hard = soft[:, :n_info] > 0
        ref_bits = cw[:, :n_info].astype(jnp.bool_)
        mod_err = jnp.logical_xor(mod_hard, ref_bits)
        mod_error_bits = mod_err.sum(axis=1).astype(jnp.int32)
        # Symbol = mod_type consecutive info bits (reference ModSER
        # denominator, main.cpp:184); pad the tail group if n_info is not
        # a multiple of mod_type.
        pad = (-n_info) % mod
        mod_err_p = jnp.pad(mod_err, ((0, 0), (0, pad)))
        sym_err = mod_err_p.reshape(batch, (n_info + pad) // mod, mod).any(axis=2)
        mod_error_symbols = sym_err.sum(axis=1).astype(jnp.int32)

        # --- RX -----------------------------------------------------------
        llr = fp.quantize_llr(soft, cfg.scale, cfg.quant_bits)
        out = decoder(llr)

        hard_info = out["hard"][:, :n_info]
        err = jnp.logical_xor(hard_info, ref_bits)
        err_bits = err.sum(axis=1).astype(jnp.int32)
        frame_err = err_bits > 0

        return {
            "test_frames": jnp.int32(batch),
            "error_bits": err_bits.sum(),
            "error_frames": frame_err.sum().astype(jnp.int32),
            "lt3_frames": (frame_err & (err_bits < 3)).sum().astype(jnp.int32),
            "mod_error_bits": mod_error_bits.sum(),
            "mod_error_symbols": mod_error_symbols.sum(),
            "mod_error_frames": (mod_error_bits > 0).sum().astype(jnp.int32),
            "mp_iters": out["mp_iters"].sum(),
            "bf_rounds": out["bf_rounds"].sum(),
        }

    return step


def sigma_for(cfg: SimConfig, snr_db: float) -> float:
    """Noise sigma from Eb/N0 (reference CSimulate.cpp:67-91)."""
    return cfg.sigma_at(snr_db)
