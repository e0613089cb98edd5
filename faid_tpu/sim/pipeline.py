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

from typing import Callable

import jax
import jax.numpy as jnp

from ..code.encoder import make_encode_fn
from ..code.qc_matrix import QCCode
from ..config import SimConfig
from ..decoders.core import build_decoder, build_stats_decoder
from ..ops import channel, modem, pallas_channel
from ..ops import fixed_point as fp
from ..utils import vma


def _random_message_bits(key: jax.Array, batch: int,
                         n_info: int) -> jnp.ndarray:
    """iid Bernoulli(1/2) message bits [batch, n_info] int8.

    One threefry word yields 32 bits (jax.random.bernoulli burns a full
    uniform per bit - measured ~1.1 ms/round of the random-encode path
    at batch 2048).  Statistically identical source; the reference's
    GenMsgSeq is rand()%2 (CLDPC.cpp:60-66), and RNG streams are a
    documented deviation."""
    if n_info % 32:
        return jax.random.bernoulli(key, 0.5,
                                    (batch, n_info)).astype(jnp.int8)
    words = jax.random.bits(key, (batch, n_info // 32), jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return ((words[:, :, None] >> shifts) & 1).astype(jnp.int8).reshape(
        batch, n_info)


def _histogram(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """bincount(clip(x, 0, length-1), length) via a compare matrix - a
    [batch, length] broadcast-compare + column sum instead of
    jnp.bincount's serial scatter-add path on TPU."""
    edges = jnp.arange(length, dtype=x.dtype)
    return (jnp.clip(x, 0, length - 1)[:, None]
            == edges[None, :]).sum(axis=0).astype(jnp.int32)


def _resolve_fused_channel(code: QCCode, cfg: SimConfig,
                           stats: bool = False):
    """channel_backend='fused' -> the fused-channel callable, or None
    with a warning when the config is outside the kernel's coverage
    (the pipeline then uses the xla float chain; the two are
    statistically identical, see ops/pallas_channel.py).  stats=True
    selects the variant that reduces the ModCalErr stats per frame
    inside the kernel (same llr stream)."""
    if cfg.channel_backend != "fused":
        return None
    if pallas_channel.supports(code, cfg):
        if stats:
            return pallas_channel.build_fused_channel_stats(code, cfg)
        return pallas_channel.build_fused_channel(code, cfg)
    import warnings

    warnings.warn(
        f"channel_backend='fused' is not supported for this config "
        f"(mod_type={cfg.mod_type}, quant_bits={cfg.quant_bits}, "
        f"batch_per_device={cfg.batch_per_device}); falling back to the "
        f"xla float chain.", stacklevel=3)
    return None


def _resolve_fused_sim(code: QCCode, cfg: SimConfig, backend: str,
                       interpret: bool):
    """The fully-fused sim kernel (channel + decode + stats in ONE
    pallas_call, ops/pallas_decoder.build_fused_sim) when the config is
    inside its coverage; None otherwise (the step then composes the
    channel kernel with the stats decoder)."""
    if cfg.channel_backend != "fused" or backend not in ("auto", "pallas"):
        return None
    from ..ops import pallas_decoder as pk

    on_tpu = jax.devices()[0].platform == "tpu"
    if (on_tpu or interpret) and pk.supports_sim(code, cfg):
        return pk.build_fused_sim(code, cfg, interpret=interpret)
    return None


def build_sim_step(code: QCCode, cfg: SimConfig,
                   backend: str = "auto",
                   interpret: bool = False) -> Callable:
    """Returns step(key, sigma) -> dict of int32 scalar counters.

    ``key`` is a jax PRNG key; ``sigma`` is the traced noise std-dev so one
    compiled executable serves the whole SNR sweep.
    """
    dcfg = cfg.decoder()
    batch = cfg.batch_per_device
    n_info = code.n_info
    mod = cfg.mod_type
    fused_sim = _resolve_fused_sim(code, cfg, backend, interpret)
    decoder = fused_channel = None
    if fused_sim is None:
        decoder = build_stats_decoder(code, dcfg, backend=backend,
                                      interpret=interpret)
        fused_channel = _resolve_fused_channel(code, cfg, stats=True)
    encode = None if cfg.fake_encode else make_encode_fn(code)

    def step(key: jax.Array, sigma: jax.Array) -> dict:
        k_msg, k_noise = jax.random.split(key)

        # --- TX -----------------------------------------------------------
        if cfg.fake_encode:
            # All-zero codeword path (reference FakeEncoder, CLDPC.cpp:163).
            cw = jnp.zeros((batch, code.n_var), jnp.int8)
        else:
            u = _random_message_bits(k_msg, batch, n_info)
            cw = encode(u)

        ref_bits = cw[:, :n_info].astype(jnp.bool_)

        if fused_sim is not None:
            # One kernel per round: PRNG -> staircase channel -> decode
            # -> error/ModCalErr reduction, all in VMEM; only [batch]
            # counter vectors reach HBM.
            out = fused_sim(None if cfg.fake_encode else cw,
                            k_noise, sigma)
            return _counters(out["err_bits"], out["mod_error_bits"],
                             out["mod_error_symbols"], out)

        if fused_channel is not None:
            # Fused quantile channel (ops/pallas_channel.py): one kernel
            # replaces interleave->modulate->AWGN->demap->deinterleave->
            # quantize and reduces the ModCalErr stats per frame in VMEM
            # (writing + re-reducing a [batch, n] error map measured
            # 1.45 ms/round at batch 2048).  With one bit per LLR
            # (BPSK/QPSK) the interleave pair is transparent, so it
            # operates on cw in place.
            llr, mod_error_bits, mod_error_symbols = fused_channel(
                cw, k_noise, sigma)
        else:
            tx_bits = modem.interleave(cw, cfg.interleave_depth)

            # --- channel --------------------------------------------------
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
            llr = fp.quantize_llr(soft, cfg.scale, cfg.quant_bits)

            # --- pre-decoder hard-decision stats (ModCalErr): symbol =
            # mod_type consecutive info bits (reference ModSER
            # denominator, main.cpp:184).
            mod_hard = soft[:, :n_info] > 0
            mod_err = jnp.logical_xor(mod_hard, ref_bits)
            mod_error_bits, mod_error_symbols = (
                pallas_channel.reduce_mod_stats(mod_err, n_info, mod))

        # --- RX -----------------------------------------------------------
        # The stats decoder reduces the info-bit errors per frame inside
        # the decode kernel on the pallas path (hard bits never reach
        # HBM); with fake_encode the expected word is all-zero.
        out = decoder(llr, None if cfg.fake_encode else ref_bits)
        return _counters(out["err_bits"], mod_error_bits,
                         mod_error_symbols, out)

    def _counters(err_bits, mod_error_bits, mod_error_symbols, out):
        frame_err = err_bits > 0

        # Iteration histograms (the reference appends the remaining-BF-iter
        # histogram to iterCount.txt, CSimulate.cpp:171-179).
        bf_cap = max(dcfg.bf.max_iter, 1)
        mp_hist = _histogram(out["mp_iters"], dcfg.max_iter + 1)
        bf_hist = _histogram(out["bf_rounds"], bf_cap + 1)

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
            "mp_hist": mp_hist,
            "bf_hist": bf_hist,
        }

    return step


def build_debug_step(code: QCCode, cfg: SimConfig,
                     backend: str = "auto") -> Callable:
    """Forensic replay step: same datapath as build_sim_step but returns
    per-frame arrays instead of counters.  Because every noise draw is a
    pure function of the key, any Monte-Carlo round can be replayed
    exactly to dump its failing frames - the TPU-native equivalent of the
    reference's errorindex/errorfloat/errordecode.txt dumps
    (CLDPC.cpp:4877-4991) without instrumenting the hot path.

    Returns debug(key, sigma) -> dict(err_bits[b], hard[b, n_var] bool,
    cw[b, n_var] int8, llr[b, n_var] int8).
    """
    dcfg = cfg.decoder()
    decoder = build_decoder(code, dcfg, backend=backend)
    encode = None if cfg.fake_encode else make_encode_fn(code)
    batch = cfg.batch_per_device
    n_info = code.n_info
    mod = cfg.mod_type
    # Replay must reproduce the production stream: when the fully-fused
    # sim kernel ran the round, its emit twin (same PRNG stream contract)
    # regenerates the identical LLRs; otherwise the standalone channel.
    fused_sim_emit = None
    if _resolve_fused_sim(code, cfg, backend, interpret=False) is not None:
        from ..ops import pallas_decoder as _pk

        fused_sim_emit = _pk.build_fused_sim_emit(code, cfg)
    fused_channel = (None if fused_sim_emit is not None
                     else _resolve_fused_channel(code, cfg))

    def debug(key: jax.Array, sigma: jax.Array) -> dict:
        k_msg, k_noise = jax.random.split(key)
        if cfg.fake_encode:
            cw = jnp.zeros((batch, code.n_var), jnp.int8)
        else:
            u = _random_message_bits(k_msg, batch, n_info)
            cw = encode(u)
        if fused_sim_emit is not None:
            llr, _ = fused_sim_emit(None if cfg.fake_encode else cw,
                                    k_noise, sigma)
            soft = llr.astype(jnp.float32) / jnp.float32(cfg.scale)
        elif fused_channel is not None:
            # Exact replay of the fused-channel run (same platform).  No
            # float LLR exists in that pipeline; the errorfloat.txt
            # column records the dequantized value llr/scale instead.
            llr, _ = fused_channel(cw, k_noise, sigma)
            soft = llr.astype(jnp.float32) / jnp.float32(cfg.scale)
        else:
            tx_bits = modem.interleave(cw, cfg.interleave_depth)
            if mod == 1:
                sym = modem.modulate_bpsk(tx_bits)
                soft = modem.demodulate_bpsk(
                    channel.awgn_real(k_noise, sym, sigma))
            else:
                sym = modem.modulate_qam(tx_bits, mod)
                soft = modem.demodulate_qam(
                    channel.awgn_complex(k_noise, sym, sigma / jnp.sqrt(2.0)),
                    mod)
            soft = modem.deinterleave(soft, cfg.interleave_depth)
            llr = fp.quantize_llr(soft, cfg.scale, cfg.quant_bits)
        out = decoder(llr)
        err = jnp.logical_xor(out["hard"][:, :n_info],
                              cw[:, :n_info].astype(jnp.bool_))
        return {
            "err_bits": err.sum(axis=1).astype(jnp.int32),
            "hard": out["hard"],
            "cw": cw,
            "llr": llr,
            # Pre-quantizer float LLRs: the reference's errorfloat.txt
            # dump (CLDPC.cpp:4877-4991 records the channel float of
            # every erroneous bit).
            "soft": soft.astype(jnp.float32),
        }

    return debug


def build_sim_loop(code: QCCode, cfg: SimConfig, rounds: int,
                   backend: str = "auto") -> Callable:
    """Returns loop(key, sigma, round0) -> summed counters over ``rounds``
    consecutive Monte-Carlo rounds, accumulated ON DEVICE with a
    ``lax.fori_loop``.

    One host sync per ``rounds`` batches instead of per batch - the TPU
    replacement for the reference's 50-rounds-per-pthread-dispatch
    granularity (CSimulate.cpp:117).  Round ``i`` uses
    ``fold_in(key, round0 + i)``, so results are identical to calling
    the single step ``rounds`` times with those keys.
    """
    step = build_sim_step(code, cfg, backend=backend)

    def loop(key: jax.Array, sigma: jax.Array, round0: jax.Array) -> dict:
        def body(i, acc):
            stats = step(jax.random.fold_in(key, round0 + i), sigma)
            return jax.tree.map(jnp.add, acc, stats)

        # Zero initial counters cast to the key's device-varying type so
        # the fori_loop carry typechecks under shard_map (utils/vma.py).
        init = {k: vma.pvary_like(jnp.int32(0), key) for k in (
            "test_frames", "error_bits", "error_frames", "lt3_frames",
            "mod_error_bits", "mod_error_symbols", "mod_error_frames",
            "mp_iters", "bf_rounds")}
        dcfg = cfg.decoder()
        bf_cap = max(dcfg.bf.max_iter, 1)
        init["mp_hist"] = vma.pvary_like(
            jnp.zeros(dcfg.max_iter + 1, jnp.int32), key)
        init["bf_hist"] = vma.pvary_like(
            jnp.zeros(bf_cap + 1, jnp.int32), key)
        return jax.lax.fori_loop(0, rounds, body, init)

    return loop


def sigma_for(cfg: SimConfig, snr_db: float) -> float:
    """Noise sigma from Eb/N0 (reference CSimulate.cpp:67-91)."""
    return cfg.sigma_at(snr_db)
