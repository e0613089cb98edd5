"""Fused quantile-sampling channel: modulate + AWGN + demap + quantize
in ONE pass, with no floating-point noise materialized at all.

For BPSK/QPSK the whole front end collapses per bit: the demapped soft
value is ``soft = s*a + sigma_rail*z`` (s = +-1 from the transmitted
bit, z ~ N(0,1)), and everything downstream consumes only

  * the quantized LLR  ``q = clip(trunc(scale*soft), lo, hi)``  and
  * the hard decision  ``soft > 0``  (pre-decoder ModCalErr stats),

both of which are monotone staircase functions of z.  So instead of
generating a Gaussian and pushing it through the float chain, draw ONE
uniform 32-bit word u per bit and compare it against the precomputed
quantile thresholds Phi^-1 of each staircase step:

  P(q >= k) = P(z >= (k/scale - s*a)/sigma_rail) = P(u >= Phi(t_k))

The output distribution is then EXACTLY the marginal of the reference
chain (reference CModulate.cpp:216-362 demap + CLDPC.cpp:4385-4770
truncating quantizer) up to the 2^-32 uniform grid and ~1e-7 relative
error of the float32 normal CDF on each step probability -- tail steps
are computed via the complement (ndtr(-t)) so the *relative* tail
accuracy survives.  This is strictly tighter than simulating float32
noise (whose own Box-Muller/erfinv tails carry comparable error) and
removes the front end from the roofline: threefry noise generation
alone cost 1.46 ms/round at batch 2048 (docs/ROOFLINE.md); the fused
kernel replaces the entire 2.3 ms front end with ~0.3 ms of compares.

Bit-1 symmetry: trunc and the +-L saturation are odd-symmetric, so
``q(+a, z) = -q(-a, -z)``; the kernel mirrors the uniform grid
(ix ^ -1 == reflecting u -> 1-u) and negates the output instead of
keeping a second threshold set.  Asymmetric final limits (3/5-bit
quantizers, e.g. clip to [-4, 3]) are applied after the sign restore.

Backends:
  * TPU: a Pallas kernel using the on-core hardware PRNG
    (``pltpu.prng_random_bits``) -- one u32 per LLR, no HBM traffic
    besides the codeword in and the int8 LLR out.
  * elsewhere (CPU tests, virtual meshes): the same staircase evaluated
    with jnp on ``jax.random.bits`` (threefry) words.
  The two backends draw different (documented) random streams but the
  identical marginal distribution; see README "Fidelity contract".
  Forensic exact-replay works on whichever platform produced the run.

Statistical validation: tests/test_pallas_channel.py (thresholds vs
float64 erf; multinomial test of the staircase outputs against the
analytic law; exact mirror identity; end-to-end rate agreement with the
float-path channel) and the on-hardware FER consistency artifact
docs/channel_parity.json (scripts/channel_parity.py).
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..code.qc_matrix import QCCode
from ..ops.fixed_point import _QUANT_LIMITS

# Knuth multiplicative hash constant (2654435761 as int32) used to give
# every grid block its own hardware-PRNG stream.
_KNUTH = -1640531527

_AMPLITUDE = {1: 1.0, 2: 0.707107}   # BPSK; QPSK rail (CModulate.cpp:4)


def supports(code: QCCode, cfg) -> bool:
    """True if the fused quantile channel covers this configuration.

    BPSK/QPSK only: for 16-QAM+ the folded demap makes several LLRs
    share one rail draw, so per-bit quantile sampling does not apply
    (those paths keep the XLA float chain).
    Any interleave depth is fine -- with one bit per LLR the
    interleave/deinterleave pair is transparent end-to-end.

    The tiling constraints (lane-multiple divisor of n_var, batch %
    _BT) only apply to the TPU kernel; the portable jnp/threefry
    backend used on CPU and virtual meshes has no shape requirements."""
    if cfg.mod_type not in _AMPLITUDE:
        return False
    if cfg.quant_bits not in (2, 3, 4, 5):    # truncating quantizers
        return False
    if jax.devices()[0].platform == "tpu":
        if _pick_nt(code.n_var) is None:
            return False
        if cfg.batch_per_device % _BT != 0:
            return False
    return True


_BT = 64          # frame tile (sublane multiple; VMEM-safe with int32 temps)


def _pick_nt(n: int) -> int | None:
    """Largest divisor of n that is a lane multiple and VMEM-friendly."""
    best = None
    for k in range(1, n // 128 + 1):
        nt = 128 * k
        if n % nt == 0 and nt <= 4096:
            best = nt
    return best


def _sigma_rail(cfg, sigma):
    # QPSK splits the complex noise power over I/Q (CSimulate.cpp:126).
    return sigma / jnp.sqrt(jnp.float32(2.0)) if cfg.mod_type == 2 else sigma


def _threshold_ints(cfg, sigma) -> jnp.ndarray:
    """int32[2L+1] staircase thresholds on the uniform int32 grid for a
    transmitted '0' bit (amplitude -a): [A_1..A_L, B_1..B_L, H] with
    STRICT compares

      q >= k      <=>  ix >  A_k
      q <= -k     <=>  ix <  B_k
      soft > 0    <=>  ix >  H      (pre-decoder hard decision)

    where ix is a uniform int32 (u = (ix + 2^31)/2^32).  Tail-accurate:
    every probability is evaluated on its small side with ndtr,
    round-to-nearest onto the 2^-32 grid, and converted with exact
    integer arithmetic.  Strict compares let a step whose probability
    rounds to 0 (p < 2^-33) saturate to an UNREACHABLE threshold
    (INT32_MAX / INT32_MIN) instead of being clamped up to one grid
    unit - deep-floor campaigns no longer see spurious ~2.3e-10/bit
    max-magnitude wrong LLRs that the float chain essentially never
    produces."""
    lo, hi = _QUANT_LIMITS[cfg.quant_bits]
    L = max(hi, -lo)
    a = jnp.float32(_AMPLITUDE[cfg.mod_type])
    srail = _sigma_rail(cfg, jnp.float32(sigma))
    inv_scale = jnp.float32(1.0 / cfg.scale)
    k = jnp.arange(1, L + 1, dtype=jnp.float32)

    two32 = jnp.float32(4294967296.0)
    xmax = jnp.float32(2**31 - 256)          # f32-representable clamp

    def grid(p):
        # round(p * 2^32) onto the uniform grid; 0 allowed (step never
        # fires through the strict compare).
        return jnp.clip(jnp.rint(p * two32), 0.0, xmax).astype(jnp.int32)

    def grid1(p):
        # variant clamped to >= 1 for the one complement-side use where
        # count 0 would overflow int32 (and is not a tail event).
        return jnp.clip(jnp.rint(p * two32), 1.0, xmax).astype(jnp.int32)

    ndtr = jax.scipy.special.ndtr

    # A_k: t = (k/scale + a)/srail > 0 always; P(z >= t) = ndtr(-t);
    # exactly grid(p) of the 2^32 ix values satisfy ix > A_k.
    t_a = (k * inv_scale + a) / srail
    A = jnp.int32(2**31 - 1) - grid(ndtr(-t_a))

    # B_k: t' = (a - k/scale)/srail, sign depends on k and scale.
    t_b = (a - k * inv_scale) / srail
    #   t' > 0:  P(z <= t') = 1 - ndtr(-t') is large; the small side is
    #   the complement, so count-0 would mean B = INT32_MAX + 1 - keep
    #   the >=1 clamp here (bias 2^-32 on a near-certain step).
    T_pos = jnp.int32(2**31 - 1) - grid1(ndtr(-t_b)) + 1
    #   t' <= 0: P(z <= t') = ndtr(t') small; grid 0 -> B = INT32_MIN,
    #   unreachable via ix < B.
    T_neg = jnp.int32(-(2**31)) + grid(ndtr(t_b))
    B = jnp.where(t_b > 0, T_pos, T_neg)

    # H: soft > 0  <=>  z > a/srail.
    H = jnp.int32(2**31 - 1) - grid(ndtr(-a / srail))

    return jnp.concatenate([A, B, H[None]])


def staircase(ix: jnp.ndarray, mask: jnp.ndarray, params,
              quant_bits: int):
    """Shared core: uniform int32 words -> (int8 LLR, int8 mod_err).

    ``mask`` is 0 for a transmitted 0-bit, -1 for a 1-bit (mirrors the
    uniform grid via XOR).  ``params`` indexable as params[i] scalars
    (SMEM ref inside the kernel, or a jnp array outside)."""
    lo, hi = _QUANT_LIMITS[quant_bits]
    L = max(hi, -lo)
    ixe = ix ^ mask
    q = jnp.zeros(ix.shape, jnp.int32)
    for i in range(L):
        q = q + (ixe > params[i]).astype(jnp.int32)
        q = q - (ixe < params[L + i]).astype(jnp.int32)
    q = (q ^ mask) - mask                      # restore the bit's sign
    if -lo != hi:                              # asymmetric final clip
        q = jnp.clip(q, lo, hi)
    err = (ixe > params[2 * L]).astype(jnp.int8)
    return q.astype(jnp.int8), err


def _kernel(params_ref, cw_ref, llr_ref, err_ref, *, quant_bits, nparam):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(params_ref[nparam],
                    params_ref[nparam + 1] + pid * jnp.int32(_KNUTH))
    ix = pltpu.bitcast(pltpu.prng_random_bits(llr_ref.shape), jnp.int32)
    mask = -(cw_ref[:] != 0).astype(jnp.int32)
    llr, err = staircase(ix, mask, params_ref, quant_bits)
    llr_ref[:] = llr
    err_ref[:] = err


def _key_seeds(key: jax.Array) -> jnp.ndarray:
    kd = jax.random.key_data(key).reshape(-1)[:2]
    return jax.lax.bitcast_convert_type(kd, jnp.int32)


def build_fused_channel(code: QCCode, cfg, interpret: bool = False) -> Callable:
    """Returns channel(cw_int8[batch, n], key, sigma) ->
    (llr int8[batch, n], mod_err int8[batch, n]).

    ``mod_err[i, j]`` is 1 where the pre-decoder hard decision differs
    from the transmitted bit (the ModCalErr indicator).  On TPU this is
    one Pallas kernel (hardware PRNG); elsewhere the same staircase on
    threefry words.  ``interpret=True`` forces the Pallas kernel in
    interpret mode on any platform (CI coverage of the kernel + its
    shard_map vma workaround without hardware)."""
    if not supports(code, cfg):
        raise ValueError("fused channel unsupported for this config "
                         "(BPSK/QPSK + 2..5-bit quantizer only)")
    if interpret and (_pick_nt(code.n_var) is None
                      or cfg.batch_per_device % _BT):
        raise ValueError("kernel tiling needs batch % 64 == 0 and a "
                         "lane-multiple divisor of n_var")
    n = code.n_var
    nt = _pick_nt(n)
    batch = cfg.batch_per_device
    quant_bits = cfg.quant_bits
    lo, hi = _QUANT_LIMITS[quant_bits]
    nparam = 2 * max(hi, -lo) + 1

    def channel_tpu(cw, key, sigma):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        params = jnp.concatenate([_threshold_ints(cfg, sigma),
                                  _key_seeds(key)])
        kern = functools.partial(_kernel, quant_bits=quant_bits,
                                 nparam=nparam)
        # Under shard_map the outputs inherit the inputs' varying-axes
        # (vma) type; pallas_call requires it spelled out on out_shape
        # (same workaround as ops/pallas_decoder.py).  Derive it from
        # params — the key-seeded side — because with fake_encode the
        # codeword is a replicated constant while the random stream
        # still varies per device.
        try:
            vma = (jax.typeof(params).vma | jax.typeof(cw).vma) or None
        except Exception:
            vma = None
        vkw = {"vma": vma} if vma else {}
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((batch, n), jnp.int8, **vkw),
                       jax.ShapeDtypeStruct((batch, n), jnp.int8, **vkw)),
            grid=(batch // _BT, n // nt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((_BT, nt), lambda i, j: (i, j))],
            out_specs=(pl.BlockSpec((_BT, nt), lambda i, j: (i, j)),
                       pl.BlockSpec((_BT, nt), lambda i, j: (i, j))),
            interpret=interpret,
        )(params, cw)

    def channel_jnp(cw, key, sigma):
        params = _threshold_ints(cfg, sigma)
        bits = jax.random.bits(key, (batch, n), jnp.uint32)
        ix = jax.lax.bitcast_convert_type(bits, jnp.int32)
        mask = -(cw != 0).astype(jnp.int32)
        return staircase(ix, mask, params, quant_bits)

    # Same platform resolution as decoders/core.py backend="auto".
    if interpret or jax.devices()[0].platform == "tpu":
        return channel_tpu
    return channel_jnp
