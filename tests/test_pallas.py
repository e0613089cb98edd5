"""Pallas fused-MP-kernel bit-exactness vs the XLA decoder (interpret mode
on CPU; the real compiled path is exercised on TPU by bench/e2e runs)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from faid_tpu.code.toy import toy_code
from faid_tpu.config import DecodeMethod, DecoderConfig
from faid_tpu.decoders.core import build_decoder

METHODS = list(DecodeMethod)


def small_cfg(method, max_iter=4, bf_iter=3):
    # NMS gets its own 26/32 factors: the shared Profile default 1/6
    # floors the NMS normalization to zero and fires the degenerate-
    # factor warning (decoders/core.py) on every build.
    kw = dict(factor_1=26, factor_2=32) if method == DecodeMethod.NMS else {}
    dcfg = DecoderConfig.for_method(method, max_iter=max_iter, **kw)
    if dcfg.bf.kind != "none":
        dcfg = dataclasses.replace(
            dcfg, bf=dataclasses.replace(dcfg.bf, max_iter=bf_iter))
    return dcfg


@pytest.mark.parametrize("method", METHODS)
def test_pallas_matches_xla_toy(rng, method):
    code = toy_code()
    dcfg = small_cfg(method)
    ref = jax.jit(build_decoder(code, dcfg, backend="xla"))
    pal = jax.jit(build_decoder(code, dcfg, backend="pallas",
                                interpret=True, pallas_bt=32))
    llr = rng.integers(-7, 8, size=(64, code.n_var)).astype(np.int8)
    a = jax.tree.map(np.asarray, ref(jnp.asarray(llr)))
    b = jax.tree.map(np.asarray, pal(jnp.asarray(llr)))
    np.testing.assert_array_equal(a["hard"], b["hard"], err_msg=method.name)
    np.testing.assert_array_equal(a["mp_iters"], b["mp_iters"])
    np.testing.assert_array_equal(a["bf_rounds"], b["bf_rounds"])


@pytest.mark.parametrize("method", METHODS)
def test_pallas_matches_xla_toy_group(rng, method):
    """Group mode (reference 32-frame-word early-stop semantics) in the
    fused kernel must match the xla group-mode decoder bit-for-bit.
    Batch 64 = two independent 32-frame groups, so the test covers a
    clean group coexisting with a dirty one."""
    code = toy_code()
    dcfg = dataclasses.replace(small_cfg(method), stop_mode="group")
    ref = jax.jit(build_decoder(code, dcfg, backend="xla"))
    pal = jax.jit(build_decoder(code, dcfg, backend="pallas",
                                interpret=True, pallas_bt=32))
    llr = rng.integers(-7, 8, size=(64, code.n_var)).astype(np.int8)
    # Make group 0 mostly clean early (strong correct LLRs for the
    # all-zero codeword) so the two groups exit at different rounds.
    llr[:32] = np.minimum(llr[:32], -1)
    a = jax.tree.map(np.asarray, ref(jnp.asarray(llr)))
    b = jax.tree.map(np.asarray, pal(jnp.asarray(llr)))
    np.testing.assert_array_equal(a["hard"], b["hard"], err_msg=method.name)
    np.testing.assert_array_equal(a["mp_iters"], b["mp_iters"])
    np.testing.assert_array_equal(a["bf_rounds"], b["bf_rounds"])


def test_group_mode_requires_bt32():
    """Group semantics are tied to the reference's 32-frame SIMD word;
    the factories reject any other tile size."""
    from faid_tpu.ops import pallas_decoder as pk

    faid_group = dataclasses.replace(
        DecoderConfig.for_method(DecodeMethod.FAID_DTBF),
        stop_mode="group")
    assert pk.supports(faid_group)
    with pytest.raises(ValueError, match="bt == 32"):
        pk.make_full_decoder(toy_code(), faid_group, bt=64)
    with pytest.raises(ValueError, match="bt == 32"):
        pk.make_mp_decoder(toy_code(), dataclasses.replace(
            DecoderConfig.for_method(DecodeMethod.OMS), stop_mode="group"),
            bt=64)


# Full-code kernel parity runs compiled on real TPU hardware
# (scripts/bench_decoder.py --check); interpret mode at N=17664 is too
# slow for the CPU suite, so full-code coverage here stays at the toy
# size plus the 50G-PON run in the TPU bench.
