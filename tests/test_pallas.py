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
    dcfg = DecoderConfig.for_method(method, max_iter=max_iter)
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


def test_supports_gates_group_mode():
    """The kernel freezes per frame, so group mode is xla-only - except
    where group semantics are vacuous (no early stop, no BF: NMS), which
    stays on the fast kernel.  The full-decoder factory must enforce the
    same gate as make_mp_decoder."""
    from faid_tpu.ops import pallas_decoder as pk

    nms_group = dataclasses.replace(
        DecoderConfig.for_method(DecodeMethod.NMS), stop_mode="group")
    assert pk.supports(nms_group)          # vacuous group semantics

    faid_group = dataclasses.replace(
        DecoderConfig.for_method(DecodeMethod.FAID_DTBF),
        stop_mode="group")
    assert not pk.supports(faid_group)
    with pytest.raises(ValueError):
        pk.make_full_decoder(toy_code(), faid_group)

    oms_group = dataclasses.replace(
        DecoderConfig.for_method(DecodeMethod.OMS), stop_mode="group")
    assert not pk.supports(oms_group)      # early stop is group-sensitive


def test_group_nms_pallas_matches_xla(rng):
    """NMS in group mode runs the fused kernel (vacuous-group fast path)
    and must still match the xla group-mode decoder bit-for-bit."""
    code = toy_code()
    dcfg = dataclasses.replace(small_cfg(DecodeMethod.NMS),
                               stop_mode="group")
    ref = jax.jit(build_decoder(code, dcfg, backend="xla"))
    pal = jax.jit(build_decoder(code, dcfg, backend="pallas",
                                interpret=True, pallas_bt=32))
    llr = rng.integers(-7, 8, size=(32, code.n_var)).astype(np.int8)
    a = jax.tree.map(np.asarray, ref(jnp.asarray(llr)))
    b = jax.tree.map(np.asarray, pal(jnp.asarray(llr)))
    np.testing.assert_array_equal(a["hard"], b["hard"])
    np.testing.assert_array_equal(a["mp_iters"], b["mp_iters"])


# Full-code kernel parity runs compiled on real TPU hardware
# (scripts/bench_decoder.py --check); interpret mode at N=17664 is too
# slow for the CPU suite, so full-code coverage here stays at the toy
# size plus the 50G-PON run in the TPU bench.
