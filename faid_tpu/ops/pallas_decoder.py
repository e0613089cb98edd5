"""Fused Pallas TPU kernel for the message-passing decode loop.

One kernel invocation decodes a batch tile end-to-end: channel LLRs are
loaded from HBM once, ALL decoder state (`en` variable nodes + `msgs`
edge messages) lives in VMEM for the whole iteration loop, and only the
final LLRs + iteration counts are written back.  This removes the
HBM round trip per block-row that the pure-XLA path pays (the jnp
decoder materializes [B, 275, 256] int8 messages through HBM every
iteration) - the TPU equivalent of the reference keeping the whole frame
state hot in L1/L2 across its unrolled AVX sweep (reference
CLDPC.cpp:214-2302).

Layout: state is [*, BT, Z] with the frame-batch tile BT on sublanes and
the circulant Z=256 on lanes - the native int8 (32, 128) VPU tiling.
Each block entry of H is a lane-roll (pltpu.roll), never a gather.

Numerics are bit-identical to ops/cn_update.py (verified by
tests/test_pallas.py): int32 arithmetic with explicit saturation bounds,
the same min1/min2 recurrence, LUT select chain, and sign algebra.

Supported: styles nms / oms (mode 0 and selective mode 1) / faid with
ef_elimination 0 or 1 - i.e. every reference decode method except the
EF=2 erasure experiment, which falls back to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..code.qc_matrix import QCCode
from ..config import DecoderConfig
from ..decoders import luts

SAT_POS_VAR, SAT_NEG_VAR = 31, -31
SAT_POS_MSG = 7


def supports(dcfg: DecoderConfig) -> bool:
    """Configs the fused kernel covers (all of them as of EF=2 support)."""
    return True


def _style_for(dcfg: DecoderConfig) -> str:
    m = dcfg.method.value
    return "nms" if m == 0 else ("oms" if m in (1, 3, 4) else "faid")


def _roll(x, shift):
    """jnp.roll(x, shift, axis=-1) on the lane axis.  Shift is normalized
    to [0, Z) (pltpu.roll requires non-negative) and the operand must be
    32-bit - Mosaic's lane rotate is not implemented for int8 vectors, so
    callers widen first."""
    assert x.dtype in (jnp.int32, jnp.float32, jnp.uint32), x.dtype
    shift %= x.shape[1]
    if shift == 0:
        return x
    return pltpu.roll(x, shift=shift, axis=1)


def _clip8(x):
    return jnp.clip(x, -128, 127)


def _make_kernel(code: QCCode, dcfg: DecoderConfig, bt: int):
    style = _style_for(dcfg)
    f1, f2 = dcfg.factor_1, dcfg.factor_2
    off = dcfg.oms_offset
    max_iter = dcfg.max_iter
    stop_early = dcfg.stop_early
    selective = style == "oms" and dcfg.oms_mode == 1
    use_ef = style == "faid" and dcfg.ef_elimination >= 1
    use_ef2 = style == "faid" and dcfg.ef_elimination == 2
    z = code.z
    n_rows = code.n_block_rows
    entry_offsets = np.concatenate([[0], np.cumsum(code.degrees_np)])
    edges = [
        [(int(code.block_cols[r][e]), int(code.shifts[r][e]))
         for e in range(code.degrees[r])]
        for r in range(n_rows)
    ]
    # Block-column adjacency for the EF=2 flip-vote computation:
    # votes_col[c] = sum over (r, s) of roll(unsat[r], +s); the column
    # weight is the adjacency length (uniform within a QC block column).
    col_edges = {}
    for r in range(n_rows):
        for c, sh in edges[r]:
            col_edges.setdefault(c, []).append((r, sh))

    def syndrome_row(en_ref, r):
        """[BT, Z] bool: CN r unsatisfied, from sign(en) > 0.
        en_ref holds int32 (the VMEM-resident working state)."""
        acc = None
        for c, s in edges[r]:
            h = _roll(en_ref[c], -s) > 0
            acc = h if acc is None else jnp.logical_xor(acc, h)
        return acc

    def lut_mag(lut_ref, it, idx):
        """row[idx] via an unrolled select chain; idx in [0, 7]."""
        mag = jnp.zeros_like(idx) + lut_ref[it, 7]
        for k in range(7):
            mag = jnp.where(idx == k, lut_ref[it, k], mag)
        return mag

    def row_update(en_ref, msgs_ref, lut_refs, it, r, active, l_checksum,
                   l_m_err, in_floor, unsat_rows=None, era_ref=None):
        deg = len(edges[r])
        odd = bool(deg & 1)
        lo = int(entry_offsets[r])

        # ---- pass 1 ----------------------------------------------------
        vns, vcs = [], []
        for e, (c, s) in enumerate(edges[r]):
            vn = _roll(en_ref[c], -s)
            vc = jnp.maximum(_clip8(vn - msgs_ref[lo + e].astype(jnp.int32)),
                             SAT_NEG_VAR)
            vns.append(vn)
            vcs.append(vc)

        if style == "faid":
            vcs = [jnp.minimum(v, SAT_POS_VAR) for v in vcs]
            if use_ef2:
                # One-shot per-VN erasure of flip-voted weight-3 columns
                # (reference CDecoder_FAID.cpp:673-679): only the first
                # edge visiting an eligible VN this iteration is zeroed;
                # era marks it visited.
                new_vcs = []
                for e, (c, s) in enumerate(edges[r]):
                    if len(col_edges[c]) != 3:
                        new_vcs.append(vcs[e])
                        continue
                    votes_col = functools.reduce(jnp.add, [
                        _roll(unsat_rows[rp].astype(jnp.int32), sp)
                        for rp, sp in col_edges[c]])
                    vote_al = _roll(votes_col, -s)
                    era_al = _roll(era_ref[c].astype(jnp.int32), -s)
                    m = ((vote_al >= 3) & l_m_err & in_floor
                         & (era_al == 0))
                    new_vcs.append(jnp.where(m, 0, vcs[e]))
                    era_ref[c] = _roll(
                        era_al | m.astype(jnp.int32), s).astype(jnp.int8)
                vcs = new_vcs
            if dcfg.sign_backtrack:
                negs = [jnp.where(vcs[e] == 0, vns[e], vcs[e]) < 0
                        for e in range(deg)]
            else:
                negs = [v < 0 for v in vcs]
        else:
            negs = [v < 0 for v in vcs]

        parity = negs[0]
        for e in range(1, deg):
            parity = jnp.logical_xor(parity, negs[e])

        if style == "faid":
            lut_ref, lut_ef_ref = lut_refs
            if use_ef:
                eff = l_checksum & l_m_err & in_floor
            mags = []
            for e in range(deg):
                idx = jnp.minimum(jnp.abs(vcs[e]), 7)
                m = lut_mag(lut_ref, it, idx)
                if use_ef:
                    m = jnp.where(eff, lut_mag(lut_ef_ref, it, idx), m)
                mags.append(m)
        elif style == "oms":
            mags = [jnp.minimum(jnp.abs(v), SAT_POS_MSG) for v in vcs]
        else:
            mags = [jnp.abs(v) for v in vcs]

        min1 = jnp.full_like(mags[0], SAT_POS_VAR)
        min2 = min1
        for m in mags:
            min2 = jnp.minimum(min2, jnp.maximum(min1, m))
            min1 = jnp.minimum(m, min1)

        # ---- offsets / normalization ----------------------------------
        if style == "nms":
            cste_1 = jnp.minimum(_clip8((min2 * f2) >> 5), SAT_POS_MSG)
            cste_2 = jnp.minimum(_clip8((min1 * f1) >> 5), SAT_POS_MSG)
        elif style == "faid" or not selective:
            cste_1 = jnp.minimum(min2 - off, SAT_POS_MSG)
            cste_2 = jnp.minimum(min1 - off, SAT_POS_MSG)
        else:
            eff = l_checksum & l_m_err & in_floor

            def offsel(m):
                up = m + (m < f2)
                up = up + (up <= f1)
                down = m - (m > f1)
                down = down - (down >= f2)
                return jnp.where(eff, up, down)

            cste_1 = jnp.minimum(offsel(min2), SAT_POS_MSG)
            cste_2 = jnp.minimum(offsel(min1), SAT_POS_MSG)

        # ---- pass 2 ----------------------------------------------------
        for e, (c, s) in enumerate(edges[r]):
            cmp_val = mags[e] if style == "faid" else jnp.abs(vcs[e])
            vres = jnp.where(cmp_val == min1, cste_1, cste_2)
            neg = jnp.logical_xor(jnp.logical_xor(parity, negs[e]),
                                  jnp.bool_(odd))
            new_msg = jnp.where(neg, -vres, vres)
            en_new = jnp.minimum(
                jnp.maximum(_clip8(vcs[e] + new_msg), SAT_NEG_VAR),
                SAT_POS_VAR)
            msgs_ref[lo + e] = jnp.where(
                active, new_msg, msgs_ref[lo + e].astype(jnp.int32)
            ).astype(jnp.int8)
            en_ref[c] = jnp.where(active, _roll(en_new, s), en_ref[c])

    def kernel(*args):
        era_ref = None
        if style == "faid":
            if use_ef2:
                (lut_ref, lut_ef_ref, llr_ref, en_out, iters_out,
                 msgs_ref, en32, era_ref) = args
            else:
                (lut_ref, lut_ef_ref, llr_ref, en_out, iters_out,
                 msgs_ref, en32) = args
            lut_refs = (lut_ref, lut_ef_ref)
        else:
            llr_ref, en_out, iters_out, msgs_ref, en32 = args
            lut_refs = None

        # Working state lives in VMEM as int32 for the whole decode -
        # `en` is read three times per edge per iteration, and keeping it
        # widened avoids an int8<->int32 relayout at every access.
        en32[...] = llr_ref[...].astype(jnp.int32)
        msgs_ref[...] = jnp.zeros(msgs_ref.shape, msgs_ref.dtype)
        iters_out[...] = jnp.zeros(iters_out.shape, iters_out.dtype)

        def iteration(it, _):
            if stop_early:
                unsat_rows = [syndrome_row(en32, r) for r in range(n_rows)]
                count = functools.reduce(
                    jnp.add,
                    [u.astype(jnp.int32).sum(axis=1, keepdims=True)
                     for u in unsat_rows])                  # [BT, 1]
                active = count > 0
                l_m_err = count < dcfg.floor_err_count
                any_active = jnp.any(active)
            else:
                unsat_rows = [None] * n_rows
                active = jnp.ones((bt, 1), jnp.bool_)
                l_m_err = jnp.zeros((bt, 1), jnp.bool_)
                any_active = jnp.bool_(True)

            remaining = max_iter - 1 - it
            in_floor = remaining <= dcfg.floor_iter_thresh

            @pl.when(any_active)
            def _():
                if use_ef2:
                    # erase flags reset at the top of every iteration
                    # (reference CDecoder_FAID.cpp:624-628)
                    era_ref[...] = jnp.zeros(era_ref.shape, era_ref.dtype)
                for r in range(n_rows):
                    row_update(en32, msgs_ref, lut_refs, it, r, active,
                               unsat_rows[r], l_m_err, in_floor,
                               unsat_rows=unsat_rows, era_ref=era_ref)
                iters_out[...] = iters_out[...] + active.astype(jnp.int32)

            return 0

        jax.lax.fori_loop(0, max_iter, iteration, 0)
        en_out[...] = en32[...].astype(jnp.int8)

    return kernel


@functools.lru_cache(maxsize=32)
def make_mp_decoder(code: QCCode, dcfg: DecoderConfig, bt: int = 32,
                    interpret: bool = False):
    """Returns mp(llr_cbz [C, B, Z] int8) -> (en [C, B, Z] int8,
    mp_iters [B] int32); B must be a multiple of bt."""
    if not supports(dcfg):
        raise ValueError("config not supported by the fused kernel")
    style = _style_for(dcfg)
    c_blocks = code.n_block_cols
    z = code.z
    n_entries = int(code.degrees_np.sum())
    kernel = _make_kernel(code, dcfg, bt)

    lut_args = ()
    num_lut = 0
    if style == "faid":
        # numpy (not jnp) so the lru-cached closure never captures a
        # traced constant - jnp.asarray under an active jit trace yields
        # a tracer, which would leak across traces.
        lut = np.asarray(
            luts.table_for(dcfg.lut_family, dcfg.max_iter), np.int32)
        lut_ef = np.asarray(luts.ef_table(dcfg.max_iter), np.int32)
        lut_args = (lut, lut_ef)
        num_lut = 2

    def mp(llr_cbz: jax.Array):
        b = llr_cbz.shape[1]
        assert b % bt == 0, (b, bt)
        grid = (b // bt,)
        # Under shard_map the outputs inherit the input's varying-axes
        # (vma) type; pallas_call requires it spelled out on out_shape.
        try:
            vma = jax.typeof(llr_cbz).vma or None
        except Exception:
            vma = None
        vkw = {"vma": vma} if vma else {}
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * num_lut
            + [pl.BlockSpec((c_blocks, bt, z), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)]
        )
        out_specs = (
            pl.BlockSpec((c_blocks, bt, z), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        )
        en, iters = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((c_blocks, b, z), jnp.int8, **vkw),
                jax.ShapeDtypeStruct((b, 1), jnp.int32, **vkw),
            ),
            scratch_shapes=(
                [pltpu.VMEM((n_entries, bt, z), jnp.int8),
                 pltpu.VMEM((c_blocks, bt, z), jnp.int32)]
                + ([pltpu.VMEM((c_blocks, bt, z), jnp.int8)]
                   if (style == "faid" and dcfg.ef_elimination == 2)
                   else [])),
            interpret=interpret,
        )(*lut_args, llr_cbz)
        return en, iters.reshape(b)

    return mp


def decode_mp_pallas(llr_blocks: jax.Array, code: QCCode,
                     dcfg: DecoderConfig, bt: int = 32,
                     interpret: bool = False):
    """llr_blocks [B, C, Z] int8 (already ingested: tail zeroed) ->
    (en [B, C, Z] int8, mp_iters [B] int32)."""
    mp = make_mp_decoder(code, dcfg, bt=bt, interpret=interpret)
    llr_cbz = jnp.transpose(llr_blocks, (1, 0, 2))
    en, iters = mp(llr_cbz)
    return jnp.transpose(en, (1, 0, 2)), iters
