"""Layered check-node update in the QC block layout.

One call updates a whole block-row (Z = 256 independent CNs) for every
frame in the batch.  The reference processes CNs one at a time with an
unrolled AVX loop and updates ``var_nodes`` in place (a layered schedule;
reference CLDPC.cpp:293-406) - because every block is a shifted identity,
the Z CNs of a block-row touch disjoint VNs, so this dense batched update
is bit-identical to the reference's sequential walk within a block-row,
and block-rows are applied sequentially to preserve the layered schedule
across rows.

Sign convention: the reference maps LLR > 0 to bit 1, which flips the
usual min-sum sign rule to  sign(Lmn) = (-1)^deg * prod_{others} sign(Lnm)
- implemented there via the 0xC0 (odd degree) / 0x40 (even degree) XOR
constant trick (CLDPC.cpp:299-311, 374-378).  Here it is plain boolean
algebra: ``neg = parity_all XOR own_neg XOR (deg odd)``.

Numerics are exact int8 fixed point: see ops/fixed_point.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from ..code.qc_matrix import QCCode
from . import fixed_point as fp

BIG = jnp.int32(127)


@dataclasses.dataclass(frozen=True)
class RowCtx:
    """Per-iteration, per-block-row context for selective / FAID modes."""

    it: Any = None              # traced iteration index (0-based)
    in_floor: Any = None        # traced bool: remaining iters <= thresh
    l_checksum: Any = None      # [batch, Z] bool: this CN unsatisfied
    l_m_error_sum: Any = None   # [batch] bool: frame error count < gate
    votes: Any = None           # [batch, C, Z] int32 (EF=2 only)
    era: Any = None             # [batch, C, Z] bool (EF=2 only)


def _min2_scan(abs_list):
    """Emulates the reference min1/min2 recurrence (CLDPC.h:35,68):
    min1 = running minimum, min2 = second minimum, both initialized to
    SAT_POS_VAR = 31 (CLDPC.cpp:296-297)."""
    min1 = jnp.full_like(abs_list[0], fp.SAT_POS_VAR)
    min2 = min1
    for a in abs_list:
        min2 = jnp.minimum(min2, jnp.maximum(min1, a))
        min1 = jnp.minimum(a, min1)
    return min1, min2


def _selective_offset(m, ctx: RowCtx, f1, f2):
    """Selective-OMS ("clipping layer") offset, reference
    CDecoder_OMS.cpp:386-434.  In the floor window, lanes whose CN is
    unsatisfied and whose frame has < floor_err_count errors get their
    min *raised* toward the factor thresholds; all other lanes get the
    normal -1/-2 offset.  The two conditional steps are sequential."""
    eff = ctx.l_checksum & ctx.l_m_error_sum[:, None] & ctx.in_floor

    up = m + (m < f2)
    up = up + (up <= f1)

    down = m - (m > f1)
    down = down - (down >= f2)

    return jnp.where(eff, up, down)


def _nms_cste(min1, min2, f1, f2):
    """NMS normalization: int16 multiply, logical >>5, pack-saturate,
    clamp to the 4-bit message max (CLDPC.cpp:342-363)."""
    c2 = fp.sat8((min1 * f1) >> 5)
    c1 = fp.sat8((min2 * f2) >> 5)
    return (jnp.minimum(c1, fp.SAT_POS_MSG), jnp.minimum(c2, fp.SAT_POS_MSG))


def nms_row(vc_list, deg):
    """Pass-1 hook for NMS: raw |vContr|, no clamp (CLDPC.cpp:333)."""
    return [jnp.abs(v) for v in vc_list]


def make_block_row_update(code: QCCode, r: int, *, style: str,
                          factor_1: int, factor_2: int, oms_mode: int,
                          oms_offset: int, lut=None, lut_ef=None,
                          sign_backtrack: bool = True,
                          ef_elimination: int = 0,
                          weight_buckets=None):
    """Build the update function for block-row ``r``.

    style: 'nms' | 'oms' | 'faid'.
    Returns f(en, msgs_r, ctx) -> (en_new, msgs_r_new[, era_new]) where
    en is [batch, C, Z] int8, msgs_r is [batch, deg_r, Z] int8.
    """
    deg = code.degrees[r]
    cols = code.block_cols[r][:deg]
    shifts = code.shifts[r][:deg]
    odd = bool(deg & 1)
    f1 = jnp.int32(factor_1)
    f2 = jnp.int32(factor_2)
    off = jnp.int32(oms_offset)

    def update(en, msgs_r, ctx: RowCtx):
        en32 = en.astype(jnp.int32)
        # ---- pass 1: gather contributions, signs, min1/min2 ------------
        vns = [jnp.roll(en32[:, c, :], -s, axis=-1) for c, s in zip(cols, shifts)]
        msgs32 = msgs_r.astype(jnp.int32)
        vcs = [fp.vn_sub_sat(vns[e], msgs32[:, e, :]) for e in range(deg)]

        era_new = ctx.era
        if style == "faid":
            vcs = [jnp.minimum(v, fp.SAT_POS_VAR) for v in vcs]
            if ef_elimination == 2:
                # One-shot per-VN erasure of flip-voted weight-3 columns
                # (reference CDecoder_FAID.cpp:673-679): only the first
                # edge visiting an eligible VN in this iteration is
                # zeroed; era_ marks it visited.
                new_vcs = []
                for e, (c, s) in enumerate(zip(cols, shifts)):
                    if int(code.vn_weight_blocks_np[c, 0]) != 3:
                        new_vcs.append(vcs[e])
                        continue
                    vote_c = jnp.roll(ctx.votes[:, c, :], -s, axis=-1)
                    era_c = jnp.roll(era_new[:, c, :], -s, axis=-1)
                    m = ((vote_c >= 3) & ctx.l_m_error_sum[:, None]
                         & ctx.in_floor & ~era_c)
                    new_vcs.append(jnp.where(m, 0, vcs[e]))
                    era_new = era_new.at[:, c, :].set(
                        jnp.roll(era_c | m, s, axis=-1))
                vcs = new_vcs
            if sign_backtrack:
                # FAID2_SIGN_BACKTRACK: zero contribution borrows the sign
                # of En (reference CDecoder_FAID.cpp:681-685).
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
            # LUT magnitude remap, per iteration (and per weight bucket;
            # all published buckets are identical).  Index 7 doubles as
            # the overflow bucket for |v2c| >= 8.
            row = lut[ctx.it]          # [8] int8 -> int32
            row_ef = lut_ef[ctx.it] if lut_ef is not None else None
            mags = []
            for e in range(deg):
                idx = jnp.minimum(jnp.abs(vcs[e]), 7)
                m = row.astype(jnp.int32)[idx]
                if ef_elimination >= 1:
                    eef = (ctx.l_checksum & ctx.l_m_error_sum[:, None]
                           & ctx.in_floor)
                    m_ef = row_ef.astype(jnp.int32)[idx]
                    m = jnp.where(eef, m_ef, m)
                mags.append(m)
        elif style == "oms":
            # abs clamped to the message max before min1/min2
            # (CDecoder_OMS.cpp:375).
            mags = [jnp.minimum(jnp.abs(v), fp.SAT_POS_MSG) for v in vcs]
        else:  # nms: raw abs
            mags = [jnp.abs(v) for v in vcs]

        min1, min2 = _min2_scan(mags)

        # ---- cste_1 (edges at min1) / cste_2 (other edges) -------------
        if style == "nms":
            cste_1, cste_2 = _nms_cste(min1, min2, f1, f2)
        elif style == "faid" or oms_mode == 0:
            cste_1 = jnp.minimum(min2 - off, fp.SAT_POS_MSG)
            cste_2 = jnp.minimum(min1 - off, fp.SAT_POS_MSG)
        else:  # selective OMS
            m1 = _selective_offset(min1, ctx, f1, f2)
            m2 = _selective_offset(min2, ctx, f1, f2)
            cste_1 = jnp.minimum(m2, fp.SAT_POS_MSG)
            cste_2 = jnp.minimum(m1, fp.SAT_POS_MSG)

        # ---- pass 2: new messages, En update ----------------------------
        # For NMS/OMS the pass-2 magnitude compare uses the *raw* |vContr|
        # against min1 (CLDPC.cpp:383-384); for FAID it's the mapped
        # magnitude (CDecoder_FAID.cpp:6380-6385).
        en_out = en32
        new_msgs = []
        for e, (c, s) in enumerate(zip(cols, shifts)):
            cmp_val = mags[e] if style in ("faid", "oms") else jnp.abs(vcs[e])
            # note: for OMS the stored pass-2 compare is on raw abs
            if style == "oms":
                cmp_val = jnp.abs(vcs[e])
            vres = jnp.where(cmp_val == min1, cste_1, cste_2)
            neg = jnp.logical_xor(jnp.logical_xor(parity, negs[e]),
                                  jnp.bool_(odd))
            # The 0x40 bit in the reference's sign byte guarantees
            # sign_epi8 never zeroes the result, so this is a pure
            # conditional negate.
            new_msg = jnp.where(neg, -vres, vres)
            en_new = fp.vn_add_sat(vcs[e], new_msg)
            new_msgs.append(new_msg.astype(jnp.int8))
            en_out = en_out.at[:, c, :].set(jnp.roll(en_new, s, axis=-1))

        msgs_out = jnp.stack(new_msgs, axis=1)
        return en_out.astype(jnp.int8), msgs_out, era_new

    return update
