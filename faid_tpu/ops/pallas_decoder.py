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

Coverage: every reference decode method and knob - styles nms / oms
(mode 0 and selective mode 1) / faid (EF 0/1/2, all LUT families), the
BF post-processors (static / DTBF / 2B1C) fused into the same kernel
(``make_full_decoder``) so a complete decode never leaves VMEM, and
both early-stop granularities: stop_mode='frame' (per-frame freeze) and
'group' (reference-exact 32-frame-word semantics - the bt=32 tile IS
the reference's SIMD word, so group mode drops the per-frame masking
selects from the hot loop and is the *faster* path).

Mosaic constraints encoded here: lane rotates and vector compares must
be int32 (no int8 rotate/cmp); (BT,1) bool vectors can't ride a
while_loop carry (carry int32 flags); select over bool vectors is
avoided (int32 selects only).
"""

from __future__ import annotations

import functools
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

# The hoisted syndrome sweep keeps the 69 per-column hard decisions live
# across the edge walk, which pushes the compiler's scoped-VMEM stack
# past its conservative 16 MB default at larger batch tiles (16.4 MB
# measured at bt=128); the v5e has 128 MB of VMEM and the persistent
# scratches stay well clear, so raise the stack limit uniformly.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def supports(dcfg: DecoderConfig) -> bool:
    """Real capability check for the fused kernel (the 'auto' backend
    gate in decoders/core.py falls back to xla when this is False).

    Covered: every reference decode method and knob - styles nms/oms
    (modes 0/1) / faid (EF 0/1/2, all LUT families), all BF kinds, and
    both stop modes.  stop_mode='group' maps 1:1 onto the kernel: the
    bt=32 batch tile IS the reference's 32-frame SIMD word
    (CLDPC.h:21), so the reference's whole-word early stop
    (CDecoder_OMS.cpp:325-327, CDecoder_FAID.cpp:6782-6784) becomes a
    per-tile gate and the per-frame freeze selects drop out of the hot
    loop entirely (the factories enforce bt == 32 for group mode)."""
    if dcfg.stop_mode not in ("frame", "group"):
        return False
    if _style_for(dcfg) not in ("nms", "oms", "faid"):
        return False
    if dcfg.oms_mode not in (0, 1) or dcfg.ef_elimination not in (0, 1, 2):
        return False
    if dcfg.bf.kind not in ("none", "static", "dtbf", "dtbf2b1c"):
        return False
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


def _scratch_shapes(code: QCCode, dcfg: DecoderConfig, bt: int,
                    fuse_bf: bool):
    """Scratch list shared by every decoder factory; the kernel pops
    them in this order: msgs, en32, era?, hard?, hard_ch?, hard2?,
    alive?, (Th, l0, l1, t, rounds, bf_go)?."""
    style = _style_for(dcfg)
    z = code.z
    c_blocks = code.n_block_cols
    n_entries = int(code.degrees_np.sum())
    s = [pltpu.VMEM((n_entries, bt, z), jnp.int8),
         pltpu.VMEM((c_blocks, bt, z), jnp.int32)]
    if style == "faid" and dcfg.ef_elimination == 2:
        s.append(pltpu.VMEM((c_blocks, bt, z), jnp.int8))
    if fuse_bf:
        s.append(pltpu.VMEM((c_blocks, bt, z), jnp.int8))   # hard
        s.append(pltpu.VMEM((c_blocks, bt, z), jnp.int8))   # hard_ch
        if dcfg.bf.kind == "dtbf2b1c":
            s.append(pltpu.VMEM((c_blocks, bt, z), jnp.int8))
    if dcfg.stop_early:
        s.append(pltpu.SMEM((1,), jnp.int32))               # alive flag
    if fuse_bf:
        # DTBF machine state + round counter + go flag: scratch refs
        # (not loop carries) so the BF rounds run as a scalar-gated
        # fori instead of a while_loop - a dynamic trip count
        # serializes Mosaic's kernel pipeline (measured 1.75 ms for a
        # BF tail that executes ~1 round at 4.0 dB).
        s += [pltpu.VMEM((bt, 1), jnp.int32) for _ in range(5)]
        s.append(pltpu.SMEM((1,), jnp.int32))               # bf go flag
    return s


def _msg_bound(dcfg: DecoderConfig) -> int | None:
    """Conservative bound M on |stored message| for this config, or None
    when no bound <= 48 can be proven.

    Used to elide the int8 pack-saturation clips (+-127/-128) from the
    hot loop: with en in [-31, 31] (enforced every pass-2 write) and
    |msg| <= M <= 48, both ``en - msg`` (pass 1) and ``vc + msg``
    (pass 2, |vc| <= 31 + M) stay inside [-127, 127], so the
    reference's adds/subs_epi8 saturation can never fire and clipping
    is a provable no-op - bit-exactness is preserved while removing 4
    vector ops per edge.  Every published configuration proves M = 7
    (cste is clamped to <= SAT_POS_MSG and its lower side is >= -2);
    adversarial factors/LUTs fall back to the clipped path."""
    style = _style_for(dcfg)
    if style == "nms":
        # (min * f) >> 5 >= 0 for f >= 0, then min(. , 7).
        return 7 if (dcfg.factor_1 >= 0 and dcfg.factor_2 >= 0) else None
    if style == "oms" and dcfg.oms_mode == 1:
        # selective offsets move min by at most +-2; clamped to <= 7.
        return 7
    off = dcfg.oms_offset
    if style == "oms":
        lo = min(7, -off)              # min(min - off, 7), min >= 0
    else:
        lut = np.asarray(luts.table_for(dcfg.lut_family, dcfg.max_iter))
        lut_ef = np.asarray(luts.ef_table(dcfg.max_iter))
        lmin = int(min(lut.min(),
                       lut_ef.min() if dcfg.ef_elimination >= 1
                       else lut.min()))
        lo = min(7, min(lmin, 31) - off)
    m = max(7, abs(lo))
    return m if m <= 48 else None


def _make_kernel(code: QCCode, dcfg: DecoderConfig, bt: int,
                 fuse_bf: bool = False, fuse_stats: bool = False,
                 fake_ref: bool = False, chan: tuple | None = None):
    """Build the fused kernel body.

    chan = (mod_type, quant_bits) fuses the quantile-sampling channel
    (ops/pallas_channel.py) into the PROLOGUE: the kernel draws the
    hardware-PRNG words, evaluates the staircase into the int32 working
    state directly, and reduces the pre-decoder ModCalErr stats - one
    kernel then runs channel -> decode -> error reduction per batch
    tile, and nothing but per-frame counters ever reaches HBM."""
    style = _style_for(dcfg)
    f1, f2 = dcfg.factor_1, dcfg.factor_2
    off = dcfg.oms_offset
    max_iter = dcfg.max_iter
    stop_early = dcfg.stop_early
    # Pack-saturation elision (see _msg_bound): identical bits, 4 fewer
    # vector ops per edge whenever the config proves the int8 saturation
    # unreachable.
    sat8 = _clip8 if _msg_bound(dcfg) is None else (lambda x: x)
    # Group mode: the reference's early-stop granularity is the whole
    # 32-frame SIMD word, which is exactly this kernel's bt=32 batch
    # tile.  Per-frame freezing (the `active` selects in row_update and
    # the per-frame `dirty` gates in bf_tail) is replaced by the
    # existing per-tile gates, so group mode runs *fewer* ops per
    # iteration than frame mode.
    group = dcfg.stop_mode == "group"
    selective = style == "oms" and dcfg.oms_mode == 1
    use_ef = style == "faid" and dcfg.ef_elimination >= 1
    use_ef2 = style == "faid" and dcfg.ef_elimination == 2
    # All published LUT families map into [0, 7], so the 8-entry row
    # packs into ONE int32 at 4 bits/entry and the per-edge lookup is
    # (word >> (idx << 2)) & 0xF - no hi/lo word select, no sign
    # extension (5 ops instead of 9).  Out-of-range tables (negative or
    # > 15 entries) keep the two-word byte-packed path.
    lut4 = False
    if style == "faid":
        _lut = np.asarray(luts.table_for(dcfg.lut_family, dcfg.max_iter))
        _lef = np.asarray(luts.ef_table(dcfg.max_iter))
        lut4 = bool((_lut >= 0).all() and (_lut <= 15).all()
                    and (_lef >= 0).all() and (_lef <= 15).all())
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

    used_cols = sorted({c for r in range(n_rows) for c, _ in edges[r]})

    def syndrome_sweep(hs):
        """Per-row unsat indicators + total unsat-CN count per frame.

        ``hs[c]`` is the 0/1 int32 hard decision of block column c,
        computed ONCE per sweep (69 compares) instead of per edge
        (70400) - the per-edge work drops to roll + xor.  Returns
        (unsat list of [BT, Z] int32 0/1, count [BT, 1] int32); the
        count accumulates across rows in the vector domain with a
        single cross-lane reduction at the end."""
        unsat, total = [], None
        for r in range(n_rows):
            acc = None
            for c, s in edges[r]:
                h = _roll(hs[c], -s)
                acc = h if acc is None else acc ^ h
            unsat.append(acc)
            total = acc if total is None else total + acc
        return unsat, total.sum(axis=1, keepdims=True)

    def lut_pack(lut_ref, it):
        """Pack LUT row `it` into int32 scalars: one nibble-packed word
        (lut4: 8 entries x 4 bits) or two byte-packed words.  Scalar
        SMEM work, done once per iteration outside the edge loop."""
        if lut4:
            w = jnp.int32(0)
            for k in range(8):
                w = w | ((lut_ref[it, k] & 0xF) << (4 * k))
            return (w,)
        lo = jnp.int32(0)
        hi = jnp.int32(0)
        for k in range(4):
            lo = lo | ((lut_ref[it, k] & 0xFF) << (8 * k))
            hi = hi | ((lut_ref[it, k + 4] & 0xFF) << (8 * k))
        return lo, hi

    def lut_mag_packed(packed, idx):
        """row[idx] for idx in [0, 7] via variable shifts of the packed
        row (the TPU analogue of the reference's 8 masked selects,
        CDecoder_FAID.cpp:710-781).  Nibble path: shift + mask only
        (entries are unsigned < 16); byte path: hi/lo select +
        sign-extend."""
        if lut4:
            (w,) = packed
            return jax.lax.shift_right_logical(w, idx << 2) & 0xF
        lo, hi = packed
        sh = (idx & 3) << 3
        word = jnp.where(idx < 4, lo, hi)
        v = jax.lax.shift_right_logical(word, sh) & 0xFF
        return (v ^ 0x80) - 0x80  # sign-extend int8 -> int32

    def row_update(en_ref, msgs_ref, lut_packed, it, r, active, l_checksum,
                   l_m_err, in_floor, unsat_rows=None, era_ref=None):
        deg = len(edges[r])
        odd = bool(deg & 1)
        lo = int(entry_offsets[r])

        # ---- pass 1 ----------------------------------------------------
        vns, vcs = [], []
        for e, (c, s) in enumerate(edges[r]):
            vn = _roll(en_ref[c], -s)
            vc = jnp.maximum(sat8(vn - msgs_ref[lo + e].astype(jnp.int32)),
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
                        _roll(unsat_rows[rp], sp)
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
            n_words = len(lut_packed) // 2
            pk_m, pk_e = lut_packed[:n_words], lut_packed[n_words:]
            if use_ef:
                # Per-CN LUT swap: select the packed row once per block
                # row, not per edge.
                eff = (l_checksum != 0) & l_m_err & in_floor
                pk = tuple(jnp.where(eff, we, wm)
                           for wm, we in zip(pk_m, pk_e))
            else:
                pk = pk_m
            mags = []
            for e in range(deg):
                idx = jnp.minimum(jnp.abs(vcs[e]), 7)
                mags.append(lut_mag_packed(pk, idx))
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
            cste_1 = jnp.minimum(sat8((min2 * f2) >> 5), SAT_POS_MSG)
            cste_2 = jnp.minimum(sat8((min1 * f1) >> 5), SAT_POS_MSG)
        elif style == "faid" or not selective:
            cste_1 = jnp.minimum(min2 - off, SAT_POS_MSG)
            cste_2 = jnp.minimum(min1 - off, SAT_POS_MSG)
        else:
            eff = (l_checksum != 0) & l_m_err & in_floor

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
                jnp.maximum(sat8(vcs[e] + new_msg), SAT_NEG_VAR),
                SAT_POS_VAR)
            if active is None:
                # group mode: the whole tile updates while any frame in
                # it is dirty (gated once by pl.when in the caller).
                msgs_ref[lo + e] = new_msg.astype(jnp.int8)
                en_ref[c] = _roll(en_new, s)
            else:
                msgs_ref[lo + e] = jnp.where(
                    active, new_msg, msgs_ref[lo + e].astype(jnp.int32)
                ).astype(jnp.int8)
                en_ref[c] = jnp.where(active, _roll(en_new, s), en_ref[c])

    # ---- fused BF post-processor (static / DTBF / 2B1C) ----------------
    b = dcfg.bf
    two_bit = b.kind == "dtbf2b1c"
    c_blocks = code.n_var // z
    eligible_cols = [c for c in range(c_blocks)
                     if len(col_edges.get(c, ())) == b.gamma]

    def col_votes(unsat32, c):
        return functools.reduce(jnp.add, [
            _roll(unsat32[rp], sp) for rp, sp in col_edges[c]])

    def bf_tail(en32, hard, hard_ch, hard2, st_refs, go_ref, go_init):
        """Runs after MP; leaves bf_rounds in st_refs[4] ([BT, 1] int32).
        Semantics are identical to decoders/bf.py (syndrome at round
        top, per-frame freeze, dynamic-threshold machine; reference
        CDecoder_FAID.cpp:6782-6816, CDecoder_OMSBF.cpp:2969-3510).
        The rounds run as a scalar-gated fori over scratch-ref state,
        NOT a while_loop: a dynamic trip count serializes the Mosaic
        kernel pipeline (1.75 ms measured for a ~1-round tail), while
        pl.when on an SMEM flag skips the dead rounds for real."""
        th_ref, l0_ref, l1_ref, t_ref, rounds_ref = st_refs
        for c in range(c_blocks):
            hard[c] = (en32[c] > 0).astype(jnp.int8)
        hard_ch[...] = hard[...]
        if two_bit:
            thr = b.reliability_threshold
            for c in range(c_blocks):
                hard2[c] = ((en32[c] >= thr) | (en32[c] <= -thr)
                            ).astype(jnp.int8)
        z1 = jnp.zeros((bt, 1), jnp.int32)
        th_ref[...] = z1 + b.gamma
        l0_ref[...] = z1
        l1_ref[...] = z1
        t_ref[...] = z1 + 1
        rounds_ref[...] = z1
        # When the MP loop early-stopped (alive == 0), every frame's
        # syndrome is already clean, so BF round 1 is provably a no-op
        # (dirty == 0: no flips, no state change, rounds += 0) - skip
        # even its syndrome sweep.  alive == 1 covers both "some frame
        # dirty" and "ran to max_iter with unknown final state".
        go_ref[0] = go_init

        def body():
            Th, l0, l1 = th_ref[...], l0_ref[...], l1_ref[...]
            t = t_ref[...] != 0
            unsat32, count = syndrome_sweep(
                {c: hard[c].astype(jnp.int32) for c in used_cols})
            if group:
                # reference semantics: only the break is global - every
                # lane keeps flipping (and its threshold machine keeps
                # running) while any lane in the 32-frame word is dirty
                # (CDecoder_FAID.cpp:6782-7086).  count >= 0, so adding
                # the tile total makes dirty the splat of `any dirty`.
                dirty = (count + jnp.sum(count)) > 0    # [BT, 1]
            else:
                dirty = count > 0                       # [BT, 1]
            rounds_ref[...] = rounds_ref[...] + dirty.astype(jnp.int32)

            if b.kind == "static":
                # flip every VN with votes >= min(max_vote, cap)
                votes = {c: col_votes(unsat32, c) for c in range(c_blocks)}
                max_vote = functools.reduce(
                    jnp.maximum,
                    [v.max(axis=1, keepdims=True) for v in votes.values()])
                max_vote = jnp.maximum(max_vote, 1)
                thresh = jnp.minimum(max_vote, b.static_vote_cap)
                for c in range(c_blocks):
                    flip = (votes[c] >= thresh) & dirty
                    hard[c] = jnp.where(
                        flip, 1 - hard[c].astype(jnp.int32),
                        hard[c].astype(jnp.int32)).astype(jnp.int8)
                Th_n, l0_n, l1_n = Th, l0, l1
                t_n = t.astype(jnp.int32)
            else:
                # DTBF threshold machine (decoders/bf.py:_dtbf_threshold)
                Th2 = jnp.where(t, Th, Th - b.delta)
                max_th = t & (l0 < b.l0)
                Th2 = jnp.where(max_th, b.gamma + b.alpha, Th2)
                l0_u = l0 + max_th.astype(jnp.int32)
                submax = t & ~max_th & (l1 < b.l1)
                Th2 = jnp.where(submax, b.gamma + b.alpha - b.delta, Th2)
                l1_u = l1 + submax.astype(jnp.int32)
                ssub = t & ~max_th & ~submax
                Th2 = jnp.where(ssub, b.gamma + b.alpha - 2 * b.delta, Th2)
                Th2 = jnp.maximum(Th2, 1)

                any_flip = jnp.zeros((bt, 1), jnp.bool_) & dirty
                big = Th2 >= b.gamma                    # [BT, 1] (2B1C)
                for c in eligible_cols:
                    votes_c = col_votes(unsat32, c)
                    # int8 vector cmp is unsupported by Mosaic (and it
                    # folds widened compares back to i8); bits are 0/1,
                    # so |a-b| is the disagreement without any compare.
                    disagree = jnp.abs(hard[c].astype(jnp.int32)
                                       - hard_ch[c].astype(jnp.int32))
                    score = votes_c + b.alpha * disagree
                    flip = (score >= Th2) & dirty
                    any_flip = any_flip | flip.any(axis=1, keepdims=True)
                    h32 = hard[c].astype(jnp.int32)
                    if two_bit:
                        h2 = hard2[c].astype(jnp.int32)
                        do_flip = flip & (big | (h2 == 0))
                        demote = flip & ~big & (h2 == 1)
                        hard[c] = jnp.where(do_flip, 1 - h32, h32
                                            ).astype(jnp.int8)
                        h2n = jnp.where(flip & big, 1 - h2, h2)
                        h2n = jnp.where(demote, 0, h2n)
                        hard2[c] = h2n.astype(jnp.int8)
                    else:
                        hard[c] = jnp.where(flip, 1 - h32, h32
                                            ).astype(jnp.int8)
                # frozen (clean) frames keep their machine state.
                # Selects stay in int32: Mosaic cannot lower select_n
                # over (32,1) i1 vectors (i8->i1 truncation unsupported).
                Th_n = jnp.where(dirty, Th2, Th)
                l0_n = jnp.where(dirty, l0_u, l0)
                l1_n = jnp.where(dirty, l1_u, l1)
                t_n = jnp.where(dirty, any_flip.astype(jnp.int32),
                                t.astype(jnp.int32))
            th_ref[...] = Th_n
            l0_ref[...] = l0_n
            l1_ref[...] = l1_n
            t_ref[...] = t_n.astype(jnp.int32)
            go_ref[0] = jnp.any(dirty).astype(jnp.int32)

        jax.lax.fori_loop(
            0, b.max_iter,
            lambda i, _: (pl.when(go_ref[0] != 0)(body), 0)[1], 0)

    n_info_blocks = code.n_info // z
    fuse_channel = chan is not None

    def kernel(*args):
        # Argument layout: [lut, lut_ef]? , (chparams, cw?) | (llr, ref?),
        # <outputs>, <scratches>.  Outputs: stats -> (err_out, iters_out
        # [, bf_out][, modbits_out, modsyms_out]); fused ->
        # (hard_out, iters_out, bf_out); else (en_out, iters_out).
        # Scratches: msgs, en32, era?, hard?, hard_ch?, hard2? in that
        # order (see make_*_decoder).
        args = list(args)
        lut_refs = None
        if style == "faid":
            lut_refs = (args.pop(0), args.pop(0))
        llr_ref = ch_ref = cw_ref = ref_ref = None
        if fuse_channel:
            ch_ref = args.pop(0)
            if not fake_ref:
                cw_ref = args.pop(0)
        else:
            llr_ref = args.pop(0)
            if fuse_stats and not fake_ref:
                ref_ref = args.pop(0)
        if fuse_stats:
            err_out = args.pop(0)
            iters_out = args.pop(0)
            bf_out = args.pop(0) if fuse_bf else None
            if fuse_channel:
                modbits_out = args.pop(0)
                modsyms_out = args.pop(0)
        elif fuse_bf:
            hard_out = args.pop(0)
            iters_out = args.pop(0)
            bf_out = args.pop(0)
        else:
            en_out = args.pop(0)
            iters_out = args.pop(0)
        msgs_ref = args.pop(0)
        en32 = args.pop(0)
        era_ref = args.pop(0) if use_ef2 else None
        hard_scr = hard_ch_scr = hard2_scr = None
        if fuse_bf:
            hard_scr = args.pop(0)
            hard_ch_scr = args.pop(0)
            if two_bit:
                hard2_scr = args.pop(0)
        alive_ref = args.pop(0) if stop_early else None
        bf_st = bf_go = None
        if fuse_bf:
            bf_st = tuple(args.pop(0) for _ in range(5))
            bf_go = args.pop(0)
        assert not args, len(args)

        # Working state lives in VMEM as int32 for the whole decode -
        # `en` is read three times per edge per iteration, and keeping it
        # widened avoids an int8<->int32 relayout at every access.
        if fuse_channel:
            # Fused quantile channel prologue: one hardware-PRNG draw
            # per bit, staircase-evaluated straight into the int32
            # working state (LLR ingest incl. the punctured-tail zeroing,
            # reference CLDPC.cpp:270-272) - column by column so the
            # live staircase temporaries stay [BT, Z]-sized.  Draw order
            # (seed, then blocks 0..C-1 of this batch tile) is the
            # replayable stream contract shared with the emit kernel
            # (build_fused_sim_emit).
            from . import pallas_channel as pc

            mod_type, quant_bits = chan
            nparam = 2 * max(abs(v) for v in
                             pc._QUANT_LIMITS[quant_bits]) + 1
            pid = pl.program_id(0)
            pltpu.prng_seed(ch_ref[nparam],
                            ch_ref[nparam + 1] + pid * jnp.int32(pc._KNUTH))
            tail_start = code.n_var - code.puncture_tail
            lane = jax.lax.broadcasted_iota(jnp.int32, (bt, z), 1)
            even = ((lane & 1) == 0).astype(jnp.int32)
            mb = jnp.zeros((bt, 1), jnp.int32)
            ms = jnp.zeros((bt, 1), jnp.int32)
            for c in range(c_blocks):
                ix = pltpu.bitcast(pltpu.prng_random_bits((bt, z)),
                                   jnp.int32)
                if cw_ref is None:
                    mask = jnp.zeros((bt, z), jnp.int32)
                else:
                    mask = -(cw_ref[c] != 0).astype(jnp.int32)
                q8, cherr = pc.staircase(ix, mask, ch_ref, quant_bits)
                qe = q8.astype(jnp.int32)
                if c * z >= tail_start:
                    qe = jnp.zeros((bt, z), jnp.int32)
                elif (c + 1) * z > tail_start:
                    qe = jnp.where(lane + c * z >= tail_start, 0, qe)
                en32[c] = qe
                if c < n_info_blocks:
                    e = cherr.astype(jnp.int32)
                    mb = mb + e.sum(axis=1, keepdims=True)
                    if mod_type == 2:
                        # symbol = adjacent (even, odd) lane pair; the
                        # wrap read at lane Z-1 lands on an odd lane and
                        # is masked (cf. pallas_channel.mod_stats_tile).
                        nxt = pltpu.roll(e, shift=z - 1, axis=1)
                        ms = ms + ((e | nxt) * even).sum(
                            axis=1, keepdims=True)
            modbits_out[...] = mb
            modsyms_out[...] = mb if mod_type != 2 else ms
        else:
            en32[...] = llr_ref[...].astype(jnp.int32)
        msgs_ref[...] = jnp.zeros(msgs_ref.shape, msgs_ref.dtype)
        iters_out[...] = jnp.zeros(iters_out.shape, iters_out.dtype)

        def iteration_body(it):
            """One MP iteration; returns True while any frame is dirty."""
            if stop_early:
                unsat_rows, count = syndrome_sweep(
                    {c: (en32[c] > 0).astype(jnp.int32)
                     for c in used_cols})                   # [BT, 1]
                any_active = jnp.any(count > 0)
                # group mode: no per-frame freeze - pl.when(any_active)
                # is the reference's whole-SIMD-word break.
                active = None if group else (count > 0)
                l_m_err = count < dcfg.floor_err_count
            else:
                unsat_rows = [None] * n_rows
                active = None      # no early stop: every frame updates
                l_m_err = jnp.zeros((bt, 1), jnp.bool_)
                any_active = jnp.bool_(True)

            remaining = max_iter - 1 - it
            in_floor = remaining <= dcfg.floor_iter_thresh

            if style == "faid":
                lut_ref, lut_ef_ref = lut_refs
                lut_packed = lut_pack(lut_ref, it) + lut_pack(lut_ef_ref, it)
            else:
                lut_packed = None

            @pl.when(any_active)
            def _():
                if use_ef2:
                    # erase flags reset at the top of every iteration
                    # (reference CDecoder_FAID.cpp:624-628)
                    era_ref[...] = jnp.zeros(era_ref.shape, era_ref.dtype)
                for r in range(n_rows):
                    row_update(en32, msgs_ref, lut_packed, it, r, active,
                               unsat_rows[r], l_m_err, in_floor,
                               unsat_rows=unsat_rows, era_ref=era_ref)
                # frame mode counts frames that were dirty at the top;
                # group mode counts the whole tile while it is dirty
                # (the same granularity the XLA path's group_any uses).
                iters_out[...] = iters_out[...] + (
                    1 if active is None else active.astype(jnp.int32))

            return any_active

        # Early stop also runs as a FORI loop, not a while_loop: a
        # dynamic trip count serializes Mosaic's kernel pipeline
        # (frame-mode decode measured 13% faster as a gated fori).
        # Iterations after every frame in the tile was clean are
        # skipped for real by the scalar `alive` flag (pl.when on an
        # SMEM scalar is a branch, not masking), which reproduces the
        # while_loop's early exit bit-for-bit - updates and iteration
        # counters are already predicated per iteration.
        if stop_early:
            alive_ref[0] = 1

            def gated_iteration(it):
                @pl.when(alive_ref[0] != 0)
                def _():
                    alive_ref[0] = iteration_body(it).astype(jnp.int32)

            jax.lax.fori_loop(0, max_iter,
                              lambda it, _: (gated_iteration(it), 0)[1], 0)
        else:
            jax.lax.fori_loop(0, max_iter,
                              lambda it, _: (iteration_body(it), 0)[1], 0)
        if fuse_bf:
            bf_tail(en32, hard_scr, hard_ch_scr, hard2_scr, bf_st, bf_go,
                    alive_ref[0] if stop_early else jnp.int32(1))
            bf_out[...] = bf_st[4][...]
        if fuse_stats:
            # Per-frame info-bit error count (CalculateErrors' core
            # reduction, reference CLDPC.cpp:4819-4995) computed in VMEM:
            # the hard decisions never reach HBM.  Info bits are exactly
            # the first n_info/Z block columns (14592 = 57*256); the
            # expected word is all-zero (FakeEncoder) or the ref input.
            err = None
            for c in range(n_info_blocks):
                h = (hard_scr[c].astype(jnp.int32) if fuse_bf
                     else (en32[c] > 0).astype(jnp.int32))
                if ref_ref is not None:
                    h = h ^ ref_ref[c].astype(jnp.int32)
                elif cw_ref is not None:
                    h = h ^ cw_ref[c].astype(jnp.int32)
                err = h if err is None else err + h
            err_out[...] = err.sum(axis=1, keepdims=True)
        elif fuse_bf:
            for c in range(c_blocks):
                hard_out[c] = hard_scr[c]
        else:
            en_out[...] = en32[...].astype(jnp.int8)

    return kernel


@functools.lru_cache(maxsize=32)
def make_mp_decoder(code: QCCode, dcfg: DecoderConfig, bt: int = 32,
                    interpret: bool = False):
    """Returns mp(llr_cbz [C, B, Z] int8) -> (en [C, B, Z] int8,
    mp_iters [B] int32); B must be a multiple of bt."""
    if not supports(dcfg):
        raise ValueError("config not supported by the fused kernel")
    if dcfg.stop_mode == "group" and bt != 32:
        raise ValueError(
            f"group mode requires bt == 32 (the reference SIMD word); "
            f"got bt={bt}")
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
            scratch_shapes=_scratch_shapes(code, dcfg, bt, fuse_bf=False),
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(*lut_args, llr_cbz)
        return en, iters.reshape(b)

    return mp


@functools.lru_cache(maxsize=32)
def make_full_decoder(code: QCCode, dcfg: DecoderConfig, bt: int = 32,
                      interpret: bool = False):
    """Fully-fused decoder: MP iterations + BF post-processor in ONE
    kernel; returns full(llr_cbz [C, B, Z] int8) ->
    (hard [C, B, Z] int8, mp_iters [B] int32, bf_rounds [B] int32).
    Requires dcfg.bf.kind != 'none' (use make_mp_decoder otherwise)."""
    if dcfg.bf.kind == "none":
        raise ValueError("no BF post-processor in this config")
    if not supports(dcfg):
        raise ValueError("config not supported by the fused kernel")
    if dcfg.stop_mode == "group" and bt != 32:
        raise ValueError(
            f"group mode requires bt == 32 (the reference SIMD word); "
            f"got bt={bt}")
    style = _style_for(dcfg)
    c_blocks = code.n_block_cols
    z = code.z
    n_entries = int(code.degrees_np.sum())
    use_ef2 = style == "faid" and dcfg.ef_elimination == 2
    two_bit = dcfg.bf.kind == "dtbf2b1c"
    kernel = _make_kernel(code, dcfg, bt, fuse_bf=True)

    lut_args = ()
    num_lut = 0
    if style == "faid":
        lut = np.asarray(
            luts.table_for(dcfg.lut_family, dcfg.max_iter), np.int32)
        lut_ef = np.asarray(luts.ef_table(dcfg.max_iter), np.int32)
        lut_args = (lut, lut_ef)
        num_lut = 2

    scratch = _scratch_shapes(code, dcfg, bt, fuse_bf=True)

    def full(llr_cbz: jax.Array):
        b = llr_cbz.shape[1]
        assert b % bt == 0, (b, bt)
        try:
            vma = jax.typeof(llr_cbz).vma or None
        except Exception:
            vma = None
        vkw = {"vma": vma} if vma else {}
        hard, iters, bf = pl.pallas_call(
            kernel,
            grid=(b // bt,),
            in_specs=(
                [pl.BlockSpec(memory_space=pltpu.SMEM)] * num_lut
                + [pl.BlockSpec((c_blocks, bt, z), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)]),
            out_specs=(
                pl.BlockSpec((c_blocks, bt, z), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((c_blocks, b, z), jnp.int8, **vkw),
                jax.ShapeDtypeStruct((b, 1), jnp.int32, **vkw),
                jax.ShapeDtypeStruct((b, 1), jnp.int32, **vkw),
            ),
            scratch_shapes=scratch,
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(*lut_args, llr_cbz)
        return hard, iters.reshape(b), bf.reshape(b)

    return full


def supports_stats(code: QCCode, dcfg: DecoderConfig) -> bool:
    """Gate for the stats-fused kernel: additionally requires the info
    bits to tile exactly into block columns (50G-PON: 14592 = 57*256),
    so the in-VMEM error reduction can sum whole [BT, Z] tiles."""
    return supports(dcfg) and code.n_info % code.z == 0


@functools.lru_cache(maxsize=32)
def make_stats_decoder(code: QCCode, dcfg: DecoderConfig, bt: int = 32,
                       interpret: bool = False, fake_ref: bool = True):
    """Decoder with the per-frame error reduction fused into the SAME
    kernel: MP iterations (+ BF when configured) + info-bit error count,
    all without the hard decisions ever reaching HBM.

    Returns stats(llr_cbz [C, B, Z] int8[, ref_cbz [Ci, B, Z] int8]) ->
    (err_bits [B, 1] int32, mp_iters [B, 1] int32,
     bf_rounds [B, 1] int32 | None).  ``ref_cbz`` (only when
    ``fake_ref=False``) holds the expected hard bits of the first
    n_info/Z block columns; with ``fake_ref=True`` the expected word is
    all-zero (reference FakeEncoder, CLDPC.cpp:163)."""
    if not supports_stats(code, dcfg):
        raise ValueError("config not supported by the stats-fused kernel")
    if dcfg.stop_mode == "group" and bt != 32:
        raise ValueError(
            f"group mode requires bt == 32 (the reference SIMD word); "
            f"got bt={bt}")
    style = _style_for(dcfg)
    c_blocks = code.n_block_cols
    z = code.z
    n_entries = int(code.degrees_np.sum())
    n_info_blocks = code.n_info // z
    use_ef2 = style == "faid" and dcfg.ef_elimination == 2
    fuse_bf = dcfg.bf.kind != "none"
    two_bit = dcfg.bf.kind == "dtbf2b1c"
    kernel = _make_kernel(code, dcfg, bt, fuse_bf=fuse_bf,
                          fuse_stats=True, fake_ref=fake_ref)

    lut_args = ()
    num_lut = 0
    if style == "faid":
        lut = np.asarray(
            luts.table_for(dcfg.lut_family, dcfg.max_iter), np.int32)
        lut_ef = np.asarray(luts.ef_table(dcfg.max_iter), np.int32)
        lut_args = (lut, lut_ef)
        num_lut = 2

    scratch = _scratch_shapes(code, dcfg, bt, fuse_bf=fuse_bf)

    def stats(llr_cbz: jax.Array, ref_cbz: jax.Array | None = None):
        b = llr_cbz.shape[1]
        assert b % bt == 0, (b, bt)
        assert (ref_cbz is None) == fake_ref
        try:
            vma = jax.typeof(llr_cbz).vma or None
        except Exception:
            vma = None
        vkw = {"vma": vma} if vma else {}
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * num_lut
            + [pl.BlockSpec((c_blocks, bt, z), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)]
            + ([pl.BlockSpec((n_info_blocks, bt, z), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)]
               if not fake_ref else []))
        n_out = 3 if fuse_bf else 2
        out = pl.pallas_call(
            kernel,
            grid=(b // bt,),
            in_specs=in_specs,
            out_specs=tuple(
                pl.BlockSpec((bt, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_out)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((b, 1), jnp.int32, **vkw)
                for _ in range(n_out)),
            scratch_shapes=scratch,
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(*lut_args, llr_cbz,
          *(() if fake_ref else (ref_cbz,)))
        if fuse_bf:
            return out
        return out[0], out[1], None

    return stats


def supports_sim(code: QCCode, cfg) -> bool:
    """Gate for the fully-fused sim kernel (channel + decode + stats in
    ONE pallas_call): quantile channel coverage (BPSK/QPSK, 2-6 bit
    quantizers - the interleave pair is transparent at one bit per LLR)
    on top of the stats-fused decode requirements."""
    dcfg = cfg.decoder()
    return (supports_stats(code, dcfg)
            and cfg.mod_type in (1, 2)
            # The fused QPSK symbol-error reduction pairs (even, odd)
            # lanes within a block column and masks the wrap read at
            # lane Z-1, which requires an even Z.
            and (cfg.mod_type != 2 or code.z % 2 == 0)
            # 6-bit = the NB_BITS_VARIABLES=6 round-half-even ingest
            # (CLDPC.cpp:4385-4463); same staircase with half-integer
            # offsets (ops/pallas_channel._step_offsets).
            and cfg.quant_bits in (2, 3, 4, 5, 6)
            and cfg.batch_per_device % 32 == 0)


@functools.lru_cache(maxsize=16)
def build_fused_sim(code: QCCode, cfg, interpret: bool = False):
    """One kernel per Monte-Carlo round: hardware-PRNG noise draw ->
    quantile-staircase channel -> LLR ingest -> MP decode -> BF
    post-processor -> error + ModCalErr reduction, entirely in VMEM.
    The only HBM traffic is the codeword input (absent with
    fake_encode) and five [batch] counter vectors out.

    Returns sim(cw [batch, n_var] int8 | None, key, sigma) ->
    dict(err_bits, mp_iters, bf_rounds, mod_error_bits,
    mod_error_symbols), each int32 [batch].

    The PRNG stream is a pure function of (key, batch-tile index) with
    the same seeding scheme as ops/pallas_channel.py; the emit variant
    (build_fused_sim_emit) replays the identical stream for forensics."""
    from . import pallas_channel as pc

    if not supports_sim(code, cfg):
        raise ValueError("config not supported by the fused sim kernel")
    if interpret is True:
        # The HLO interpreter cannot emulate pltpu.prng_seed; route
        # interpret runs through the Mosaic-TPU interpreter instead
        # (same convention as tests/test_pallas_channel.py).
        interpret = pltpu.InterpretParams()
    dcfg = cfg.decoder()
    bt = 32     # == the group-mode SIMD word; grid tiles are [C, 32, Z]
    style = _style_for(dcfg)
    c_blocks = code.n_block_cols
    z = code.z
    n_entries = int(code.degrees_np.sum())
    use_ef2 = style == "faid" and dcfg.ef_elimination == 2
    two_bit = dcfg.bf.kind == "dtbf2b1c"
    fuse_bf = dcfg.bf.kind != "none"
    fake = bool(cfg.fake_encode)
    kernel = _make_kernel(code, dcfg, bt, fuse_bf=fuse_bf, fuse_stats=True,
                          fake_ref=fake,
                          chan=(cfg.mod_type, cfg.quant_bits))

    lut_args = ()
    num_lut = 0
    if style == "faid":
        lut = np.asarray(
            luts.table_for(dcfg.lut_family, dcfg.max_iter), np.int32)
        lut_ef = np.asarray(luts.ef_table(dcfg.max_iter), np.int32)
        lut_args = (lut, lut_ef)
        num_lut = 2

    scratch = _scratch_shapes(code, dcfg, bt, fuse_bf=fuse_bf)

    batch = cfg.batch_per_device
    n_out = (3 if fuse_bf else 2) + 2      # err, iters[, bf], mod x2

    def sim(cw, key, sigma):
        assert (cw is None) == fake
        params = jnp.concatenate([pc._threshold_ints(cfg, sigma),
                                  pc._key_seeds(key)])
        cw_args = ()
        if not fake:
            cw_cbz = jnp.transpose(
                cw.reshape(batch, c_blocks, z), (1, 0, 2))
            cw_args = (cw_cbz,)
        try:
            vma = jax.typeof(params).vma or None
            if not fake:
                vma = (vma or frozenset()) | jax.typeof(cw_args[0]).vma
                vma = vma or None
        except Exception:
            vma = None
        vkw = {"vma": vma} if vma else {}
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * num_lut
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + ([pl.BlockSpec((c_blocks, bt, z), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)] if not fake else []))
        outs = pl.pallas_call(
            kernel,
            grid=(batch // bt,),
            in_specs=in_specs,
            out_specs=tuple(
                pl.BlockSpec((bt, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_out)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((batch, 1), jnp.int32, **vkw)
                for _ in range(n_out)),
            scratch_shapes=scratch,
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(*lut_args, params, *cw_args)
        outs = [o.reshape(batch) for o in outs]
        if fuse_bf:
            err, iters, bf, modbits, modsyms = outs
        else:
            err, iters, modbits, modsyms = outs
            bf = err * 0
        return {"err_bits": err, "mp_iters": iters, "bf_rounds": bf,
                "mod_error_bits": modbits, "mod_error_symbols": modsyms}

    return sim


@functools.lru_cache(maxsize=16)
def build_fused_sim_emit(code: QCCode, cfg, interpret: bool = False):
    """Forensic/validation twin of build_fused_sim: SAME PRNG stream,
    same staircase, but emits the channel outputs instead of decoding -
    emit(cw | None, key, sigma) -> (llr int8 [batch, n_var] pre-ingest,
    mod_err int8 [batch, n_var]).  decode(ingest(llr)) of this output is
    bit-identical to what build_fused_sim decoded (tied by
    tests/test_sim_fused.py), which is what makes exact replay of failing
    frames possible without instrumenting the hot path."""
    from . import pallas_channel as pc

    if not supports_sim(code, cfg):
        raise ValueError("config not supported by the fused sim kernel")
    if interpret is True:
        interpret = pltpu.InterpretParams()
    bt = 32
    c_blocks = code.n_block_cols
    z = code.z
    fake = bool(cfg.fake_encode)
    quant_bits = cfg.quant_bits
    nparam = 2 * max(abs(v) for v in pc._QUANT_LIMITS[quant_bits]) + 1
    batch = cfg.batch_per_device

    def ekernel(*args):
        args = list(args)
        ch_ref = args.pop(0)
        cw_ref = None if fake else args.pop(0)
        llr_out = args.pop(0)
        err_out = args.pop(0)
        pid = pl.program_id(0)
        pltpu.prng_seed(ch_ref[nparam],
                        ch_ref[nparam + 1] + pid * jnp.int32(pc._KNUTH))
        for c in range(c_blocks):
            ix = pltpu.bitcast(pltpu.prng_random_bits((bt, z)), jnp.int32)
            if cw_ref is None:
                mask = jnp.zeros((bt, z), jnp.int32)
            else:
                mask = -(cw_ref[c] != 0).astype(jnp.int32)
            q8, cherr = pc.staircase(ix, mask, ch_ref, quant_bits)
            llr_out[c] = q8
            err_out[c] = cherr

    def emit(cw, key, sigma):
        assert (cw is None) == fake
        params = jnp.concatenate([pc._threshold_ints(cfg, sigma),
                                  pc._key_seeds(key)])
        cw_args = ()
        if not fake:
            cw_cbz = jnp.transpose(
                cw.reshape(batch, c_blocks, z), (1, 0, 2))
            cw_args = (cw_cbz,)
        try:
            vma = jax.typeof(params).vma or None
            if cw_args:  # mirror build_fused_sim: a device-varying cw
                vma = (vma or frozenset()) | jax.typeof(cw_args[0]).vma
                vma = vma or None
        except Exception:
            vma = None
        vkw = {"vma": vma} if vma else {}
        llr, err = pl.pallas_call(
            ekernel,
            grid=(batch // bt,),
            in_specs=(
                [pl.BlockSpec(memory_space=pltpu.SMEM)]
                + ([pl.BlockSpec((c_blocks, bt, z), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)]
                   if not fake else [])),
            out_specs=(
                pl.BlockSpec((c_blocks, bt, z), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_blocks, bt, z), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((c_blocks, batch, z), jnp.int8, **vkw),
                jax.ShapeDtypeStruct((c_blocks, batch, z), jnp.int8, **vkw),
            ),
            interpret=interpret,
        )(params, *cw_args)
        to_bn = lambda x: jnp.transpose(x, (1, 0, 2)).reshape(
            batch, c_blocks * z)
        return to_bn(llr), to_bn(err)

    return emit


def decode_stats_pallas(llr_blocks: jax.Array, code: QCCode,
                        dcfg: DecoderConfig,
                        ref_blocks: jax.Array | None = None,
                        bt: int = 32, interpret: bool = False):
    """llr_blocks [B, C, Z] int8 (ingested), ref_blocks [B, Ci, Z] int8
    expected info bits or None (all-zero codeword) ->
    (err_bits [B] int32, mp_iters [B], bf_rounds [B])."""
    stats = make_stats_decoder(code, dcfg, bt=bt, interpret=interpret,
                               fake_ref=ref_blocks is None)
    args = (jnp.transpose(llr_blocks, (1, 0, 2)),)
    if ref_blocks is not None:
        args += (jnp.transpose(ref_blocks, (1, 0, 2)),)
    err, iters, bf = stats(*args)
    b = llr_blocks.shape[0]
    if bf is None:
        bf = err * 0      # derives err's varying-axes type (utils/vma.py)
    return err.reshape(b), iters.reshape(b), bf.reshape(b)


def decode_full_pallas(llr_blocks: jax.Array, code: QCCode,
                       dcfg: DecoderConfig, bt: int = 32,
                       interpret: bool = False):
    """llr_blocks [B, C, Z] int8 (ingested) -> (hard [B, n_var] bool,
    mp_iters [B], bf_rounds [B]) with MP + BF fused in one kernel."""
    full = make_full_decoder(code, dcfg, bt=bt, interpret=interpret)
    hard, iters, bf = full(jnp.transpose(llr_blocks, (1, 0, 2)))
    hard = jnp.transpose(hard, (1, 0, 2)).reshape(
        llr_blocks.shape[0], code.n_var).astype(jnp.bool_)
    return hard, iters, bf


def decode_mp_pallas(llr_blocks: jax.Array, code: QCCode,
                     dcfg: DecoderConfig, bt: int = 32,
                     interpret: bool = False):
    """llr_blocks [B, C, Z] int8 (already ingested: tail zeroed) ->
    (en [B, C, Z] int8, mp_iters [B] int32)."""
    mp = make_mp_decoder(code, dcfg, bt=bt, interpret=interpret)
    llr_cbz = jnp.transpose(llr_blocks, (1, 0, 2))
    en, iters = mp(llr_cbz)
    return jnp.transpose(en, (1, 0, 2)), iters
