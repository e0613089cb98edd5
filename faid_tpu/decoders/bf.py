"""Bit-flipping post-processors: static BF, DTBF, and 2B1C-DTBF.

All three operate on hard decisions in the block layout
[batch, n_block_cols, Z] (bool) and run as a ``lax.while_loop`` whose
carry holds the per-frame threshold machine.  The reference runs one
machine per 32-frame SIMD group with per-lane masking
(CDecoder_FAID.cpp:6408-7110, CDecoder_OMSBF.cpp:2959-3510,
CDecoder_FAID_2B1C.cpp:6124-6820); here every frame is its own lane.

Semantics per round (DTBF, reference CDecoder_FAID.cpp:6782-6816):
  1. syndrome + flip votes from current hard bits; exit if clean
  2. threshold update:   Th -= delta           where not flipped last round
                         Th = gamma+alpha      where flipped and l0 < L0
                         Th = gamma+alpha-d    where flipped, l0>=L0, l1<L1
                         Th = gamma+alpha-2d   otherwise (if flipped)
                         Th = max(Th, 1)
  3. flip weight-gamma VNs with  votes + alpha*(hard != hard_ch) >= Th
  4. 2B1C variant: small jumps (Th < gamma) demote reliable bits instead
     of flipping them (CDecoder_FAID_2B1C.cpp:6801-6814)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..code.qc_matrix import QCCode
from ..config import BFConfig
from ..ops import syndrome as syn
from ..utils import vma


GROUP = 32  # the reference's SIMD word = 32 frames (CLDPC.h:21)


def group_any(active: jnp.ndarray) -> jnp.ndarray:
    """[batch] bool -> [batch] bool: OR over each consecutive 32-frame
    group (the reference early-stop granularity, CDecoder_OMS.cpp:325).

    Group semantics are *defined* on 32-frame SIMD words
    (CDecoder_OMS.cpp:325-327); a smaller batch would be neither frame
    nor reference semantics, so it is rejected rather than silently
    forming one undersized group."""
    b = active.shape[0]
    if b % GROUP:
        raise ValueError(
            f"stop_mode='group' is defined on {GROUP}-frame words "
            f"(reference CDecoder_OMS.cpp:325-327); batch must be a "
            f"multiple of {GROUP}, got {b}")
    return jnp.repeat(jnp.any(active.reshape(b // GROUP, GROUP), axis=1), GROUP)


def _weight_mask(code: QCCode, gamma: int) -> jnp.ndarray:
    """[C, Z] bool: VNs with column weight == gamma (flip-eligible)."""
    return jnp.asarray(code.vn_weight_blocks_np == gamma)


def run_static_bf(hard: jnp.ndarray, code: QCCode, cfg: BFConfig,
                  group: bool = False):
    """Static-threshold BF (reference CDecoder_OMSBF.cpp:2969-3510):
    flip every VN whose vote >= min(max_vote, cap).  Returns
    (hard, rounds_used[batch]).

    ``group=True`` reproduces the reference's batch-granularity early
    stop: no per-frame gating — every lane keeps being processed until
    the global break (all lanes clean).  The while_loop cond already
    guarantees some frame is dirty inside the body."""

    def cond(carry):
        i, hard, rounds = carry
        return (i < cfg.max_iter) & jnp.any(
            syn.error_count(syn.unsat_checks(hard, code)) > 0)

    def body(carry):
        i, hard, rounds = carry
        unsat = syn.unsat_checks(hard, code)
        count = syn.error_count(unsat)
        dirty = group_any(count > 0) if group else (count > 0)
        votes = syn.flip_votes(unsat, code)
        # max_vote starts at 1 (CDecoder_OMSBF.cpp:2975).
        max_vote = jnp.maximum(votes.max(axis=(1, 2)), 1)
        thresh = jnp.minimum(max_vote, cfg.static_vote_cap)[:, None, None]
        flip = (votes >= thresh) & dirty[:, None, None]
        hard = jnp.logical_xor(hard, flip)
        rounds = rounds + dirty.astype(jnp.int32)
        return i + 1, hard, rounds

    rounds0 = vma.batch_zeros(hard, jnp.int32)
    _, hard, rounds = jax.lax.while_loop(cond, body, (0, hard, rounds0))
    return hard, rounds


def _dtbf_threshold(Th, l0, l1, t, cfg: BFConfig):
    gamma, alpha, delta = cfg.gamma, cfg.alpha, cfg.delta
    Th = jnp.where(t, Th, Th - delta)
    max_th = t & (l0 < cfg.l0)
    Th = jnp.where(max_th, gamma + alpha, Th)
    l0 = l0 + max_th.astype(jnp.int32)
    submax = t & ~max_th & (l1 < cfg.l1)
    Th = jnp.where(submax, gamma + alpha - delta, Th)
    l1 = l1 + submax.astype(jnp.int32)
    ssubmax = t & ~max_th & ~submax
    Th = jnp.where(ssubmax, gamma + alpha - 2 * delta, Th)
    Th = jnp.maximum(Th, 1)
    return Th, l0, l1


def run_dtbf(hard: jnp.ndarray, code: QCCode, cfg: BFConfig,
             two_bit: bool = False, llr: jnp.ndarray | None = None,
             group: bool = False):
    """Dynamic-threshold BF; ``two_bit`` enables the 2B1C state machine
    (needs ``llr`` = post-MP LLRs to seed the reliability bit).
    Returns (hard, rounds_used[batch]).

    ``group=True``: reference batch-granularity semantics — the
    threshold machine and the flip sweep run on every lane each round
    until the global break (CDecoder_FAID.cpp:6782-7086 has no per-lane
    dirty gating; only the break is global)."""
    hard_ch = hard  # DTBF anchors on the post-MP hard decision
    eligible = _weight_mask(code, cfg.gamma)[None]

    if two_bit:
        thr = cfg.reliability_threshold
        hard2 = (llr >= thr) | (llr <= -thr)
    else:
        hard2 = hard & False  # zeros, but inherits hard's vma type

    z32 = vma.batch_zeros(hard, jnp.int32)
    Th0 = z32 + cfg.gamma
    l0 = z32
    l1 = z32
    t0 = z32 == 0
    rounds0 = z32

    def cond(carry):
        i, hard, hard2, Th, l0, l1, t, rounds = carry
        return (i < cfg.max_iter) & jnp.any(
            syn.error_count(syn.unsat_checks(hard, code)) > 0)

    def body(carry):
        i, hard, hard2, Th, l0, l1, t, rounds = carry
        unsat = syn.unsat_checks(hard, code)
        count = syn.error_count(unsat)
        dirty = group_any(count > 0) if group else (count > 0)
        votes = syn.flip_votes(unsat, code)
        # XLA's algebraic simplifier ping-pongs between its
        # concatenate-splitting and xor-cancellation rewrites when
        # ``hard`` reaches the flip mask both directly (the disagree
        # term below) and through the rolled syndrome/vote chain,
        # tripping the pass's circular-loop breaker on every compile of
        # this while body ("ran for 50 runs on computation region_*"
        # errors, MULTICHIP_r04.json tail).  Cutting the rewrite path at
        # ``votes`` - a tensor the loop materializes anyway - stops the
        # cycle; optimization_barrier is an identity, numerics untouched.
        votes = jax.lax.optimization_barrier(votes)

        Th2, l0n, l1n = _dtbf_threshold(Th, l0, l1, t, cfg)

        disagree = jnp.logical_xor(hard, hard_ch)
        score = votes + cfg.alpha * disagree.astype(jnp.int32)
        flip = eligible & (score >= Th2[:, None, None]) & dirty[:, None, None]

        if two_bit:
            big = (Th2 >= cfg.gamma)[:, None, None]
            xor3 = big & flip
            hard_n = jnp.logical_xor(hard, xor3)
            hard2_n = jnp.logical_xor(hard2, xor3)
            small = ~big & flip
            hard_n = jnp.logical_xor(hard_n, small & ~hard2_n)
            hard2_n = jnp.logical_xor(hard2_n, small & hard2_n)
        else:
            hard_n = jnp.logical_xor(hard, flip)
            hard2_n = hard2

        t_n = jnp.any(flip, axis=(1, 2))
        # Frozen (already clean) frames keep their state.
        keep = dirty
        hard_n = jnp.where(keep[:, None, None], hard_n, hard)
        hard2_n = jnp.where(keep[:, None, None], hard2_n, hard2)
        Th_n = jnp.where(keep, Th2, Th)
        l0_n = jnp.where(keep, l0n, l0)
        l1_n = jnp.where(keep, l1n, l1)
        t_n = jnp.where(keep, t_n, t)
        rounds = rounds + keep.astype(jnp.int32)
        return i + 1, hard_n, hard2_n, Th_n, l0_n, l1_n, t_n, rounds

    carry = (0, hard, hard2, Th0, l0, l1, t0, rounds0)
    _, hard, _, _, _, _, _, rounds = jax.lax.while_loop(cond, body, carry)
    return hard, rounds
