"""Syndrome / flip-vote sweeps in the QC block layout.

Reproduces the per-iteration early-stop sweep of the OMS/FAID decoders
(reference CDecoder_OMS.cpp:102-330) and the BF vote accumulation
(CDecoder_OMSBF.cpp:2969-3326): hard bit = (LLR > 0), CN unsatisfied iff
the XOR of its neighbors' hard bits is 1, per-frame error count, and
per-VN count of unsatisfied adjacent CNs.

All tensors are dense: ``hard`` is [batch, n_block_cols, Z] bool and each
block entry contributes one lane-roll, so there is no gather/scatter.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..code.qc_matrix import QCCode


def hard_decision(en: jnp.ndarray) -> jnp.ndarray:
    """bit = (LLR > 0); the reference's LOAD_AND_DECIDE convention
    (CTool.cpp:291, CDecoder_OMS.cpp:109)."""
    return en > 0


def unsat_checks(hard: jnp.ndarray, code: QCCode) -> jnp.ndarray:
    """[batch, n_block_rows, Z] bool - True where the CN is unsatisfied."""
    rows = []
    for r in range(code.n_block_rows):
        acc = None
        for e in range(code.degrees[r]):
            c = code.block_cols[r][e]
            s = code.shifts[r][e]
            contrib = jnp.roll(hard[:, c, :], -s, axis=-1)
            acc = contrib if acc is None else jnp.logical_xor(acc, contrib)
        rows.append(acc)
    return jnp.stack(rows, axis=1)


def error_count(unsat: jnp.ndarray) -> jnp.ndarray:
    """[batch] int32 - number of unsatisfied CNs per frame.

    The reference accumulates with saturating byte adds (epu8 cap 255 /
    epi8 cap 127) but only ever compares against thresholds below the
    caps, so the exact count is equivalent (CDecoder_OMS.cpp:325-331)."""
    return unsat.sum(axis=(1, 2)).astype(jnp.int32)


def flip_votes(unsat: jnp.ndarray, code: QCCode) -> jnp.ndarray:
    """[batch, n_block_cols, Z] int32 - per-VN count of unsatisfied
    adjacent CNs (reference flip_vote, CDecoder_FAID.cpp:287-309)."""
    batch = unsat.shape[0]
    votes = jnp.zeros((batch, code.n_block_cols, code.z), dtype=jnp.int32)
    for r in range(code.n_block_rows):
        u = unsat[:, r, :].astype(jnp.int32)
        for e in range(code.degrees[r]):
            c = code.block_cols[r][e]
            s = code.shifts[r][e]
            votes = votes.at[:, c, :].add(jnp.roll(u, s, axis=-1))
    return votes
