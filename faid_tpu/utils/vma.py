"""shard_map varying-type helpers.

Under ``jax.shard_map`` every array carries a "varying manual axes" (vma)
type; a ``lax.while_loop`` whose carry mixes freshly-created (replicated)
constants with body outputs derived from sharded inputs fails to typecheck.
Casting the constants with ``lax.pcast(..., to='varying')`` fixes the type
without any runtime work, and is a no-op outside shard_map.

(A previous revision derived the type arithmetically — ``ref[..., 0] * 0``
— which left ``x*0`` chains for the compiler to clean up in every sharded
loop body.  They were not the cause of the round-4 algebraic-simplifier
circular-loop warnings — that was the DTBF vote/flip graph, fixed with an
optimization_barrier in decoders/bf.py — but pcast is type-only, leaves
no arithmetic residue, and is the intended API.)"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pvary_like(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """``x`` cast to also carry ``ref``'s varying-manual-axes (vma) type."""
    axes = tuple(sorted(jax.typeof(ref).vma - jax.typeof(x).vma))
    if not axes:
        return x
    return jax.lax.pcast(x, axes, to="varying")


def batch_zeros(ref: jnp.ndarray, dtype=jnp.int32) -> jnp.ndarray:
    """[batch] zeros that inherit ``ref``'s vma type (ref: [batch, ...])."""
    return pvary_like(jnp.zeros(ref.shape[0], dtype), ref)
