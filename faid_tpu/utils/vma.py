"""shard_map varying-type helpers.

Under ``jax.shard_map`` every array carries a "varying manual axes" (vma)
type; a ``lax.while_loop`` whose carry mixes freshly-created (replicated)
constants with body outputs derived from sharded inputs fails to typecheck.
Deriving the initial carry from the input keeps the carry varying from the
start, and is a no-op outside shard_map."""

from __future__ import annotations

import jax.numpy as jnp


def batch_zeros(ref: jnp.ndarray, dtype=jnp.int32) -> jnp.ndarray:
    """[batch] zeros that inherit ``ref``'s vma type (ref: [batch, ...])."""
    flat = ref.reshape(ref.shape[0], -1)
    return (flat[:, 0].astype(jnp.int32) * 0).astype(dtype)
