"""shard_map varying-type helpers.

Under ``jax.shard_map`` every array carries a "varying manual axes" (vma)
type; a ``lax.while_loop`` whose carry mixes freshly-created (replicated)
constants with body outputs derived from sharded inputs fails to typecheck.
Casting the constants with ``lax.pcast(..., to='varying')`` fixes the type
without any runtime work, and is a no-op outside shard_map.

(A previous revision derived the type arithmetically — ``ref[..., 0] * 0``
— which left ``x*0`` chains inside the sharded while-loop bodies and drove
XLA's algebraic simplifier into its circular-loop breaker: five
"ran for 50 runs on computation region_*_spmd" errors per 50G-PON
multi-device compile, MULTICHIP_r04.json.  pcast is type-only and leaves
no such residue.)"""

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
