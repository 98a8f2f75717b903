"""Sinkhorn-Knopp optimal-transport assignment (jit-safe).

Parity component for reference utils/utils.py:400-449 (`SinkhornKnopp` +
`shoot_infs`; unused by the reference main path). The torch version loops over
nonzero indices in Python to patch infs; here `shoot_infs` is a vectorized
where, and the iteration is a `lax.fori_loop` so the whole assignment jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def shoot_infs(x: jnp.ndarray) -> jnp.ndarray:
    """Replace infs by the max of the finite entries (reference
    utils/utils.py:400-416, vectorized)."""
    is_inf = jnp.isinf(x)
    finite = jnp.where(is_inf, 0.0, x)
    m = jnp.max(finite)
    return jnp.where(is_inf, m, x)


def sinkhorn_knopp(logits: jnp.ndarray, num_iters: int = 3,
                   epsilon: float = 0.05) -> jnp.ndarray:
    """Balanced assignment: rows ~ samples, cols ~ prototypes. Returns the
    column-normalized transport plan transposed, matching the reference's
    `(Q / Q.sum(0)).t()` output convention (utils/utils.py:419-449)."""
    q = logits.astype(jnp.float32) / epsilon
    q = q - jnp.max(q)
    Q = jnp.exp(q).T                    # K x B
    Q = shoot_infs(Q)
    Q = Q / jnp.sum(Q)
    K, B = Q.shape
    r = jnp.full((K,), 1.0 / K)
    c = jnp.full((B,), 1.0 / B)

    def body(_, Q):
        u = jnp.sum(Q, axis=1)
        u = shoot_infs(r / u)
        Q = Q * u[:, None]
        Q = Q * (c / jnp.sum(Q, axis=0))[None, :]
        return Q

    Q = jax.lax.fori_loop(0, num_iters, body, Q)
    return (Q / jnp.sum(Q, axis=0, keepdims=True)).T
