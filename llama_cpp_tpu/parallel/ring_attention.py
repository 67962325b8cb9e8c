"""Ring attention: context parallelism over a mesh axis.

An addition beyond the reference (SURVEY.md §5 flags that llama.cpp has no
sequence-dim sharding): K/V shards rotate around the ICI ring via
jax.lax.ppermute while each chip folds the visiting block into its running
online-softmax statistics — communication overlaps compute and total traffic
equals one all-gather but never materializes the full K/V anywhere. This is
the scaling path for >1M-token contexts on pods.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG = -1e30


def _make_ring_fn(n_steps: int, axis_name: str, scale: float, causal: bool):
    def body(q, k0, v0):
        idx = jax.lax.axis_index(axis_name)
        B, H, Tq, D = q.shape
        Tk = k0.shape[2]
        Dv = v0.shape[3]
        q_pos = (idx * Tq + jnp.arange(Tq))[None, None, :, None]  # [1,1,Tq,1]

        m = jnp.full((B, H, Tq, 1), NEG, jnp.float32)
        l = jnp.zeros((B, H, Tq, 1), jnp.float32)
        o = jnp.zeros((B, H, Tq, Dv), jnp.float32)
        k_blk, v_blk = k0, v0
        perm = [(i, (i + 1) % n_steps) for i in range(n_steps)]

        for step in range(n_steps):
            src = (idx - step) % n_steps  # which chunk is visiting
            k_pos = (src * Tk + jnp.arange(Tk))[None, None, None, :]  # cols
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", q.astype(jnp.float32),
                k_blk.astype(jnp.float32), preferred_element_type=jnp.float32,
            ) * scale
            if causal:
                s = jnp.where(k_pos <= q_pos, s, NEG)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            o = alpha * o + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            m = m_new
            if step < n_steps - 1:
                k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
                v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (o / jnp.where(l == 0.0, 1.0, l)).astype(q.dtype)

    return body


def ring_attention(
    q: jnp.ndarray,  # [B, H, T, D] sharded on T over `axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "cp",
    scale: float | None = None,
    causal: bool = True,
) -> jnp.ndarray:
    """Causal attention with the sequence dimension sharded over `axis`.
    All of q/k/v enter and leave sharded [B, H, T/axis, D] — the full
    sequence never materializes on one chip."""
    from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    scale = scale if scale is not None else 1.0 / float(q.shape[-1]) ** 0.5
    body = _make_ring_fn(n, axis, scale, causal)
    spec = P(None, None, axis, None)
    fn = shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_rep=False)
    return fn(q, k, v)
