"""Pipeline parallelism: GPipe-style stage executor over a mesh axis.

Analog of the reference's scheduler pipeline parallelism (ggml-backend.cpp
n_copies=4 event machinery, SURVEY.md §2.3): layers split into S stages, each
stage's weights resident on its own devices; microbatch activations rotate
stage-to-stage with jax.lax.ppermute so all stages compute concurrently after
the fill phase. TPU-idiomatic: one shard_map, activations never leave the
ICI ring, the schedule is a static unrolled loop (M + S - 1 ticks).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(
    stage_fn: Callable,  # (stage_params, x) -> y   (same shape)
    stage_params,  # pytree; every leaf has leading dim n_stages
    x: jnp.ndarray,  # [n_micro, mb, ...] microbatched input
    mesh: Mesh,
    axis: str = "pp",
) -> jnp.ndarray:
    """Run x through all S stages in pipeline order; returns [n_micro, mb, ...].

    stage_params leaves are sharded on their leading (stage) axis; inside the
    shard_map each device sees only its own stage's slice.
    """
    from jax.experimental.shard_map import shard_map

    S = mesh.shape[axis]
    M = x.shape[0]

    def body(params_local, x_all):
        # params_local leaves: [1, ...] (this stage's slice)
        params_me = jax.tree_util.tree_map(lambda a: a[0], params_local)
        sid = jax.lax.axis_index(axis)
        mb_shape = x_all.shape[1:]

        carry = jnp.zeros(mb_shape, x_all.dtype)  # activation arriving at me
        out = jnp.zeros_like(x_all)
        perm_fwd = [(i, (i + 1) % S) for i in range(S)]

        for t in range(M + S - 1):
            # stage sid works on microbatch m = t - sid this tick
            m = t - sid
            active = (m >= 0) & (m < M)
            inp = jnp.where(
                sid == 0,
                x_all[jnp.clip(t, 0, M - 1)],  # stage 0 reads fresh input
                carry,
            )
            h = stage_fn(params_me, inp)
            h = jnp.where(active, h, 0.0)
            # last stage banks its finished microbatch
            bank = (sid == S - 1) & active
            out = jax.lax.cond(
                bank,
                lambda o: o.at[jnp.clip(m, 0, M - 1)].set(h),
                lambda o: o,
                out,
            )
            if t < M + S - 2:
                carry = jax.lax.ppermute(h, axis, perm_fwd)
        # only the last stage holds real outputs; share them along the ring
        return jax.lax.psum(jnp.where(sid == S - 1, out, 0.0), axis)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(),
        check_rep=False,
    )
    return fn(stage_params, x)


def stack_stage_params(per_stage: list) -> object:
    """List of per-stage pytrees -> one pytree with a leading stage axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_stage)
